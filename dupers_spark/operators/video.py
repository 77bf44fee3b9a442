"""Video near-duplicate detection: frame-phash shingle MinHash over the
existing caption LSH engine.

A video's identity for dedup purposes is its SEQUENCE of sampled-frame
perceptual hashes (multimodal.video_features): a trimmed, re-muxed,
padded or mildly re-encoded copy shares most consecutive-frame-phash
k-shingles with its source, so word-shingle Jaccard over the phash-token
string is exactly the similarity the caption engine already computes.
Rather than a fourth LSH implementation, each video is rendered as a
synthetic "caption" — its frame phashes as space-joined decimal tokens —
and fed through operators/minhash_lsh.near_dup_edges verbatim: collapse
(byte-identical sequences dedup structurally), fused Arrow signature
kernel, bounded band-bucket expansion with drop accounting, exact-Jaccard
verify. One engine, four modalities (captions, documents, phash tokens,
now video sequences).

Scale shape: the decode fan-in (video bytes → phash sequence) is the only
new work and it is Arrow-batched mapInPandas over opaque binary columns —
embarrassingly parallel, no shuffle; everything downstream reuses the
plan-audited caption path. Reference parity: dupers hashes media files as
opaque bytes (pkg/dupe/dupe.go:129-157) — exact copies only; this extends
the §2.8 multimodal plane to content-aware video dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dupers_spark.operators import minhash_lsh as ml
from dupers_spark.operators.multimodal import video_features


def video_token_table(media: DataFrame, every_n: int = 30,
                      id_col: str = "media_id",
                      bytes_col: str = "bytes") -> DataFrame:
    """(media_id, caption) — each decodable video's sampled frame-phash
    sequence as a space-joined token string, LSH-engine-ready. Undecodable
    payloads are excluded here; account for them via
    multimodal.video_features(...).filter(~decode_ok) which this wraps."""
    feats = video_features(media, every_n, id_col, bytes_col)
    return (
        feats.filter(F.col("decode_ok") & (F.size("frame_phashes") > 0))
        .select(
            "media_id",
            F.array_join(
                F.transform("frame_phashes", lambda h: h.cast("string")), " "
            ).alias("caption"),
        )
    )


def video_near_dup_edges(media: DataFrame, cfg: ml.LSHConfig | None = None,
                         every_n: int = 30, id_col: str = "media_id",
                         bytes_col: str = "bytes",
                         ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (edges(a,b), verified(a,b,sim), dropped_buckets) over videos.

    shingle_k=2 by default: a k-shingle is k CONSECUTIVE sampled frames,
    and at every_n=30 (one frame/s at 30 fps) two frames of context is
    already a strong temporal signature — k=3 over-penalizes short clips
    (≤3 sampled frames collapse to one shingle). Pass cfg to override.

    Feed edges to operators.components.connected_components for cluster
    labels, same as every other engine.
    """
    if cfg is None:
        cfg = ml.LSHConfig(shingle_k=2)
    tokens = video_token_table(media, every_n, id_col, bytes_col)
    return ml.near_dup_edges(tokens, cfg, id_col="media_id",
                             text_col="caption")
