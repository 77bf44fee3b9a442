"""Audio near-duplicate detection: windowed band-energy fingerprints
through the existing caption MinHash/LSH engine.

An audio clip's identity for dedup purposes is its SEQUENCE of per-window
acoustic tokens: the mono PCM signal is framed into fixed windows, each
window's rfft power spectrum is folded into B linear bands, and the
token encodes WHICH band pair holds the top two energies (a rank
statistic in the spirit of chromaprint's band-comparison bits —
Wikipedia/AcoustID publish that construction). Because the token ranks
energies against each other rather than against an absolute level, it
is EXACTLY gain-invariant: a re-mastered
copy at half volume produces the identical token sequence, which exact
byte hashing can never catch. Window-aligned trims and concatenations
shift the sequence, so consecutive-token shingle Jaccard — the caption
engine's exact similarity — is the right measure, and each clip is
rendered as a synthetic "caption" (space-joined token ints) and fed
through operators/minhash_lsh.near_dup_edges verbatim, exactly like
operators/video.py does for frame-phash sequences. One engine, five
modalities (captions, documents, phash tokens, video sequences, audio
fingerprints).

Scale shape: the decode fan-in (WAV bytes → token sequence) is
Arrow-batched mapInPandas over opaque binary columns — embarrassingly
parallel, no shuffle; everything downstream reuses the plan-audited
caption path. Non-window-aligned trims and lossy re-encodes are out of
scope for this container (no codecs) — the same limitation class as the
sampled-frame video engine, stated rather than hidden. Reference parity:
dupers hashes media files as opaque bytes (pkg/dupe/dupe.go:129-157) —
exact copies only; this extends the §2.8 multimodal plane to
content-aware audio dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dupers_spark.operators import minhash_lsh as ml
from dupers_spark.operators.multimodal import _wav_pcm


EMPTY_CLIP_TOKEN = -1  # sentinel for decodable zero-frame clips


def _tokens_from_pcm(x: np.ndarray, win: int, bands: int) -> list[int]:
    """Mono PCM samples → per-window tokens. The window's rfft power
    spectrum is folded into `bands` LINEAR bands (DC excluded) and the
    token is ``argmax_band * bands + runnerup_band`` — where the spectral
    energy peaks, which is a RANKING of band energies and therefore
    exactly invariant to uniform gain (all energies scale by g², order
    preserved). Sign-patterns of successive band differences (the classic
    chromaprint bitstring) were tried first but collapse to <8 distinct
    values on tonal content whose energy sits in few bands; peak-pair
    tokens stay discriminative (bands² values) while keeping the same
    invariance.

    A decodable zero-frame clip returns ``[EMPTY_CLIP_TOKEN]`` rather than
    [] so it stays in the near-dup graph (two empty clips ARE duplicates)
    and the ~decode_ok accounting stays exact — no decodable row is ever
    silently excluded from the token table."""
    if len(x) == 0:
        return [EMPTY_CLIP_TOKEN]
    n_win = len(x) // win
    if n_win == 0:
        # decodable clip shorter than one window: one whole-clip frame, so
        # it still participates in the graph instead of silently vanishing
        # (decode_ok is True for it, so the ~decode_ok accounting query
        # would never surface a drop here)
        frames = x[None, :]
        n_win = 1
    else:
        frames = x[: n_win * win].reshape(n_win, win)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_win, win//2+1)
    n_bins = power.shape[1]
    # linear band edges over [1, n_bins): skip DC so offsets/padding
    # don't dominate band 0
    edges = np.unique(np.linspace(1, n_bins, bands + 1).astype(int))
    e = np.stack([
        power[:, a:b].sum(axis=1) for a, b in zip(edges[:-1], edges[1:])
    ], axis=1)  # (n_win, n_bands)
    if e.shape[1] < 2:  # degenerate tiny window: one band, no runner-up
        return [0] * n_win
    order = np.argsort(-e, axis=1, kind="stable")  # deterministic ties
    return (order[:, 0] * np.int64(bands) + order[:, 1]).tolist()


def audio_token_table(media: DataFrame, win: int = 1024, bands: int = 16,
                      id_col: str = "media_id",
                      bytes_col: str = "bytes") -> DataFrame:
    """(media_id, caption) — each decodable clip's windowed fingerprint
    token sequence as a space-joined string, LSH-engine-ready. Clips
    shorter than one window get a single whole-clip token and zero-frame
    clips the EMPTY_CLIP_TOKEN sentinel (both stay in the graph); only
    UNDECODABLE or empty payloads are excluded here, and those are exactly
    the rows multimodal.audio_features(...).filter(~decode_ok) accounts
    for — the catch wraps ONLY the ``_wav_pcm`` decode (the same call
    audio_features' decode_ok reflects); post-decode tokenization errors
    propagate loudly instead of becoming silent drops."""
    src = media.select(F.col(id_col).alias("media_id"),
                       F.col(bytes_col).alias("bytes"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, caps = [], []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                if data is None or len(data) == 0:
                    continue
                try:
                    x, _rate, _nch, _full, _n = _wav_pcm(bytes(data))
                except Exception:
                    continue  # == audio_features decode_ok=False rows
                toks = _tokens_from_pcm(x, win, bands)
                if toks:
                    ids.append(mid)
                    caps.append(" ".join(str(t) for t in toks))
            yield pd.DataFrame({"media_id": pd.array(ids, dtype="string"),
                                "caption": pd.array(caps, dtype="string")})

    return src.mapInPandas(extract, schema="media_id string, caption string")


def audio_near_dup_edges(media: DataFrame, cfg: ml.LSHConfig | None = None,
                         win: int = 1024, bands: int = 16,
                         id_col: str = "media_id",
                         bytes_col: str = "bytes",
                         ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (edges(a,b), verified(a,b,sim), dropped_buckets) over audio clips.

    shingle_k=2 (two consecutive ~130 ms windows at 8 kHz/1024) matches
    the video engine's choice: enough temporal context to make shingles
    discriminative without over-penalizing short clips. A gain-scaled
    copy has the IDENTICAL token string and collapses structurally
    (sim 1.0 without any pair computation); window-aligned trims meet
    the Jaccard verify like any near-dup.

    Feed edges to operators.components.connected_components for cluster
    labels, same as every other engine.
    """
    if cfg is None:
        cfg = ml.LSHConfig(shingle_k=2)
    tokens = audio_token_table(media, win, bands, id_col, bytes_col)
    return ml.near_dup_edges(tokens, cfg, id_col="media_id",
                             text_col="caption")
