"""Multimodal decode/feature/PSNR stage — the BASELINE per-row invariants."""

import pytest
from pyspark.sql import functions as F

from dupers_spark.operators import exact, multimodal as mm
from dupers_spark.sources import datagen

N = 200


def test_recomputed_phash_matches_stored_for_lossless(spark, images_small):
    feats = mm.image_features(images_small)
    chk = feats.join(
        images_small.select(
            "image_id", F.col("phash").alias("phash_stored"), "fmt"
        ),
        "image_id",
    ).filter(F.col("decode_ok") & (F.col("fmt") != "jpg"))
    assert chk.filter(F.col("phash") != F.col("phash_stored")).count() == 0
    assert chk.count() > 0


def test_zero_byte_row_flagged_not_decoded(spark, images_small):
    feats = mm.image_features(images_small)
    bad = feats.filter(~F.col("decode_ok")).collect()
    assert [r["image_id"] for r in bad] == datagen.zero_byte_ids(N)


def test_exact_pairs_psnr_infinite_and_captions_equal(spark, images_small):
    """Byte-identical pairs decode to identical pixels (PSNR = inf) and
    carry equal captions — the decoded-pixel allclose + caption-equality
    invariant on the exact engine's output."""
    sigs = exact.signatures(images_small)
    pairs = exact.dup_pairs(sigs).select("a", "b")
    scored = mm.pair_psnr(pairs, images_small).collect()
    assert scored
    for r in scored:
        assert r["pixels_comparable"]
        assert r["psnr_db"] is None or r["psnr_db"] > 100  # inf → None via float? keep loose
    caps = {r["image_id"]: r["caption"] for r in images_small.select("image_id", "caption").collect()}
    for r in scored:
        assert caps[r["a"]] == caps[r["b"]]


def test_reencoded_near_dups_meet_psnr_gate(spark, images_small):
    """r0 vs r2 (same pixels, different codec — lossy allowed): PSNR ≥ 40 dB
    (BASELINE input_hint invariant)."""
    pairs = spark.createDataFrame(
        [(f"img_{g*10:08d}", f"img_{g*10+2:08d}") for g in range(N // 10)],
        ["a", "b"],
    )
    scored = mm.pair_psnr(pairs, images_small).collect()
    assert scored
    for r in scored:
        assert r["pixels_comparable"]
        assert r["psnr_db"] is None or r["psnr_db"] >= 40.0


def test_thumbnails(spark, images_small):
    th = mm.image_thumbnails(images_small, size=8)
    rows = th.filter(F.col("thumb").isNotNull()).collect()
    assert len(rows) == N - 1
    assert all(len(r["thumb"]) == 64 for r in rows)


def test_audio_video_stubs_raise(spark):
    df = spark.createDataFrame([("m1", b"x")], ["media_id", "bytes"])
    with pytest.raises(NotImplementedError):
        mm.audio_features(df)
    with pytest.raises(NotImplementedError):
        mm.sample_video_frames(df)
