"""Perceptual (phash) Hamming-ball engine vs brute-force oracle."""

import itertools

from dupers_spark.operators import simhash as sh

RADIUS = 3


def _brute_force(reps_rows, radius):
    sig = {r["rep_id"]: r["sig"] for r in reps_rows}
    out = set()
    for a, b in itertools.combinations(sorted(sig), 2):
        if bin((sig[a] ^ sig[b]) & (2**64 - 1)).count("1") <= radius:
            out.add((a, b))
    return out


def test_hamming_engine_perfect_recall(spark, images_small):
    """Pigeonhole block index is exact (not approximate): candidate recall
    must be 1.0 against the O(n²) Hamming oracle (when no bucket is capped)."""
    reps, star = sh.collapse_exact_sig(images_small)
    reps_rows = reps.collect()
    truth = _brute_force(reps_rows, RADIUS)
    cands, dropped = sh.hamming_candidates(reps, RADIUS)
    assert dropped.count() == 0  # fixture buckets are far below the cap
    verified = sh.verify_hamming(cands, reps, RADIUS)
    got = {(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in verified.collect()}
    assert got == truth
    assert truth, "fixture should contain phash near-dups (r6 noisy copies)"


def test_hamming_flood_guard_caps_hot_blocks(spark):
    """A block value shared by every row (the n ≫ 2^16 degenerate shape)
    must be capped with accounted drops, not expanded into O(n²) pairs."""
    n = 3000
    # sig = i << 16: block 0 (low 16 bits) is 0 for every row → one hot
    # bucket of size n; the high blocks are distinct per row.
    rows = [(f"id_{i:05d}", i << 16) for i in range(n)]
    reps = spark.createDataFrame(rows, "rep_id string, sig long")
    cands, dropped = sh.hamming_candidates(reps, RADIUS, max_bucket=100)
    d = dropped.collect()
    assert any(r["size"] == n for r in d)  # the flood bucket is accounted
    # remaining pair count is bounded by sum of small-bucket sizes², not n²
    assert cands.count() < n * 100


def test_identical_phash_collapse(spark, images_small):
    """r0/r1/r2 share pixels → identical phash → star edges, not LSH rows."""
    reps, star = sh.collapse_exact_sig(images_small)
    star_pairs = {(r["a"], r["b"]) for r in star.collect()}
    # r1 and r2 attach to r0 (min id) for every full group
    assert ("img_00000001", "img_00000000") in star_pairs
    assert ("img_00000002", "img_00000000") in star_pairs


def test_full_edges_cluster_exact_and_near(spark, images_small):
    edges, verified, _dropped = sh.phash_near_dup_edges(images_small, RADIUS)
    from dupers_spark.operators.components import connected_components

    comp = {
        r["image_id"]: r["component_id"]
        for r in connected_components(edges).collect()
    }
    # same-pixel trio always one cluster
    assert comp["img_00000000"] == comp["img_00000001"] == comp["img_00000002"]
