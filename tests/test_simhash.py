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


def test_hamming_saturated_block_keeps_recall(spark):
    """The n ≫ max_bucket·(block cardinality) saturation regime: 3·10⁵ reps
    share ONE 16-bit block value, so the (blk0, val) bucket holds every row
    — drop-mode would shed it (losing every pair whose only agreeing block
    is blk0). Hierarchical re-pigeonholing must keep recall 1.0 for planted
    pairs that differ by one bit in EACH of blocks 1-3 (they agree only on
    block 0), with bounded candidate volume and zero dropped buckets.

    N.B. the 20-bit flip sits inside depth-1 refinement chunk [16..27] and
    the 35/50-bit flips in later chunks, so the planted pairs also exercise
    the ≥1-sub-block-agreement argument at every refinement level."""
    n = 300_000
    res_mask = (1 << 48) - 1
    base = spark.range(n).selectExpr(
        "concat('id_', lpad(cast(id as string), 7, '0')) AS rep_id",
        f"shiftleft(xxhash64(id) & {res_mask}L, 16) | 42L AS sig",
    )
    # partners for ids 0-9: flip one bit in each of blocks 1, 2, 3
    # (bits 20, 35, 50) → Hamming distance 3, agreeing block = blk0 only
    flip = (1 << 20) | (1 << 35) | (1 << 50)
    partners = spark.range(10).selectExpr(
        "concat('pt_', lpad(cast(id as string), 7, '0')) AS rep_id",
        f"(shiftleft(xxhash64(id) & {res_mask}L, 16) | 42L) ^ {flip}L AS sig",
    )
    reps = base.unionByName(partners)
    cands, dropped = sh.hamming_candidates(reps, RADIUS, max_bucket=60)
    verified = sh.verify_hamming(cands, reps, RADIUS)
    got = {(r["a"], r["b"]) for r in verified.collect()}
    want = {(f"id_{i:07d}", f"pt_{i:07d}") for i in range(10)}
    assert want <= got, f"missing planted pairs: {want - got}"
    # candidate volume ≈ pairs agreeing on ≥28 random bits, nowhere near
    # the O(n²/2^16) a naive saturated-bucket expansion would produce
    assert cands.count() < 8_000_000
    # no typical bucket was dropped (only identical-sig floods would be)
    assert dropped.count() == 0


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

def test_identical_sig_flood_star_connects(spark):
    """>max_bucket IDENTICAL sigs without collapse_exact_sig: the distance-0
    true pairs must not vanish. The flood is star-connected to its min rep
    (one component, verify passes at dist 0) and accounted in dropped,
    since pair enumeration there is non-exhaustive by design."""
    n = 120
    rows = [(f"id_{i:04d}", 0x0123456789ABCDE0 + 7) for i in range(n)]
    reps = spark.createDataFrame(rows, "rep_id string, sig long")
    cands, dropped = sh.hamming_candidates(reps, RADIUS, max_bucket=50)
    got = {(r["a"], r["b"]) for r in cands.collect()}
    want = {("id_0000", f"id_{i:04d}") for i in range(1, n)}
    assert got == want  # the star, deduped across the 4 pigeonhole blocks
    assert dropped.count() > 0
    verified = sh.verify_hamming(cands, reps, RADIUS)
    assert verified.count() == n - 1  # every star edge is a dist-0 pair
    from dupers_spark.operators.components import connected_components

    comp = connected_components(verified.select("a", "b"))
    assert comp.select("component_id").distinct().count() == 1
    assert comp.count() == n


def test_pigeonhole_bit_exhaustion_keeps_pairs(spark):
    """Deep refinement down to ≤ radius remaining bits: array_split would
    yield < radius+1 non-empty chunks and the ≥1-agreeing-chunk guarantee
    breaks — the exhaustion guard must star-connect the group (every pair
    there is provably within the radius) instead of recursing into silent
    pair loss. Two sig values A, B at Hamming distance 3, two rows each,
    max_bucket=1 forces refinement all the way down."""
    from dupers_spark.operators.minhash_lsh import grouped_pair_expansion

    A = (0x5A5A5A5A5A5A << 16) | 42
    B = A ^ ((1 << 16) | (1 << 30) | (1 << 44))
    rows = [("a1", 0, 42, A), ("a2", 0, 42, A),
            ("b1", 0, 42, B), ("b2", 0, 42, B)]
    buckets = spark.createDataFrame(
        rows, "rep_id string, band int, key long, sig long")
    pairs, dropped = grouped_pair_expansion(
        buckets, max_bucket=1, radius=RADIUS, max_depth=30)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # exhaustion star from the 4-group + identical-sig stars of each value
    assert {("a1", "a2"), ("a1", "b1"), ("a1", "b2"), ("b1", "b2")} <= got
    assert dropped.count() > 0  # non-exhaustive enumeration is accounted
    from dupers_spark.operators.components import connected_components

    comp = connected_components(
        spark.createDataFrame(sorted(got), "a string, b string"))
    assert comp.select("component_id").distinct().count() == 1
    assert comp.count() == 4


def test_incremental_hamming_matches_full_build(spark, images_small):
    """Perceptual engine append-batch probe: odd/even split (exact-phash
    copies r0/r1/r2 and the noisy near-dup r6 straddle batches) — combined
    components must equal the full build's."""
    from pyspark.sql import functions as F

    from dupers_spark.operators.components import (
        connected_components, with_singletons)

    parity = F.substring("image_id", -1, 1).cast("int") % 2
    old = images_small.filter(parity == 0)
    new = images_small.filter(parity == 1)

    edges_old, _v, _d = sh.phash_near_dup_edges(old, RADIUS)
    reps_old, _star = sh.collapse_exact_sig(old)
    edges_inc, verified, dropped, reps_new = sh.incremental_hamming_edges(
        reps_old, new, RADIUS)
    assert dropped.count() == 0
    assert verified.count() > 0

    edges_full, _v2, _d2 = sh.phash_near_dup_edges(images_small, RADIUS)
    ids = images_small.select("image_id")
    full = {r["image_id"]: r["component_id"] for r in with_singletons(
        connected_components(edges_full), ids).collect()}
    inc = {r["image_id"]: r["component_id"] for r in with_singletons(
        connected_components(edges_old.unionByName(edges_inc)), ids).collect()}
    assert full == inc
