"""MinHash+LSH recall gate vs brute-force Jaccard oracle (BASELINE ≥ 0.99)."""

import itertools

from pyspark.sql import functions as F

from dupers_spark.functions import hashing as H
from dupers_spark.operators import components as cc, minhash_lsh as ml
from dupers_spark.sources import datagen

N = 200
CFG = ml.LSHConfig()


def _brute_force_pairs(spark, images, threshold):
    """O(n²) exact word-shingle Jaccard oracle at the same shingle config."""
    rows = images.select(
        "image_id", H.word_shingles(F.col("caption"), CFG.shingle_k).alias("sh")
    ).collect()
    sh = {r["image_id"]: frozenset(r["sh"]) for r in rows}
    out = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter and inter / len(sh[a] | sh[b]) >= threshold:
            out.add((a, b))
    return out


def test_recall_gate(spark, images_small):
    """Dup-pair recall ≥ 0.99: every true pair is either a verified rep pair
    or implied by collapse star edges / shared component."""
    truth = _brute_force_pairs(spark, images_small, CFG.threshold)
    assert truth, "oracle produced no pairs — fixture broken"

    edges, verified, dropped = ml.near_dup_edges(images_small, CFG)
    assign = cc.connected_components(edges)
    comp = {r["image_id"]: r["component_id"] for r in assign.collect()}

    found = sum(
        1 for a, b in truth if a in comp and b in comp and comp[a] == comp[b]
    )
    recall = found / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(truth)} true pairs"
    assert dropped.count() == 0  # no silent bucket drops at this scale


def test_no_false_merges_below_threshold(spark, images_small):
    """Verified pairs must actually meet the Jaccard threshold (no
    LSH-candidate leakage past verify)."""
    truth = _brute_force_pairs(spark, images_small, CFG.threshold)
    _edges, verified, _ = ml.near_dup_edges(images_small, CFG)
    for r in verified.collect():
        pair = (min(r["a"], r["b"]), max(r["a"], r["b"]))
        assert pair in truth
        assert r["sim"] >= CFG.threshold


def test_sql_impl_matches_pandas_impl_verified_pairs(spark, images_small):
    """Both signature implementations must verify the same pair set — the
    LSH hash family differs (crc/splitmix vs xxhash64) but verify is exact
    Jaccard, so any difference is a recall difference, which the banding
    math bounds below 1e-3 at this similarity level."""
    _e1, v_pandas, _ = ml.near_dup_edges(images_small, ml.LSHConfig(impl="pandas"))
    _e2, v_sql, _ = ml.near_dup_edges(images_small, ml.LSHConfig(impl="sql"))
    p1 = {(r["a"], r["b"]) for r in v_pandas.collect()}
    p2 = {(r["a"], r["b"]) for r in v_sql.collect()}
    assert p1 == p2


def test_component_sets_match_planted_truth(spark, images_small):
    edges, _v, _d = ml.near_dup_edges(images_small, CFG)
    assign = cc.connected_components(edges)
    got_groups: dict[str, set[str]] = {}
    for r in assign.collect():
        got_groups.setdefault(r["component_id"], set()).add(r["image_id"])
    want_groups: dict[int, set[str]] = {}
    for img, comp in datagen.truth_caption_components(N).items():
        want_groups.setdefault(comp, set()).add(img)
    got_sets = {frozenset(s) for s in got_groups.values() if len(s) > 1}
    want_sets = {frozenset(s) for s in want_groups.values() if len(s) > 1}
    assert got_sets == want_sets


def test_incremental_matches_full_build(spark, images_small):
    """Append-batch probe vs persisted signature index: an odd/even id
    split puts exact copies (r0/r1) and chain links (r3/r4) in DIFFERENT
    batches, so every cross-batch connection must come from the
    incremental path. Components over (old edges ∪ incremental edges)
    must equal the full build's components."""
    from dupers_spark.operators.components import (
        connected_components, with_singletons)

    parity = F.substring("image_id", -1, 1).cast("int") % 2
    old = images_small.filter(parity == 0)
    new = images_small.filter(parity == 1)

    edges_old, _v, _d = ml.near_dup_edges(old, CFG)
    sigs_old = ml.signatures(
        ml.collapse_groups(old).select("rep_id", "caption"), CFG)
    edges_inc, verified, dropped, sigs_new = ml.incremental_near_dup_edges(
        sigs_old, new, CFG)
    assert dropped.count() == 0
    assert verified.count() > 0  # cross-batch near-dups were found

    edges_full, _v2, _d2 = ml.near_dup_edges(images_small, CFG)
    ids = images_small.select("image_id")
    full = {r["image_id"]: r["component_id"] for r in with_singletons(
        connected_components(edges_full), ids).collect()}
    inc = {r["image_id"]: r["component_id"] for r in with_singletons(
        connected_components(edges_old.unionByName(edges_inc)), ids).collect()}
    assert full == inc


def test_incremental_kernel_expands_only_new_touching_pairs(spark):
    """Round-5 "wrong" #3: a heavy touched bucket must cost the kernel
    O(q_new·q), not O(q²)-then-filter. The new_col path's OUTPUT (before
    any downstream filter) is exactly the new-touching pair set — on a
    100-old + 2-new shared bucket that is 201 pairs, vs 5151 for the full
    triu the old formulation computed."""
    q_old, q_new = 100, 2
    rows = [(0, 7, f"old_{i:04d}", False) for i in range(q_old)] + \
           [(0, 7, f"znew_{i}", True) for i in range(q_new)]
    buckets = spark.createDataFrame(
        rows, "band int, key long, rep_id string, is_new boolean")

    inc_pairs, dropped = ml.grouped_pair_expansion(
        buckets, max_bucket=2000, new_col="is_new")
    got = {(r["a"], r["b"]) for r in inc_pairs.collect()}
    # exactly: new×new (1) + new×old (2·100)
    assert len(got) == q_new * q_old + 1
    assert all("znew" in a or "znew" in b for a, b in got)
    assert dropped.count() == 0

    full_pairs, _ = ml.grouped_pair_expansion(buckets, max_bucket=2000)
    assert full_pairs.count() == (q_old + q_new) * (q_old + q_new - 1) // 2

    # and through the public probe API: same set, same accounting
    idx = buckets.filter(~F.col("is_new")).select("band", "key", "rep_id")
    new = buckets.filter(F.col("is_new")).select("band", "key", "rep_id")
    probe_pairs, _ = ml.incremental_bucket_pairs(idx, new, max_bucket=2000)
    assert {(r["a"], r["b"]) for r in probe_pairs.collect()} == got


def test_incremental_kernel_star_paths_keep_new_attached(spark):
    """Hamming-mode short-circuits under the is_new flag: an identical-sig
    flood bucket (star short-circuit) must still attach every NEW member
    to the cluster while emitting no old×old edges."""
    # 40 old + 2 new reps, all with IDENTICAL sig → pigeonhole bucket is
    # over-cap, recursion cannot split → star short-circuit
    sig = 0x0123456789ABCDEF
    rows = [(0, 1, f"old_{i:04d}", sig, False) for i in range(40)] + \
           [(0, 1, "znew_a", sig, True), (0, 1, "znew_b", sig, True)]
    buckets = spark.createDataFrame(
        rows, "band int, key long, rep_id string, sig long, is_new boolean")
    pairs, dropped = ml.grouped_pair_expansion(
        buckets, max_bucket=8, radius=3, new_col="is_new")
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # every edge touches a new member; both new members are attached
    assert got and all("znew" in a or "znew" in b for a, b in got)
    touched = {x for e in got for x in e if "znew" in x}
    assert touched == {"znew_a", "znew_b"}
    assert dropped.count() == 1  # flood bucket accounted, never silent


def test_incremental_cap_crossing_bucket_is_finished_not_dropped(spark):
    """Round-5 "wrong" #4 closed: a bucket UNDER the cap at old-build time
    that crosses it with the batch must have its new-touching side
    expanded (bounded O(q_new·q) work), not dropped — appended rows never
    hit a recall cliff the resident rows didn't. A bucket where one side
    ALONE exceeds the cap is dropped+accounted, matching the full build."""
    cap = 8
    mk = lambda n, pre, new: [(0, 7, f"{pre}_{i:03d}", new)  # noqa: E731
                              for i in range(n)]
    # 5 old + 6 new = 11 > cap, but both sides ≤ cap → finish the bucket
    cross = spark.createDataFrame(
        mk(5, "old", False) + mk(6, "znew", True),
        "band int, key long, rep_id string, is_new boolean")
    idx = cross.filter(~F.col("is_new")).select("band", "key", "rep_id")
    new = cross.filter(F.col("is_new")).select("band", "key", "rep_id")
    pairs, dropped = ml.incremental_bucket_pairs(idx, new, max_bucket=cap)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert len(got) == 6 * 5 + 15  # new×old + new×new
    assert dropped.count() == 0
    # union with the old build's old×old pairs = the UNCAPPED expansion
    old_pairs, _ = ml.grouped_pair_expansion(idx, max_bucket=cap)
    union = got | {(r["a"], r["b"]) for r in old_pairs.collect()}
    assert len(union) == 11 * 10 // 2

    # batch-side flood: 9 new > cap → dropped + accounted, no pairs
    flood_new = spark.createDataFrame(
        mk(9, "znew", True), "band int, key long, rep_id string, is_new boolean"
    ).select("band", "key", "rep_id")
    p2, d2 = ml.incremental_bucket_pairs(idx, flood_new, max_bucket=cap)
    assert p2.count() == 0
    drops = d2.collect()
    assert len(drops) == 1 and drops[0]["size"] == 14
