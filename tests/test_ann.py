"""Similarity search over embeddings: brute-force vs numpy oracle; LSH recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dupers_spark.operators import ann

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


def test_brute_force_matches_numpy(spark, embeddings):
    rows = embeddings.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    probes = embeddings.filter(F.col("vec_id") < 3)
    got = ann.brute_force_topk(embeddings, probes, k=4).collect()
    for pid in range(3):
        p = vecs[pid]
        sims = {
            vid: float(p @ v / (np.linalg.norm(p) * np.linalg.norm(v)))
            for vid, v in vecs.items() if vid != pid
        }
        want = sorted(sims, key=lambda v: (-sims[v], v))[:4]
        have = [r["neighbor_id"] for r in sorted(
            (g for g in got if g["probe_id"] == pid), key=lambda r: r["rnk"])]
        assert have == want
        for r in got:
            if r["probe_id"] == pid:
                assert abs(r["cos"] - sims[r["neighbor_id"]]) < 1e-9


def test_lsh_finds_planted_near_dups(spark):
    """SRP-LSH is a NEAR-dup index: on planted cos≥0.95 twins it must find
    the twin as top-1. (The driver corpus is near-random — top cosine ≈0.35,
    chance-level plane agreement — so recall there is not a meaningful bar;
    brute-force covers that corpus.)"""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((50, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        twin = v + 0.10 * rng.standard_normal(64)  # cos ≈ 0.995
        rows.append((2 * i + 1, [float(x) for x in twin]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = df.filter(F.col("vec_id") % 2 == 0)
    got = ann.lsh_topk(df, probes, k=1, n_planes=10, multiprobe_bits=4).collect()
    hit = sum(1 for r in got if r["neighbor_id"] == r["probe_id"] + 1)
    assert hit / 50 >= 0.8, hit


def test_embedding_near_dup_pairs_symmetric_exact(spark, embeddings):
    """At τ high, SRP pairs must be a subset of brute-force pairs, and
    every returned cos must be correct."""
    rows = embeddings.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    pairs, dropped = ann.embedding_near_dup_pairs(embeddings, threshold=0.8)
    assert dropped.count() == 0
    for r in pairs.collect():
        a, b = vecs[r["a"]], vecs[r["b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["cos"]) < 1e-6
        assert cos >= 0.8


def _planted_moderate_neardups(seed=11, n=60, dim=64, lo=0.93, hi=0.97):
    """n base vectors, each with a twin at a controlled cosine in [lo, hi]."""
    rng = np.random.default_rng(seed)
    rows, truth = [], set()
    for i in range(n):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        w = rng.standard_normal(dim)
        w -= (w @ v) * v
        w /= np.linalg.norm(w)
        c = rng.uniform(lo, hi)
        t = c * v + np.sqrt(1 - c * c) * w
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in t]))
        truth.add((2 * i, 2 * i + 1))
    return rows, truth


def test_embedding_near_dup_recall_at_moderate_cos(spark):
    """VERDICT gate: OR-construction recall ≥0.95 vs the exact oracle at
    τ=0.9 on planted MODERATE near-dups (cos 0.93–0.97), not just 0.995
    twins — a single 12-plane table only reaches ≈0.29 here."""
    rows, truth = _planted_moderate_neardups()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {
        (r["a"], r["b"])
        for r in ann.cosine_pairs_exact(df, threshold=0.9).collect()
    }
    assert truth <= exact  # planted pairs all exceed τ by construction
    pairs, dropped = ann.embedding_near_dup_pairs(df, threshold=0.9)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert dropped.count() == 0
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f} over {len(exact)} true pairs"
    assert got <= exact  # verify stage guarantees precision 1.0


def test_ivf_exhaustive_equals_brute_force(spark, embeddings):
    """nprobe = n_centroids visits every bucket: the IVF machinery
    (centroids, assignment, candidate join, re-rank) must reproduce exact
    brute force bit-for-bit in HOF mode and to fp tolerance in np mode."""
    probes = embeddings.filter(F.col("vec_id") < 3)
    want = {(r["probe_id"], r["rnk"]): (r["neighbor_id"], r["cos"])
            for r in ann.brute_force_topk(embeddings, probes, k=4).collect()}
    for mode in ("hof", "np"):
        got = {(r["probe_id"], r["rnk"]): (r["neighbor_id"], r["cos"])
               for r in ann.ivf_topk(embeddings, probes, k=4, n_centroids=16,
                                     nprobe=16, rerank=mode).collect()}
        assert set(got) == set(want), mode
        for k2 in want:
            assert got[k2][0] == want[k2][0], (mode, k2)
            assert abs(got[k2][1] - want[k2][1]) < 1e-6, (mode, k2)


def test_ivf_recall_on_clustered_corpus(spark):
    """The approximate path (nprobe ≪ n_centroids) on a corpus with real
    cluster structure: top-1 neighbor recall ≥0.9 at nprobe=8/32. Random
    data has no IVF-exploitable structure, so the corpus plants Gaussian
    clusters (the shape real embedding spaces have)."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((20, 64)) * 3
    rows = []
    vid = 0
    for c in centers:
        for _ in range(40):
            v = c + 0.5 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    df.count()
    probes = df.filter(F.col("vec_id") % 80 == 0)  # one probe per 2 clusters
    exact = {r["probe_id"]: r["neighbor_id"]
             for r in ann.brute_force_topk_np(df, probes, k=1).collect()}
    approx = {r["probe_id"]: r["neighbor_id"]
              for r in ann.ivf_topk(df, probes, k=1, n_centroids=32,
                                    nprobe=8).collect()}
    hits = sum(1 for p, n in exact.items() if approx.get(p) == n)
    assert hits / len(exact) >= 0.9, f"{hits}/{len(exact)}"
    df.unpersist()


def test_ivf_deterministic(spark, embeddings):
    """Same (seed, sample) → identical output across runs/partitionings."""
    probes = embeddings.filter(F.col("vec_id") < 2)
    a = sorted(map(tuple, ann.ivf_topk(embeddings, probes, k=3, n_centroids=8,
                                       nprobe=2).collect()))
    b = sorted(map(tuple, ann.ivf_topk(embeddings.repartition(13), probes, k=3,
                                       n_centroids=8, nprobe=2).collect()))
    assert a == b


def test_brute_force_np_matches_hof(spark, embeddings):
    """The vectorized top-k must agree with the HOF oracle twin."""
    probes = embeddings.filter(F.col("vec_id") < 3)
    hof = ann.brute_force_topk(embeddings, probes, k=4).collect()
    npv = ann.brute_force_topk_np(embeddings, probes, k=4).collect()
    key = lambda r: (r["probe_id"], r["rnk"])  # noqa: E731
    hof_m = {key(r): (r["neighbor_id"], round(r["cos"], 9)) for r in hof}
    np_m = {key(r): (r["neighbor_id"], round(r["cos"], 9)) for r in npv}
    assert set(hof_m) == set(np_m)
    for k2 in hof_m:
        assert hof_m[k2][0] == np_m[k2][0]
        assert abs(hof_m[k2][1] - np_m[k2][1]) < 1e-6


def test_ivf_centroids_sample_boundary(spark):
    """n in (sample, 1.2·sample]: the keep-fraction clamps to ≥1, whose
    cutoff (-2^63 + frac·2^64 ≥ 2^63) overflows a JVM long — the pre-filter
    must be skipped entirely in that regime, not crash the index build."""
    rows = [(i, [float(i % 7) + 0.1, 1.0, float(i % 3)]) for i in range(45)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    C = ann.ivf_centroids(df, n_centroids=4, sample=40)
    assert C.shape == (4, 3)
    # the filtered regime (frac < 1) still works on the same corpus
    C2 = ann.ivf_centroids(df, n_centroids=4, sample=10)
    assert C2.shape == (4, 3)


def test_incremental_embedding_matches_full_build(spark):
    """SRP keys are deterministic per vector, so (old-build pairs) ∪
    (incremental-batch pairs) must equal a full build's pair set EXACTLY
    — planted near-dup partners split across the two batches."""
    raw, _truth = _planted_moderate_neardups()
    rows = spark.createDataFrame(raw, "vec_id long, embedding array<float>")
    old = rows.filter(F.col("vec_id") % 2 == 0)
    new = rows.filter(F.col("vec_id") % 2 == 1)

    full_pairs, _d = ann.embedding_near_dup_pairs(rows, threshold=0.9)
    old_pairs, _d2 = ann.embedding_near_dup_pairs(old, threshold=0.9)
    index = ann.srp_index(old).localCheckpoint()
    inc_pairs, dropped, index_new = ann.incremental_embedding_near_dups(
        index, new, threshold=0.9)
    assert dropped.count() == 0
    want = {(r["a"], r["b"]) for r in full_pairs.collect()}
    got = {(r["a"], r["b"]) for r in old_pairs.collect()} | {
        (r["a"], r["b"]) for r in inc_pairs.collect()}
    assert got == want and len(want) > 0
    # appended index covers the whole corpus
    assert index.count() + index_new.count() == rows.count()


def test_ivf_index_persist_append_query(spark, tmp_path):
    """Persisted IVF index: build on the even half, append the odd half
    with FROZEN centroids — querying the grown index must equal a query
    over a from-scratch assignment of the union with the same centroids
    (assignment is a pure per-row function of (vector, centroids)), and
    the query's scan must partition-prune to the selected buckets."""
    import re

    from dupers_spark.sources.storage import StageStore

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    store = StageStore(spark, str(tmp_path))
    C = ann.ivf_index_write(store, "ivf", old, n_centroids=8, sample=1000)
    ann.ivf_index_append(store, "ivf", new)

    probes = emb.filter(F.col("vec_id") < 4)
    got_df = ann.ivf_index_topk(store, "ivf", probes, k=3, nprobe=3)
    got = {(r["probe_id"], r["rnk"], r["neighbor_id"])
           for r in got_df.collect()}
    # reference: same centroids, union assigned in one shot
    full_assigned = ann.ivf_assign(emb, C)
    want = {(r["probe_id"], r["rnk"], r["neighbor_id"])
            for r in ann.ivf_topk(full_assigned, probes, k=3, nprobe=3,
                                  centroids=C,
                                  index=full_assigned).collect()}
    assert got == want and len(want) == 12  # 4 probes × k=3

    # the persisted assignment is centroid_id-partitioned and the query's
    # literal bucket-union isin() reaches it as PartitionFilters
    plan = got_df._sc._jvm.PythonSQLUtils.explainString(
        got_df._jdf.queryExecution(), "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1)


def test_incremental_srp_cap_boundary_equals_uncapped_union(spark):
    """The SRP cap-boundary asymmetry (round-5 "wrong" #4) is closed: a
    bucket under max_bucket at index-build time that crosses it with the
    batch is FINISHED (new-touching pairs expanded, nothing dropped), so
    (old pairs) ∪ (incremental pairs) equals the uncapped full build and
    appended vectors are never silently unpaired at the boundary."""
    import numpy as np

    rng = np.random.default_rng(11)
    d = rng.standard_normal(64).astype(np.float32)
    d /= np.linalg.norm(d)
    # 11 colinear vectors (cos 1.0 pairwise) → one bucket per SRP table;
    # ids 0..4 in the index, 5..10 in the batch; cap 8 → every bucket
    # crosses the cap when combined
    rows = [(i, (d * (1.0 + 0.01 * i)).tolist()) for i in range(11)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    old = df.filter(F.col("vec_id") < 5)
    new = df.filter(F.col("vec_id") >= 5)

    index = ann.srp_index(old).localCheckpoint()
    old_pairs, d_old = ann.embedding_near_dup_pairs(
        old, threshold=0.99, max_bucket=8)
    inc_pairs, dropped, _inew = ann.incremental_embedding_near_dups(
        index, new, threshold=0.99, max_bucket=8)
    assert d_old.count() == 0 and dropped.count() == 0
    union = {(r["a"], r["b"]) for r in old_pairs.collect()} | \
        {(r["a"], r["b"]) for r in inc_pairs.collect()}
    uncapped, _ = ann.embedding_near_dup_pairs(
        df, threshold=0.99, max_bucket=2000)
    want = {(r["a"], r["b"]) for r in uncapped.collect()}
    assert union == want == {(a, b) for a in range(11) for b in range(11)
                             if a < b}
