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
    """At τ high, SRP self-join pairs must be a subset of brute-force pairs,
    and every returned cos must be correct."""
    rows = embeddings.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    got = ann.embedding_near_dup_pairs(embeddings, threshold=0.8).collect()
    for r in got:
        a, b = vecs[r["a"]], vecs[r["b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["cos"]) < 1e-9
        assert cos >= 0.8
