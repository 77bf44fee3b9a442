"""Similarity search over embedding columns (array<float>).

Two paths, per the training-data-pipeline mandate:

  * brute-force cosine top-k — the exactness baseline: probe × corpus join,
    dot product as a single JVM expression (zip_with + aggregate — no
    Python), window top-k. Right shape when the probe set is small (probe
    side broadcast; corpus scanned once).
  * LSH-bucketed (random hyperplane / sign-random-projection): 16 seeded
    hyperplanes → int bucket key; probes join only their own bucket (+
    optional 1-bit multiprobe neighbors), then exact cosine re-rank within
    candidates. At 10^12 rows this turns a full scan per probe into an
    equi-join on a 16-bit key (≈ n/65536 candidates per probe).

All arithmetic is cast to double before summation — deterministic left fold
in array order (F.aggregate), independent of partitioning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, probes: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(probe_id, neighbor_id, cos) — exact top-k per probe, self excluded.

    Probe side is broadcast (small); ties broken by neighbor id for
    determinism.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("pvec"), F.col("cvec")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "neighbor_id", "cos", "rnk")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit_j = (vec · plane_j) > 0."""
    val: Column = F.lit(0)
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, lit_plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        val = val.bitwiseOR(bit)
    return val


def lsh_topk(corpus: DataFrame, probes: DataFrame, k: int = 5, dim: int = 64,
             n_planes: int = 16, seed: int = 42, multiprobe_bits: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: SRP bucket equi-join (+ multiprobe) → exact re-rank.

    multiprobe_bits: probes also visit buckets at Hamming distance 1 in the
    first ``multiprobe_bits`` plane bits — recall/cost dial.
    """
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    p0 = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    # multiprobe: original bucket + 1-bit flips of the lowest bits
    variants = [F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(multiprobe_bits)
    ]
    p = p0.withColumn("bucket", F.explode(F.array(*variants)))
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("pvec"), F.col("cvec")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "neighbor_id", "cos", "rnk")
    )


def cosine_pairs_exact(corpus: DataFrame, threshold: float,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """EXACT all-pairs cosine ≥ τ — O(n²) verification/oracle variant.

    Production near-dup path is :func:`embedding_near_dup_pairs` (SRP
    buckets); this exists for recall oracles and small probe sets.
    """
    b = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    left = b.select(F.col("id").alias("a"), F.col("vec").alias("va"))
    right = b.select(F.col("id").alias("b"), F.col("vec").alias("vb"))
    return (
        left.join(right, F.col("a") < F.col("b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def embedding_near_dup_pairs(corpus: DataFrame, threshold: float = 0.95,
                             dim: int = 64, n_planes: int = 12, seed: int = 42,
                             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (a, b, cos ≥ τ) via SRP self-join.

    The dedup flavor of ANN: bucket self-join instead of probe fan-out.
    """
    planes = hyperplanes(dim, n_planes, seed)
    b = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    left = b.select(F.col("bucket"), F.col("id").alias("a"), F.col("vec").alias("va"))
    right = b.select(F.col("bucket"), F.col("id").alias("b"), F.col("vec").alias("vb"))
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
        .distinct()
    )
