"""MinHash + LSH near-duplicate engine over captions (north_rule core).

Pipeline (all DataFrame ops, JVM-side expressions from functions/hashing.py):

  1. COLLAPSE exact-duplicate captions first: groupBy(caption) → one
     representative per distinct caption + star edges (member → rep).
     This is the Zipf-flood defense: a degenerate caption repeated 10^9
     times contributes ONE row to the LSH stage instead of 10^9 rows in one
     band bucket, and its within-group pairs are represented implicitly by
     the star edges (never materialized — quadratic at scale).
  2. SIGNATURES: word-k-shingles → xxhash64 → n-permutation minhash.
  3. BANDING: b bands × r rows → band_buckets(band, key, rep_id).
  4. CANDIDATES: self-join band_buckets on (band, key), a < b, distinct.
     Bucket-size cap + AQE skew-join handle residual near-identical floods;
     dropped-bucket accounting is returned so recall loss is never silent.
  5. VERIFY: exact word-shingle Jaccard via array_intersect/array_union
     (JVM-side) ≥ τ.
  6. EDGES: verified cross-rep pairs + collapse star edges → connected
     components (operators/components.py).

Default config (numPerm=126, bands=42, rows=3) gives candidate probability
1-(1-s³)⁴² ≈ 0.999 at s=0.54 (one-word swap of a 12-word caption) — the
recall ≥ 0.99 gate's operating point.

Reference parity: this generalizes dupers' digest-equality join
(pkg/dupe/dupe.go:919-931) to Jaccard similarity; the collapse stage is the
exact-dup bucket semantics (pkg/dupe/parse/parse.go:102-117).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from dupers_spark.functions import hashing as H


@dataclass(frozen=True)
class LSHConfig:
    shingle_k: int = 3          # words per shingle
    num_perm: int = 126
    bands: int = 42
    rows: int = 3               # bands * rows must equal num_perm
    threshold: float = 0.5      # exact-Jaccard verify threshold
    seed: int = 42
    max_bucket: int = 2000      # candidate cap per band bucket (skew guard)

    def __post_init__(self) -> None:
        if self.bands * self.rows != self.num_perm:
            raise ValueError("bands * rows must equal num_perm")


def collapse_exact(df: DataFrame, id_col: str = "image_id",
                   text_col: str = "caption") -> tuple[DataFrame, DataFrame]:
    """→ (reps(rep_id, caption), star_edges(a=member, b=rep)).

    One shuffle on caption. rep = min(id) for determinism (first-exemplar
    rule, parse.go:113-115).
    """
    grouped = df.groupBy(text_col).agg(
        F.min(id_col).alias("rep_id"),
        F.collect_set(id_col).alias("members"),
    )
    reps = grouped.select("rep_id", F.col(text_col).alias("caption"))
    star = (
        grouped.select("rep_id", F.explode("members").alias("member"))
        .filter(F.col("member") != F.col("rep_id"))
        .select(F.col("member").alias("a"), F.col("rep_id").alias("b"))
    )
    return reps, star


def signatures(reps: DataFrame, cfg: LSHConfig = LSHConfig()) -> DataFrame:
    """reps(rep_id, caption) → (rep_id, shingles, sig array<long>)."""
    sh = H.word_shingles(F.col("caption"), cfg.shingle_k)
    return reps.select(
        "rep_id",
        sh.alias("shingles"),
    ).select(
        "rep_id",
        "shingles",
        H.minhash_signature(H.hashed_shingles(F.col("shingles")), cfg.num_perm, cfg.seed).alias("sig"),
    )


def band_buckets(sigs: DataFrame, cfg: LSHConfig = LSHConfig()) -> DataFrame:
    """(rep_id, band, key) — one row per band per rep; equi-joinable."""
    return sigs.select(
        "rep_id", F.explode(H.band_keys(F.col("sig"), cfg.bands, cfg.rows)).alias("bk")
    ).select("rep_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def candidate_pairs(buckets: DataFrame, cfg: LSHConfig = LSHConfig()) -> tuple[DataFrame, DataFrame]:
    """Self-join on (band, key) → distinct (a, b) rep pairs, a < b.

    Buckets larger than cfg.max_bucket are dropped and accounted in the
    returned metrics DF (band, key, size) — silent recall loss is forbidden
    (SURVEY §4.1). AQE skew-join splits the surviving heavy buckets.
    """
    sizes = buckets.groupBy("band", "key").agg(F.count("*").alias("size"))
    dropped = sizes.filter(F.col("size") > cfg.max_bucket)
    ok = buckets.join(
        dropped.select("band", "key"), ["band", "key"], "left_anti"
    )
    left = ok.select("band", "key", F.col("rep_id").alias("a"))
    right = ok.select("band", "key", F.col("rep_id").alias("b"))
    pairs = (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return pairs, dropped


def verify_pairs(pairs: DataFrame, sigs: DataFrame,
                 cfg: LSHConfig = LSHConfig()) -> DataFrame:
    """Exact word-shingle Jaccard on candidate pairs → (a, b, sim), sim ≥ τ.

    Two hash joins to fetch shingle arrays (the signature table is the
    small side at probe time → broadcast when it fits), then pure JVM array
    intersection. No Python.
    """
    sa = sigs.select(F.col("rep_id").alias("a"), F.col("shingles").alias("sh_a"))
    sb = sigs.select(F.col("rep_id").alias("b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(sa, "a").join(sb, "b")
        .withColumn("sim", inter / union)
        .filter(F.col("sim") >= cfg.threshold)
        .select("a", "b", "sim")
    )


def near_dup_edges(images: DataFrame, cfg: LSHConfig = LSHConfig(),
                   id_col: str = "image_id", text_col: str = "caption",
                   ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full caption near-dup pipeline.

    Returns (edges(a,b), verified_rep_pairs(a,b,sim), dropped_buckets).
    edges = star edges (exact-dup members → rep) ∪ verified rep pairs —
    feed to connected_components for cluster labels.
    """
    reps, star = collapse_exact(images, id_col, text_col)
    sigs = signatures(reps, cfg)
    buckets = band_buckets(sigs, cfg)
    pairs, dropped = candidate_pairs(buckets, cfg)
    verified = verify_pairs(pairs, sigs, cfg)
    edges = star.unionByName(verified.select("a", "b"))
    return edges, verified, dropped
