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
    impl: str = "pandas"        # 'pandas' (Arrow numpy kernel, fast) | 'sql'

    def __post_init__(self) -> None:
        if self.bands * self.rows != self.num_perm:
            raise ValueError("bands * rows must equal num_perm")


def collapse_groups(df: DataFrame, id_col: str = "image_id",
                    text_col: str = "caption") -> DataFrame:
    """→ grouped(rep_id, caption, members): one shuffle on the text key.

    rep = min(id) for determinism (first-exemplar rule, parse.go:113-115).
    Callers materialize THIS frame once and project reps/star from it.
    """
    return df.groupBy(F.col(text_col).alias("caption")).agg(
        F.min(id_col).alias("rep_id"),
        F.collect_set(id_col).alias("members"),
    )


def collapse_exact(df: DataFrame, id_col: str = "image_id",
                   text_col: str = "caption") -> tuple[DataFrame, DataFrame]:
    """→ (reps(rep_id, caption), star_edges(a=member, b=rep))."""
    grouped = collapse_groups(df, id_col, text_col)
    return reps_from_groups(grouped), star_from_groups(grouped)


def reps_from_groups(grouped: DataFrame) -> DataFrame:
    return grouped.select("rep_id", "caption")


def star_from_groups(grouped: DataFrame) -> DataFrame:
    return (
        grouped.select("rep_id", F.explode("members").alias("member"))
        .filter(F.col("member") != F.col("rep_id"))
        .select(F.col("member").alias("a"), F.col("rep_id").alias("b"))
    )


def signatures(reps: DataFrame, cfg: LSHConfig = LSHConfig()) -> DataFrame:
    """reps(rep_id, caption) → (rep_id, shingles, bands array<long>).

    impl='pandas' (default): ONE fused Arrow/numpy kernel does shingling +
    minhash + banding — no interpreted Spark HOF in the hot path (HOF eval
    is slow AND shows 3× run-to-run CPU variance under JIT). impl='sql'
    keeps everything JVM-side (oracle-checked variants / no-Python
    fallback) — same output shape.
    """
    if cfg.impl == "pandas":
        from dupers_spark.functions.fasthash import caption_signature_udf

        fused = caption_signature_udf(
            cfg.shingle_k, cfg.num_perm, cfg.bands, cfg.rows, cfg.seed
        )
        return reps.select("rep_id", fused(F.col("caption")).alias("s")).select(
            "rep_id", F.col("s.shingles").alias("shingles"), F.col("s.bands").alias("bands")
        )
    sh = H.word_shingles(F.col("caption"), cfg.shingle_k)
    with_shingles = reps.select("rep_id", sh.alias("shingles"))
    sig = H.minhash_signature(
        H.hashed_shingles(F.col("shingles")), cfg.num_perm, cfg.seed
    )
    band_arr = F.transform(
        H.band_keys(sig, cfg.bands, cfg.rows), lambda bk: bk["key"]
    )
    return with_shingles.select("rep_id", "shingles", band_arr.alias("bands"))


def band_buckets(sigs: DataFrame, cfg: LSHConfig = LSHConfig()) -> DataFrame:
    """(rep_id, band, key) — one row per band per rep; equi-joinable.

    posexplode of the precomputed band-key array — compiled, no HOF.
    """
    return sigs.select(
        "rep_id", F.posexplode(F.col("bands")).alias("band", "key")
    ).select("rep_id", "band", "key")


def candidate_pairs(buckets: DataFrame, cfg: LSHConfig = LSHConfig()) -> tuple[DataFrame, DataFrame]:
    """(band, key) buckets → distinct (a, b) rep pairs, a < b.

    ONE shuffle: groupBy (band, key) with collect_list, then in-row pair
    expansion — no self-join, no materialized band table. The size cap is a
    filter on the same aggregate; capped buckets are returned in the
    metrics DF (band, key, size) — silent recall loss is forbidden
    (SURVEY §4.1). Per-bucket work is O(size²) bounded by cfg.max_bucket;
    AQE coalesces the post-shuffle partitions.
    """
    grouped = buckets.groupBy("band", "key").agg(
        F.collect_list("rep_id").alias("ids"), F.count("*").alias("size")
    )
    dropped = grouped.filter(F.col("size") > cfg.max_bucket).select("band", "key", "size")
    ok = grouped.filter((F.col("size") >= 2) & (F.col("size") <= cfg.max_bucket))
    ids_sorted = F.array_sort("ids")
    pairs_arr = F.flatten(
        F.transform(
            ids_sorted,
            lambda x, i: F.transform(
                F.slice(ids_sorted, i + F.lit(2), F.lit(cfg.max_bucket)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        ok.select(F.explode(pairs_arr).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
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

    The signature frame is EAGERLY materialized (localCheckpoint) before
    the fan-out: it feeds three downstream consumers (banding + both verify
    sides), and Spark 4's AQE submits independent query stages
    concurrently — a lazily-persisted frame would be recomputed by every
    branch in parallel (observed 2-3× anti-scaling at 32 cores). The
    checkpoint also truncates lineage past the collapse shuffle. In the
    durable pipeline (plans/pipeline.py) these are parquet/Iceberg stage
    tables instead — same dataflow.
    """
    grouped = collapse_groups(images, id_col, text_col).localCheckpoint()
    star = star_from_groups(grouped)
    sigs = signatures(reps_from_groups(grouped), cfg).localCheckpoint()
    # band rows are consumed exactly once (single groupBy) — never cached
    buckets = band_buckets(sigs, cfg)
    pairs, dropped = candidate_pairs(buckets, cfg)
    verified = verify_pairs(pairs, sigs, cfg)
    edges = star.unionByName(verified.select("a", "b"))
    return edges, verified, dropped
