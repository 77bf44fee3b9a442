"""Iterative connected components over a pair graph — the clustering stage.

Implements the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
as pure DataFrame joins + aggregations:

  large-star: for every node u, attach every neighbor v > u to
              m = min(N(u) ∪ {u})
  small-star: for every node u, attach every neighbor v ≤ u (and u itself)
              to m = min(N(u) ∪ {u})

Each round is two shuffles on the node id; convergence when the edge set is
a stable star forest (every edge points directly at its component root).
Lineage is cut every iteration with localCheckpoint — at 10^12-edge scale
this would be a write to an Iceberg stage table instead (same call site,
see plans/pipeline.py), which also makes the loop resumable mid-iteration.

The reference never clusters (its Checksums map keeps one exemplar per
digest, pkg/dupe/parse/parse.go:31); clustering is required by the
north_rule to produce component labels for near-dup groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Γ(u) built from both edge directions; emit (v, m) for v > u."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nbrs = sym.groupBy("u").agg(
        F.least(F.min("v"), F.min("u")).alias("m"),
        F.collect_set("v").alias("vs"),
    )
    return (
        nbrs.select("u", "m", F.explode("vs").alias("v"))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Canonicalize edges so u ≥ v, group by u, attach small neighbors + u to min."""
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    nbrs = canon.groupBy("u").agg(
        F.least(F.min("v"), F.min("u")).alias("m"),
        F.collect_set("v").alias("vs"),
    )
    out = nbrs.select(
        "u", "m", F.explode(F.array_union(F.array(F.col("u")), F.col("vs"))).alias("v")
    )
    return (
        out.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """pairs(a, b) → (image_id, component_id) with component_id = min member.

    Isolated nodes (no pairs) are not emitted — callers union singletons with
    component_id = own id if they need total assignment.
    """
    edges = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).filter(
        F.col("u") != F.col("v")
    ).distinct()
    if checkpoint:
        edges = edges.localCheckpoint()

    def fingerprint(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1 << 40))), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    prev = fingerprint(edges)
    for _ in range(max_iter):
        edges2 = _small_star(_large_star(edges))
        if checkpoint:
            edges2 = edges2.localCheckpoint()
        # converged when the distinct edge set is unchanged — one cheap
        # aggregate (count + order-independent hash sum) per iteration
        cur = fingerprint(edges2)
        edges = edges2
        if cur == prev:
            break
        prev = cur

    # star forest: u → root(v); roots also label themselves
    members = edges.select(F.col("u").alias("image_id"), F.col("v").alias("component_id"))
    roots = edges.select(F.col("v").alias("image_id"), F.col("v").alias("component_id")).distinct()
    return members.union(roots).distinct()


def with_singletons(assign: DataFrame, all_ids: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Total assignment: nodes absent from the pair graph label themselves."""
    lone = all_ids.select(F.col(id_col).alias("image_id")).join(
        assign.select("image_id"), "image_id", "left_anti"
    )
    return assign.unionByName(
        lone.withColumn("component_id", F.col("image_id"))
    )
