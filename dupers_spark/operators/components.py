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


def _large_star(edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Γ(u) built from both edge directions; emit (v, m) for v > u.

    Hub-safe: the per-node minimum is a primitive ``min`` groupBy joined
    back onto the edge stream — no ``collect_set`` neighbor arrays, so a
    10^8-member star component never concentrates its neighborhood in one
    aggregation buffer (same pattern as exact.dup_edges).

    num_partitions sizes ONE explicit hash repartition on ``u``; the
    groupBy and the join both reuse that partitioning (Catalyst's
    EnsureRequirements sees HashPartitioning(u) already satisfied), so the
    explicit exchange REPLACES the two implicit ones rather than adding a
    third — and, unlike a session-level ``spark.sql.shuffle.partitions``
    override, it cannot race with queries planned concurrently on the
    same session.
    """
    # symmetrize via explode rather than union: a Union inside the iterative
    # join plan trips Catalyst's UnionBase.rewriteConstraints (key-not-found
    # on join-derived constraint attributes, Spark 4.1) and constraint
    # rewriting over growing loop plans is wasted planner work anyway
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("x"), F.col("v").alias("y")),
                F.struct(F.col("v").alias("x"), F.col("u").alias("y")),
            )
        ).alias("e")
    ).select(F.col("e.x").alias("u"), F.col("e.y").alias("v"))
    if num_partitions:
        sym = sym.repartition(num_partitions, "u")
    mins = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m")
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Canonicalize edges so u > v, attach small neighbors + u to min.

    Hub-safe min+join-back, like :func:`_large_star` (including the
    reused explicit ``u``-hash repartition in place of per-operator
    shuffles). In canonical form all neighbors v < u, so
    m = min(N(u) ∪ {u}) = min(v).
    """
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    if num_partitions:
        canon = canon.repartition(num_partitions, "u")
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    # emit (v, m) per neighbor AND (u, m) in one pass — explode instead of a
    # union (both branches would share lineage, which trips Catalyst's Union
    # constraint rewrite); duplicates collapse in the distinct
    return (
        canon.join(mins, "u")
        .select(F.explode(F.array(F.col("v"), F.col("u"))).alias("n"), "m")
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 50,
    checkpoint: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """pairs(a, b) → (image_id, component_id) with component_id = min member.

    Isolated nodes (no pairs) are not emitted — callers union singletons with
    component_id = own id if they need total assignment.

    partitions: hash-partition count for the star-round loop; None =
    ADAPTIVE, re-derived each barrier from the edge count the convergence
    fingerprint already measures (~50k edges per partition, clamped to
    [2, session ``spark.sql.shuffle.partitions``]). Two failure modes this
    avoids, both measured on 400k-node graphs: a fixed session-level count
    leaves converged near-empty rounds latency-bound (2× wall on a
    long-chain graph), while a fixed small count starves early
    compute-bound rounds of parallelism (2 partitions on 8 cores: CC 17.5
    → 21.8 s). The count is applied as an explicit ``repartition(n, u)``
    inside each star operator — never as a session-conf override, so
    concurrent queries (or a second CC loop) on the same session are
    unaffected.
    """
    edges = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).filter(
        F.col("u") != F.col("v")
    ).distinct()
    if checkpoint:
        edges = edges.localCheckpoint()

    def fingerprint(e: DataFrame) -> tuple[int, int]:
        # order-independent, overflow-free: bit_xor never exceeds int64
        # (a LongType SUM of hashes overflows at ~10M edges under Spark 4's
        # default ANSI mode and would crash exactly at target scale)
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    prev = fingerprint(edges)
    spark = pairs.sparkSession
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def loop_parts(n_edges: int) -> int:
        if partitions is not None:
            return partitions
        return max(2, min(session_parts, n_edges // 50_000 + 1))

    n_parts = loop_parts(prev[0])
    for _ in range(max_iter):
        # ONE large+small star pair per convergence check: the star pair
        # is the expensive unit (two shuffle rounds), while the check is a
        # single short aggregate over the freshly checkpointed frame
        # (~0.1-0.3 s even at 2 cores) — so checking after every pair
        # minimizes overshoot. A converged graph pays exactly one
        # confirmation pair; the earlier two-pairs-per-check variant
        # wasted a whole extra pair (measured 3.4 s of a 9.9 s loop on a
        # 243k-edge near-star dedup graph at 32 cores — dedup edge inputs
        # are mostly stars already, so convergence in 1-2 pairs is the
        # common case, and pair count, not barrier count, dominates).
        edges2 = _small_star(_large_star(edges, n_parts), n_parts)
        if checkpoint:
            edges2 = edges2.localCheckpoint()
        cur = fingerprint(edges2)
        edges = edges2
        if cur == prev:
            break
        prev = cur
        n_parts = loop_parts(cur[0])

    # star forest: u → root(v); roots also label themselves
    members = edges.select(F.col("u").alias("image_id"), F.col("v").alias("component_id"))
    roots = edges.select(F.col("v").alias("image_id"), F.col("v").alias("component_id")).distinct()
    return members.union(roots).distinct()


def incremental_components_delta(
        old_assign: DataFrame, new_edges: DataFrame, new_ids: DataFrame,
        a: str = "a", b: str = "b", id_col: str = "image_id",
) -> tuple[DataFrame, DataFrame]:
    """O(batch) re-clustering of an append batch against a valid total
    assignment → the DELTA representation:

      (relabel(old_lbl, new_lbl), new_assign(image_id, component_id))

    relabel maps every old component label that the batch merged into a
    smaller-id blob; new_assign is the batch rows' own labels. Together
    they determine the updated total assignment without materializing it:
    a row keeps its label unless its component_id appears in relabel.
    Callers that persist the assignment PARTITIONED (plans/pipeline.py)
    use the delta to overwrite only the partitions holding relabeled or
    new rows — O(touched) write amplification per append instead of the
    O(corpus) rewrite the monolithic form forces.
    :func:`incremental_components` is the thin corpus-wide wrapper.
    Both returned frames are eagerly checkpointed (O(batch) each).

    The contracted-graph construction: each old component is already a
    connected blob, so for clustering purposes it can be collapsed to a
    single node — its label. Map every new-edge endpoint x to
    L(x) = old component_id if x is in the corpus else x itself, run
    connected components over the contracted edge set {(L(a), L(b))}
    (O(batch) nodes — only components actually touched by the batch
    appear), and relabel.

    Label equivalence with a full rebuild: old labels are the min member
    id of their component (connected_components invariant, preserved
    inductively by this function), so the contracted CC's root —
    min over merged labels and new ids — IS the global min member of the
    merged component. Byte-identical output to rerunning CC over
    (old assignment star edges ∪ new edges), which is itself equivalent
    to a from-scratch rebuild over all edge families.

    Scale shape (the point): the old corpus is touched exactly ONCE here,
    shuffle-free — one broadcast-semi scan to fetch labels for the
    ≤2·|E_new| touched endpoints. Zero corpus shuffles, and the iterative
    CC barriers run over the contracted O(batch) graph instead of a
    corpus-sized star forest (the round-4 formulation re-clustered
    |corpus| star edges per append — O(corpus·rounds) shuffle volume that
    defeats incrementality at 10^12 rows). Requires batch ids disjoint
    from corpus ids (append semantics, enforced upstream by the pipeline).
    """
    import os

    edges = new_edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    ep = edges.select(F.col("a").alias(id_col)).unionByName(
        edges.select(F.col("b").alias(id_col))).distinct().localCheckpoint()
    # labels for touched OLD endpoints: one corpus scan, broadcast join,
    # O(batch) result
    old_lbls = old_assign.join(F.broadcast(ep), id_col) \
        .select(id_col, "component_id").localCheckpoint()
    lmap = ep.join(old_lbls, id_col, "left").select(
        id_col, F.coalesce("component_id", F.col(id_col)).alias("lbl"))
    ce = (
        edges
        .join(lmap.select(F.col(id_col).alias("a"), F.col("lbl").alias("la")), "a")
        .join(lmap.select(F.col(id_col).alias("b"), F.col("lbl").alias("lb")), "b")
        .select(F.col("la").alias("a"), F.col("lb").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct().localCheckpoint()
    )
    # The contracted graph is O(batch) BY CONSTRUCTION (only components the
    # batch touches appear), so for every realistic append it is far below
    # driver scale — a driver-side union-find labels it in milliseconds
    # where the iterative star loop pays 2 shuffle barriers + a fingerprint
    # job PER ROUND (measured: ~4 s of a 22 s 4k-row append was this loop's
    # barriers). The threshold keeps the distributed loop for pathological
    # batches; labels are identical either way (min member id — string min
    # matches Spark's F.min on strings).
    max_driver = int(os.environ.get("SPARK_GRAFT_DRIVER_CC_MAX_EDGES",
                                    str(1_000_000)))
    if ce.count() <= max_driver:
        contracted = _driver_components(ce, id_col)
    else:
        contracted = connected_components(ce).localCheckpoint()  # O(batch)
    # old components whose label changed (merged into a smaller-id blob)
    touched_old = old_lbls.select(F.col("component_id").alias(id_col)).distinct()
    relabel = (
        contracted.filter(F.col(id_col) != F.col("component_id"))
        .join(touched_old, id_col, "leftsemi")
        .select(F.col(id_col).alias("old_lbl"),
                F.col("component_id").alias("new_lbl"))
        .localCheckpoint()
    )
    # both sides of the batch bookkeeping joins are O(batch); hint them —
    # checkpointed frames carry no size stats, so the planner would SMJ
    new_in_graph = contracted.join(F.broadcast(new_ids.select(id_col)),
                                   id_col, "leftsemi")
    lone_new = new_ids.select(id_col).join(
        F.broadcast(contracted.select(id_col)), id_col, "left_anti") \
        .withColumn("component_id", F.col(id_col))
    new_assign = new_in_graph.unionByName(lone_new).localCheckpoint()
    return relabel, new_assign


def _driver_components(edges: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Union-find over an ALREADY-SMALL (collected) edge frame →
    (id_col, component_id=min member) as a local DataFrame. Only called on
    frames bounded by construction (the contracted batch graph); output
    matches connected_components exactly: every node of the edge set is
    labeled with the lexicographic min of its component."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    rows = edges.collect()
    for r in rows:
        u, v = r["a"], r["b"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # min-label union keeps the root the smallest member so far
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    out = [(x, find(x)) for x in parent]
    t = edges.schema["a"].dataType.simpleString()
    return edges.sparkSession.createDataFrame(
        out, f"{id_col} {t}, component_id {t}")


def incremental_components(old_assign: DataFrame, new_edges: DataFrame,
                           new_ids: DataFrame, a: str = "a", b: str = "b",
                           id_col: str = "image_id") -> DataFrame:
    """Corpus-wide form of :func:`incremental_components_delta`: the full
    updated (image_id, component_id) assignment, for callers that consume
    it as a frame rather than persisting partitioned. The corpus is still
    touched only by one map-side broadcast-relabel pass — but materializing
    the result writes O(corpus) rows, so pipelines that persist the
    assignment should apply the delta per-partition instead."""
    relabel, new_assign = incremental_components_delta(
        old_assign, new_edges, new_ids, a, b, id_col)
    updated_old = apply_relabel(old_assign, relabel, id_col)
    return updated_old.unionByName(new_assign)


def apply_relabel(assign: DataFrame, relabel: DataFrame,
                  id_col: str = "image_id") -> DataFrame:
    """One map-side broadcast pass: rows of relabeled components get their
    new label, everything else passes through. Preserves extra columns'
    values but projects to (id_col, component_id) + any columns of assign
    other than component_id."""
    other = [c for c in assign.columns if c != "component_id"]
    return assign.join(
        F.broadcast(relabel), assign["component_id"] == relabel["old_lbl"],
        "left",
    ).select(*other, F.coalesce("new_lbl", "component_id").alias("component_id"))


def with_singletons(assign: DataFrame, all_ids: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Total assignment: nodes absent from the pair graph label themselves."""
    lone = all_ids.select(F.col(id_col).alias("image_id")).join(
        assign.select("image_id"), "image_id", "left_anti"
    )
    return assign.unionByName(
        lone.withColumn("component_id", F.col("image_id"))
    )
