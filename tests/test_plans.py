"""Physical-plan quality gates: the plan we'd want at 100 TB, not just any
plan that passes. Checks Catalyst artifacts in explain output:
  * parquet filter pushdown + column pruning (F6 / SURVEY §4)
  * broadcast join for small dimension sides
  * no Python (BatchEvalPython) nodes in JVM-only operators
"""

import re

from pyspark.sql import functions as F

from dupers_spark.operators import exact, search

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # ReadSchema must not contain unprojected columns
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_contains_search_prunes_columns(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = search.search_contains(docs, "merge", col="text").select("doc_id")
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", _plan(q)).group(1)
    assert set(re.findall(r"(\w+):", read_schema)) == {"doc_id", "text"}


def test_probe_join_broadcasts_small_index(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = docs.select(
        F.col("doc_id").cast("string").alias("image_id"),
        F.sha2("text", 256).alias("sha256"),
    )
    plan = _plan(exact.probe_matches(sigs, sigs.limit(50)))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ivf_probe_path_never_shuffles_corpus(spark):
    """IVF query plans must not move the corpus. np path: a bucket-union
    filter + ONE Arrow pass, no join at all (the probe matrix + bucket
    mask ship as a broadcast variable); hof path: broadcast hash joins of
    the tiny selection, never a shuffle of the corpus or a cartesian
    product. Either way the sole corpus exchange allowed is the final
    top-k window's hash partitioning on probe_id."""
    from dupers_spark.operators import ann

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 4)
    plan_np = _plan(ann.ivf_topk(emb, probes, k=3, n_centroids=8, nprobe=2))
    assert "Join" not in plan_np and "CartesianProduct" not in plan_np
    assert plan_np.count("Exchange hashpartitioning") <= 1
    plan_hof = _plan(ann.ivf_topk(emb, probes, k=3, n_centroids=8, nprobe=2,
                                  rerank="hof"))
    assert "BroadcastHashJoin" in plan_hof
    assert "CartesianProduct" not in plan_hof
    assert plan_hof.count("Exchange hashpartitioning") <= 1


def test_exact_operators_stay_jvm_side(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = docs.select(
        F.col("doc_id").cast("string").alias("image_id"),
        F.sha2("text", 256).alias("sha256"),
    )
    for df in [exact.dup_pairs(sigs), exact.dup_groups(sigs), exact.ls_listing(sigs)]:
        plan = _plan(df)
        assert "BatchEvalPython" not in plan  # no row-at-a-time Python
        assert "ArrowEvalPython" not in plan  # exact engine needs no UDFs at all


def test_whole_stage_codegen_present(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
    )
    # Under AQE the pre-execution plan shows AdaptiveSparkPlan with
    # isFinalPlan=false and no codegen spans; execute first, then assert on
    # the final executed plan, where codegen stages appear as '*(n)' markers.
    q.collect()
    executed = q._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    assert "*(" in executed  # WholeStageCodegen stage markers


def test_incremental_probe_never_shuffles_index(spark):
    """The incremental append-batch path (minhash_lsh.incremental_bucket_
    pairs) must not move the persisted index: every join that touches the
    index side is a BROADCAST of batch-derived frames (touched keys, new
    buckets), and the only hash exchanges are over the touched SLICE and
    the batch — acceptable because they scale with |batch|·bands, not with
    the corpus. Gate: no SortMergeJoin / ShuffledHashJoin anywhere in the
    plan (any of those would mean the index was exchanged)."""
    from dupers_spark.operators import minhash_lsh as ml

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = docs.select(F.col("doc_id").cast("string").alias("rep_id"),
                       F.col("text").alias("caption"))
    cfg = ml.LSHConfig()
    index_sigs = ml.signatures(base.filter(F.col("rep_id").cast("int") % 2 == 0), cfg)
    new_sigs = ml.signatures(base.filter(F.col("rep_id").cast("int") % 2 == 1), cfg)
    pairs, dropped = ml.incremental_bucket_pairs(
        ml.band_buckets(index_sigs, cfg), ml.band_buckets(new_sigs, cfg),
        cfg.max_bucket)
    for df in (pairs, dropped):
        plan = _plan(df)
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
    # since round 7 the probe is LAZY end to end (index scan + broadcast
    # probe + kernel land in one job), so the plan shows exactly ONE join —
    # the broadcast probe of the index by the batch's touched keys — and
    # the kernel itself keeps only new-touching pairs (is_new flag): no
    # further join downstream of the expansion
    plan_pairs = _plan(pairs)
    assert "BroadcastHashJoin" in plan_pairs


def test_bucket_stage_probe_prunes_kb_partitions(spark, tmp_path):
    """A persisted bucket stage is kb-partitioned; an append-batch probe
    must prune to the touched kb partitions at the SCAN (PartitionFilters),
    so trickle batches read a fraction of the index instead of all of it."""
    from dupers_spark.operators import minhash_lsh as ml

    idx = spark.range(2000).select(
        F.col("id").cast("string").alias("rep_id"),
        (F.col("id") % 42).cast("int").alias("band"),
        F.xxhash64("id").alias("key"))
    path = str(tmp_path / "lsh_buckets")
    ml.with_kb(idx).write.partitionBy("kb").parquet(path)
    stage = spark.read.parquet(path)
    batch = spark.createDataFrame([(0, 12345)], "band int, key long")
    pruned = ml.prune_index_by_kb(stage, batch)
    part_filters = re.search(r"PartitionFilters: \[([^\]]*)\]", _plan(pruned))
    assert part_filters and "kb" in part_filters.group(1)
    assert pruned.select("kb").distinct().count() <= 1  # 1 of 64 read


def test_incremental_components_relabel_is_broadcast_only(spark):
    """incremental_components' returned corpus-size frame must touch the
    old assignment with map-side work only: the relabel join is a
    BroadcastHashJoin (the relabel map is O(batch)) and no SortMergeJoin /
    ShuffledHashJoin appears anywhere — a corpus shuffle per append batch
    is exactly what the contracted-graph formulation exists to kill."""
    from dupers_spark.operators.components import incremental_components

    old = spark.range(5000).selectExpr(
        "concat('img', id) AS image_id",
        "concat('img', id - (id % 5)) AS component_id")
    delta = spark.createDataFrame(
        [("n1", "img0"), ("n1", "img5"), ("n2", "n3")], ["a", "b"])
    new_ids = spark.createDataFrame(
        [("n1",), ("n2",), ("n3",), ("n4",)], ["image_id"])
    out = incremental_components(old, delta, new_ids)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_pipeline_incremental_probe_reads_bucket_stage(spark, monkeypatch,
                                                       tmp_path):
    """run_incremental must probe the PERSISTED lsh_buckets / phash_blocks
    stages — a plain scan of the materialized bucket index — and NOT
    re-derive band/block rows by exploding the full signature/rep stage
    per batch (the O(|corpus|·bands) per-append cost this stage exists to
    kill)."""
    from dupers_spark.plans import pipeline as pl
    from dupers_spark.sources import datagen

    images = datagen.make_images(spark, 80)
    parity = F.substring("image_id", -1, 1).cast("int") % 2
    cfg = pl.PipelineConfig(warehouse=str(tmp_path / "wh"))
    pl.DedupPipeline(spark, cfg).run(images.filter(parity == 0))

    captured = {}
    orig_ml = pl.ml.incremental_near_dup_edges
    orig_sh = pl.sh.incremental_hamming_edges

    def spy_ml(index_sigs, new_images, cfg_, *a, **kw):
        captured["lsh_buckets"] = kw.get("index_buckets")
        return orig_ml(index_sigs, new_images, cfg_, *a, **kw)

    def spy_sh(index_reps, new_images, radius, *a, **kw):
        captured["phash_blocks"] = kw.get("index_blocks")
        return orig_sh(index_reps, new_images, radius, *a, **kw)

    monkeypatch.setattr(pl.ml, "incremental_near_dup_edges", spy_ml)
    monkeypatch.setattr(pl.sh, "incremental_hamming_edges", spy_sh)
    pl.DedupPipeline(spark, cfg).run_incremental(images.filter(parity == 1))

    for stage in ("lsh_buckets", "phash_blocks"):
        df = captured[stage]
        assert df is not None, f"{stage} was not passed to the probe"
        plan = _plan(df)
        assert stage in plan          # scans the persisted bucket stage
        assert "Generate" not in plan  # no per-batch posexplode of the index
