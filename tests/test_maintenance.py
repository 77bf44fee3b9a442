"""Automated compaction policy: a long-horizon append workload's file and
shard counts must stay bounded WITHOUT an operator noticing them first
(round-5 verdict item #3) — maintain_warehouse triggers compact_stage /
suffix-array rebuild from thresholds, and answers are unchanged."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from dupers_spark.operators import search
from dupers_spark.plans.pipeline import (
    DedupPipeline,
    PipelineConfig,
    _stage_file_stats,
    maintain_warehouse,
)
from dupers_spark.sources import datagen
from dupers_spark.sources.storage import StageStore


def test_maintain_warehouse_bounds_files_and_shards(spark, tmp_path):
    """~20 small appends accrete files in every appended stage and shards
    in the SA index; one maintain_warehouse pass brings both under their
    thresholds, with the cluster assignment and query answers unchanged."""
    wh = str(tmp_path / "wh")
    images = datagen.make_images(spark, 120).cache()
    images.count()
    base = images.filter(F.col("image_id") < "img_00000060")
    cfg = PipelineConfig(warehouse=wh)
    DedupPipeline(spark, cfg).run(base)

    # the SA stage lives in the same warehouse: base build + appends
    store = StageStore(spark, wh)
    store.write("suffix_index",
                search.build_suffix_index(base, "image_id", "caption"))

    for i in range(20):
        lo = 60 + 3 * i
        batch = images.filter(
            (F.col("image_id") >= f"img_{lo:08d}")
            & (F.col("image_id") < f"img_{lo + 3:08d}"))
        DedupPipeline(spark, cfg).run_incremental(batch)
        search.append_suffix_index(store, "suffix_index", batch)

    # accretion really happened: some stage is past its threshold
    sig_files, _ = _stage_file_stats(os.path.join(wh, "signatures"))
    assert sig_files > 8
    n_shards_before = store.read("suffix_index").count()
    derived = search.volume_shards(spark, 10_000)  # tiny corpus → floor
    assert n_shards_before > 4 * derived

    # the served assignment is base ∪ delta with the relabel log applied
    # (appends never rewrite the base stage since round 7)
    assign_before = {(r["image_id"], r["component_id"])
                     for r in DedupPipeline(spark, cfg)
                     ._effective_components()
                     .select("image_id", "component_id").collect()}
    assert os.path.exists(os.path.join(wh, "components_delta"))
    hits_before = {r["doc_id"] for r in search.query_suffix_index(
        store.read("suffix_index"), "tiger").collect()}

    records = {r["stage"]: r for r in maintain_warehouse(spark, cfg)}

    # the policy acted where thresholds were crossed…
    assert records["signatures"]["action"] == "compacted"
    assert records["suffix_index"]["action"] == "rebuilt_sa"
    # …and every stage now sits under its bound
    for name, rec in records.items():
        path = os.path.join(wh, name)
        n_files, n_parts = _stage_file_stats(path)
        if rec["action"] != "rebuilt_sa":
            assert n_files <= 8 * max(1, n_parts), (name, n_files, n_parts)
    assert store.read("suffix_index").count() <= 4 * derived

    # answers unchanged: same assignment, same substring hits — and the
    # fold landed everything back in the BASE stage (delta/log dropped)
    assert not os.path.exists(os.path.join(wh, "components_delta"))
    assert not os.path.exists(os.path.join(wh, "components_relabel"))
    assign_after = {(r["image_id"], r["component_id"])
                    for r in spark.read.parquet(
                        os.path.join(wh, "components"))
                    .select("image_id", "component_id").collect()}
    assert assign_after == assign_before and len(assign_after) == 120
    hits_after = {r["doc_id"] for r in search.query_suffix_index(
        store.read("suffix_index"), "tiger").collect()}
    scan = {r["image_id"] for r in search.search_contains(images, "tiger")
            .select("image_id").collect()}
    assert hits_after == hits_before == scan

    # a partitioned stage keeps its layout (probe pruning survives)
    kb_dirs = glob.glob(os.path.join(wh, "lsh_buckets", "kb=*"))
    assert kb_dirs, "lsh_buckets lost its kb partitioning"

    # the warehouse is still appendable after compaction (markers intact)
    tail = images.filter(F.col("image_id") >= "img_00000120")
    assert tail.count() == 0  # corpus exhausted — append an empty batch
    DedupPipeline(spark, cfg).run_incremental(tail)


def test_maintain_warehouse_refuses_mid_append(spark, tmp_path):
    """Compaction swaps directories; it must refuse while an incremental
    append window is open (the _INC_PENDING sentinel)."""
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    with open(os.path.join(wh, "_INC_PENDING"), "w") as fh:
        fh.write("in flight")
    with pytest.raises(ValueError, match="_INC_PENDING"):
        maintain_warehouse(spark, wh)


def test_maintain_warehouse_converges(spark, tmp_path):
    """The policy must converge, not thrash: after one pass has right-sized
    a warehouse, an immediate second pass reports ok everywhere and
    rewrites nothing (mtime-stable files)."""
    wh = str(tmp_path / "wh")
    images = datagen.make_images(spark, 60)
    DedupPipeline(spark, PipelineConfig(warehouse=wh)).run(images)
    maintain_warehouse(spark, wh)  # first pass may merge fresh task-files

    def mtimes():
        return {f: os.path.getmtime(f) for f in glob.glob(
            os.path.join(wh, "**", "*.parquet"), recursive=True)}

    before = mtimes()
    records = maintain_warehouse(spark, wh)
    assert all(r["action"] == "ok" for r in records)
    assert mtimes() == before


def test_two_way_exclusion_and_sentinel_release(spark, tmp_path):
    """Exclusion must be two-way (round-6 review): compaction refuses
    mid-append (above), and an APPEND must refuse mid-maintenance —
    otherwise it could write parquet files into a directory compact_stage
    is about to rename aside and delete, silently losing the batch. Both
    sides back off without leaving their own sentinel, and a successful
    maintenance releases _MAINT_PENDING."""
    wh = str(tmp_path / "wh")
    images = datagen.make_images(spark, 60).cache()
    images.count()
    cfg = PipelineConfig(warehouse=wh)
    base = images.filter(F.col("image_id") < "img_00000030")
    batch = images.filter(F.col("image_id") >= "img_00000030")
    DedupPipeline(spark, cfg).run(base)

    maint = os.path.join(wh, "_MAINT_PENDING")
    with open(maint, "w") as fh:
        fh.write("in flight")
    with pytest.raises(ValueError, match="_MAINT_PENDING"):
        DedupPipeline(spark, cfg).run_incremental(batch)
    # the back-off released the append sentinel (nothing was appended)
    assert not os.path.exists(os.path.join(wh, "_INC_PENDING"))
    with pytest.raises(ValueError, match="_MAINT_PENDING"):
        DedupPipeline(spark, cfg).run(base)
    # a crashed/concurrent maintenance window refuses a second one
    with pytest.raises(ValueError, match="_MAINT_PENDING"):
        maintain_warehouse(spark, cfg)
    os.remove(maint)

    # normal maintenance releases its sentinel; appends work again after
    maintain_warehouse(spark, cfg)
    assert not os.path.exists(maint)
    assert DedupPipeline(spark, cfg).run_incremental(batch).count() == 60
    images.unpersist()


def test_partition_moduli_derive_scale_and_kb_metadata(spark, tmp_path):
    """Round-6 verdict #6: partition counts must derive from corpus size,
    not a constant tuned to local mode — 64 stays the floor at bench/test
    scale (layouts unchanged), the modulus scales past ~128M rows, and the
    modulus a stage was WRITTEN with rides in column metadata so probes
    and appends always match the layout at rest (legacy stages without
    metadata default to 64 — exactly what they were built with)."""
    from dupers_spark.operators import minhash_lsh as ml
    from dupers_spark.plans.pipeline import derive_cb_partitions

    assert ml.derive_kb_partitions(100_000) == 64          # floor
    assert ml.derive_kb_partitions(64 * 2_000_000 + 1) == 128
    assert ml.derive_kb_partitions(10**12) == 1 << 19      # scales
    assert derive_cb_partitions(400_000) == 64
    assert derive_cb_partitions(10**12) == 1 << 19

    # kb modulus round-trips through parquet metadata; pruning with a
    # non-default modulus reads the stage's OWN layout and stays exact
    idx = spark.range(4000).selectExpr(
        "cast(id as string) AS rep_id",
        "cast(id % 42 as int) AS band", "xxhash64(id) AS key")
    path = str(tmp_path / "buckets256")
    ml.with_kb(idx, 256).write.partitionBy("kb").parquet(path)
    stage = spark.read.parquet(path)
    assert ml.kb_modulus(stage) == 256
    legacy = spark.range(10).selectExpr("id AS key")
    assert ml.kb_modulus(legacy.withColumn("kb", F.lit(0))) == 64

    batch = spark.createDataFrame([(0, 12345), (7, -99)], "band int, key long")
    pruned = ml.prune_index_by_kb(stage, batch)
    want_kbs = {12345 & 255, -99 & 255}
    assert {r["kb"] for r in pruned.select("kb").distinct().collect()} \
        <= want_kbs
    # and the probe through the public API matches a brute-force join
    got, _ = ml.incremental_bucket_pairs(
        stage, batch.withColumn("rep_id", F.lit("znew")), max_bucket=2000)
    brute = idx.join(batch, ["band", "key"]).count()
    assert got.count() == brute  # every (band,key) match pairs with znew


def test_maintenance_fold_migrates_cb_modulus(spark, tmp_path, monkeypatch):
    """A warehouse built at the 64-partition floor must migrate to a newly
    derived cb modulus during the maintenance fold — one-time, equivalence
    green (round-6 verdict #6's done-criterion)."""
    import glob

    from dupers_spark.plans import pipeline as pl

    wh = str(tmp_path / "wh")
    images = datagen.make_images(spark, 120).localCheckpoint()
    base = images.filter(F.col("image_id") < "img_00000090")
    batch = images.filter(F.col("image_id") >= "img_00000090")
    cfg = PipelineConfig(warehouse=wh)
    DedupPipeline(spark, cfg).run(base)
    assert len(glob.glob(os.path.join(wh, "components", "cb=*"))) <= 64

    pipe = DedupPipeline(spark, cfg)
    pipe.run_incremental(batch)
    served_before = {(r["image_id"], r["component_id"])
                     for r in pipe._effective_components()
                     .select("image_id", "component_id").collect()}

    # corpus "outgrew" the floor: force the derived count to 128
    monkeypatch.setattr(pl, "derive_cb_partitions",
                        lambda n, target_rows=0, floor=64: 128)
    records = {r["stage"]: r for r in maintain_warehouse(spark, cfg)
               if r["action"] == "folded_delta"}
    assert records["components"]["cb_mod_after"] == 128

    migrated = spark.read.parquet(os.path.join(wh, "components"))
    assert pl.cb_modulus(migrated) == 128
    cb_dirs = glob.glob(os.path.join(wh, "components", "cb=*"))
    assert any(int(d.rsplit("=", 1)[1]) >= 64 for d in cb_dirs)
    served_after = {(r["image_id"], r["component_id"])
                    for r in migrated
                    .select("image_id", "component_id").collect()}
    assert served_after == served_before and len(served_after) == 120

    # the migrated warehouse is still appendable (modulus follows metadata)
    assert DedupPipeline(spark, cfg).run_incremental(
        images.limit(0)).count() == 120
