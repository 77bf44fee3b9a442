"""DedupPipeline: end-to-end, resume, config invalidation, normal mode."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dupers_spark.plans.pipeline import DedupPipeline, PipelineConfig
from dupers_spark.sources import datagen

N = 120


@pytest.fixture(scope="module")
def images(spark):
    df = datagen.make_images(spark, N).cache()
    df.count()
    return df


def _expected_cluster_count(n):
    # per full group of 10: {r0..r4, r6} cluster; one global flood; singletons
    # (r7, r8, r9 — the zero-byte row i=7 is indexed under sha256('') and is
    # the only empty payload, so it stays a singleton)
    groups = n // 10
    singletons = 3 * groups
    return groups + 1 + singletons


def test_fast_pipeline_and_resume(spark, images):
    with tempfile.TemporaryDirectory() as td:
        cfg = PipelineConfig(warehouse=os.path.join(td, "wh"))
        p1 = DedupPipeline(spark, cfg)
        comps = p1.run(images)
        assert comps.count() == N
        n_clusters = comps.select("component_id").distinct().count()
        assert n_clusters == _expected_cluster_count(N)
        assert not any(m.get("resumed") for m in p1.metrics)

        p2 = DedupPipeline(spark, cfg)
        comps2 = p2.run(images)
        resumed = [m for m in p2.metrics if m.get("resumed")]
        assert len(resumed) >= 4  # every stage skipped
        assert comps2.count() == N

        # changed config → full rebuild, no stale reuse
        cfg3 = PipelineConfig(warehouse=os.path.join(td, "wh"), phash_radius=4)
        p3 = DedupPipeline(spark, cfg3)
        p3.run(images)
        assert not any(m.get("resumed") for m in p3.metrics)


def test_normal_mode_decodes_and_verifies(spark, images):
    with tempfile.TemporaryDirectory() as td:
        cfg = PipelineConfig(warehouse=os.path.join(td, "wh"), fast=False,
                             psnr_sample=1.0)
        p = DedupPipeline(spark, cfg)
        comps = p.run(images)
        assert comps.count() == N
        stages = {m["stage"] for m in p.metrics}
        assert "features" in stages and "invariants" in stages
        inv = spark.read.parquet(os.path.join(td, "wh", "invariants"))
        rows = inv.collect()
        assert rows
        for r in rows:
            assert r["pixels_comparable"]
            assert r["psnr_db"] >= 40.0
            assert r["caption_equal"]

        # normal mode must produce the same clustering as fast mode here
        # (stored phash == recomputed phash for this corpus)
        cfg_fast = PipelineConfig(warehouse=os.path.join(td, "wh_fast"))
        fast_comps = DedupPipeline(spark, cfg_fast).run(images)
        a = {(r["image_id"], r["component_id"]) for r in comps.collect()}
        b = {(r["image_id"], r["component_id"]) for r in fast_comps.collect()}
        assert a == b


def test_metrics_and_lineage_tables_written(spark, images):
    with tempfile.TemporaryDirectory() as td:
        cfg = PipelineConfig(warehouse=os.path.join(td, "wh"))
        p = DedupPipeline(spark, cfg)
        p.run(images)
        m = spark.read.parquet(os.path.join(td, "wh", "metrics"))
        assert {"stage", "rows", "seconds", "resumed"} <= set(m.columns)
        assert m.count() >= 4
        lin = spark.read.parquet(os.path.join(td, "wh", "lineage"))
        rows = {r["stage"]: r for r in lin.collect()}
        assert {"signatures", "exact_edges", "components"} <= set(rows)
        for r in rows.values():
            assert r["config_hash"] == cfg.config_hash()
            assert r["input_fp"] == p._input_fp
            assert r["rows"] >= 0


def test_fingerprint_full_detects_samelength_byte_edit(spark, images):
    """A same-length byte edit that preserves caption AND phash escapes the
    default "fast" fingerprint (documented tradeoff: it hashes
    length(bytes), not content) but must force a rebuild under
    fingerprint="full"."""
    some_id = images.select("image_id").orderBy("image_id").limit(1).collect()[0][0]
    # rotate the payload one byte: same length, same caption, same phash col
    edited = images.withColumn(
        "bytes",
        F.when(
            F.col("image_id") == some_id,
            F.concat(F.expr("substring(bytes, 2)"),
                     F.expr("substring(bytes, 1, 1)")),
        ).otherwise(F.col("bytes")),
    )
    with tempfile.TemporaryDirectory() as td:
        cfg_fast = PipelineConfig(warehouse=os.path.join(td, "wh_fastfp"))
        DedupPipeline(spark, cfg_fast).run(images)
        p2 = DedupPipeline(spark, cfg_fast)
        p2.run(edited)
        assert any(m.get("resumed") for m in p2.metrics)  # the documented gap

        cfg_full = PipelineConfig(warehouse=os.path.join(td, "wh_fullfp"),
                                  fingerprint="full")
        DedupPipeline(spark, cfg_full).run(images)
        p4 = DedupPipeline(spark, cfg_full)
        p4.run(edited)
        assert not any(m.get("resumed") for m in p4.metrics)  # rebuilt
        # and an unchanged rerun still resumes under "full"
        p5 = DedupPipeline(spark, cfg_full)
        p5.run(edited)
        assert any(m.get("resumed") for m in p5.metrics)


def test_compact_heals_crashed_swap(spark):
    """compact_stage after a crash inside a previous swap's rename window
    (stage dir missing, .old backup present) must restore the backup and
    proceed instead of failing on the missing directory."""
    from dupers_spark.plans.pipeline import compact_stage

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "stage")
        spark.range(100).repartition(8).write.parquet(path)
        os.rename(path, path + ".old")
        res = compact_stage(spark, path, target_file_bytes=10 ** 9)
        assert res["rows"] == 100
        assert res["files_after"] == 1
        assert not os.path.exists(path + ".old")


def test_compact_preserves_partition_layout(spark, tmp_path):
    """Compacting a partitioned stage (the bucket indexes, which accrete
    ~1 file per touched partition per append) must keep the partition
    directories — losing them would silently kill every probe's partition
    pruning — while cutting the file count."""
    import glob

    from pyspark.sql import functions as F

    from dupers_spark.plans.pipeline import compact_stage

    path = str(tmp_path / "stage")
    df = spark.range(2000).select(
        "id", (F.col("id") % 8).cast("int").alias("kb"))
    # two appends → 2 files per kb partition
    for _ in range(2):
        df.repartition("kb").write.mode("append").partitionBy("kb") \
            .parquet(path)
    before = len(glob.glob(path + "/**/*.parquet", recursive=True))
    res = compact_stage(spark, path)
    assert res["rows"] == 4000
    assert res["files_after"] < before
    kb_dirs = {d for d in glob.glob(path + "/kb=*")}
    assert len(kb_dirs) == 8  # layout intact
    out = spark.read.parquet(path)
    assert out.count() == 4000 and "kb" in out.columns


def test_run_incremental_matches_full_rebuild(spark, images):
    """Pipeline-level append (`dupers up` on new files only): full run over
    the even half, run_incremental with the odd half — the final
    components must equal a full rebuild over everything (exact copies,
    caption chains, the flood and phash near-dups all straddle the parity
    split), the index/edge stages must be appended rather than rebuilt,
    and a config mismatch must refuse."""
    import pytest

    parity = F.substring("image_id", -1, 1).cast("int") % 2
    old = images.filter(parity == 0)
    new = images.filter(parity == 1)
    with tempfile.TemporaryDirectory() as td:
        cfg = PipelineConfig(warehouse=os.path.join(td, "wh"))
        DedupPipeline(spark, cfg).run(old)
        p2 = DedupPipeline(spark, cfg)
        comps_inc = p2.run_incremental(new)
        got = {(r["image_id"], r["component_id"])
               for r in comps_inc.collect()}
        stages = {m["stage"] for m in p2.metrics}
        assert {"inc_signatures", "inc_exact_edges", "inc_lsh_edges",
                "inc_phash_edges", "inc_components_contracted",
                "inc_components_delta"} <= stages

        cfg_full = PipelineConfig(warehouse=os.path.join(td, "wh_full"))
        comps_full = DedupPipeline(spark, cfg_full).run(images)
        want = {(r["image_id"], r["component_id"])
                for r in comps_full.collect()}
        assert got == want

        # appended, not rebuilt: signatures stage now covers the whole set
        assert spark.read.parquet(
            os.path.join(td, "wh", "signatures")).count() == N
        # edge stages contain both halves' edges
        full_exact = spark.read.parquet(
            os.path.join(td, "wh_full", "exact_edges")).count()
        inc_exact = spark.read.parquet(
            os.path.join(td, "wh", "exact_edges")).count()
        assert inc_exact == full_exact  # same digest groups either way

        # every append is auditable: lineage carries one '<stage>+append'
        # record per appended stage, stamped with the post-append identity
        lin = {r["stage"]: r for r in spark.read.parquet(
            os.path.join(td, "wh", "lineage")).collect()}
        for st in ("signatures", "exact_edges", "lsh_sigs", "lsh_buckets",
                   "lsh_edges", "phash_reps", "phash_blocks", "phash_edges",
                   "components"):
            assert f"{st}+append" in lin, st
            assert lin[f"{st}+append"]["input_fp"].startswith("inc:")

        bad = DedupPipeline(spark, PipelineConfig(
            warehouse=os.path.join(td, "wh"), phash_radius=4))
        with pytest.raises(ValueError):
            bad.run_incremental(new)


def test_incremental_components_append_writes_o_batch_bytes(spark):
    """The scale gate on the assignment stage (round-6 verdict #1): an
    append must cost O(batch) write volume on the components stages — the
    round-6 cb-partition overwrite degenerated to a full corpus rewrite
    for any batch over a few hundred rows (a uniform id-hash batch touches
    all 64 partitions w.h.p.). The base+delta design makes the guarantee
    STRUCTURAL, verified here by file-inventory byte accounting on a batch
    big enough (500 of 4,000 rows) to hash into every cb partition:

      * the corpus-sized ``components`` base directory is byte-identical
        before vs after the append (name, mtime, size — never rewritten);
      * the bytes the append DID write (components_delta ∪
        components_relabel) are a small multiple of the batch's own
        serialized size, not of the corpus's.
    """
    import glob

    from dupers_spark.sources import datagen

    n, n_batch = 4000, 500
    images = datagen.make_images(spark, n).localCheckpoint()
    split = f"img_{n - n_batch:08d}"
    old = images.filter(F.col("image_id") < split)
    new = images.filter(F.col("image_id") >= split)
    with tempfile.TemporaryDirectory() as td:
        wh = os.path.join(td, "wh")
        cfg = PipelineConfig(warehouse=wh)
        DedupPipeline(spark, cfg).run(old)
        comp_dir = os.path.join(wh, "components")

        def inventory(path):
            return sorted(
                (os.path.relpath(f, path), os.path.getmtime(f),
                 os.path.getsize(f))
                for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                   recursive=True))

        def stage_bytes(path):
            return sum(s for _, _, s in inventory(path))

        before = inventory(comp_dir)
        base_bytes = stage_bytes(comp_dir)
        # batch hashes into (virtually) every cb partition — the regime
        # that defeated the overwrite design
        from dupers_spark.plans.pipeline import with_cb
        batch_cbs = with_cb(new.select("image_id")).select("cb") \
            .distinct().count()
        assert batch_cbs > 32

        p2 = DedupPipeline(spark, cfg)
        comps_inc = p2.run_incremental(new)

        # 1) base stage untouched, byte for byte
        assert inventory(comp_dir) == before
        # 2) the append's write volume is O(batch): delta+log bytes stay a
        # small multiple of the batch's per-row cost in the base stage
        written = stage_bytes(os.path.join(wh, "components_delta")) + \
            stage_bytes(os.path.join(wh, "components_relabel"))
        per_row = base_bytes / (n - n_batch)
        assert 0 < written < 20 * per_row * n_batch, (written, base_bytes)
        # 3) and the served assignment equals a full rebuild's
        got = {(r["image_id"], r["component_id"])
               for r in comps_inc.collect()}
        with tempfile.TemporaryDirectory() as td2:
            full = DedupPipeline(spark, PipelineConfig(
                warehouse=os.path.join(td2, "wh"))).run(images)
            want = {(r["image_id"], r["component_id"])
                    for r in full.collect()}
        assert got == want


def test_fingerprint_value_validated():
    with pytest.raises(ValueError, match="fingerprint"):
        PipelineConfig(warehouse="/tmp/x", fingerprint="Full")


def test_incremental_append_is_crash_and_race_evident(spark, images):
    """Appends are not idempotent, so the append window must be exclusive
    and crash-evident: a leftover/concurrent _INC_PENDING sentinel makes
    run_incremental refuse loudly (never a silent double-append), and a
    subsequent run() force-rebuilds — clearing the sentinel — even though
    the stale markers still match the pre-batch input."""
    parity = F.substring("image_id", -1, 1).cast("int") % 2
    old, new = images.filter(parity == 0), images.filter(parity == 1)
    with tempfile.TemporaryDirectory() as td:
        cfg = PipelineConfig(warehouse=os.path.join(td, "wh"))
        DedupPipeline(spark, cfg).run(old)

        p = DedupPipeline(spark, cfg)
        with open(p._pending(), "w") as fh:  # crashed / racing append
            fh.write("x")
        with pytest.raises(ValueError, match="partial or concurrent"):
            p.run_incremental(new)

        # run() with the same pre-batch input would normally resume every
        # stage — the sentinel must force a rebuild instead
        p2 = DedupPipeline(spark, cfg)
        p2.run(old)
        assert not any(m.get("resumed") for m in p2.metrics)
        assert not os.path.exists(p2._pending())

        # warehouse is consistent again: the append goes through and the
        # lock is dropped on success
        p3 = DedupPipeline(spark, cfg)
        comps = p3.run_incremental(new)
        assert comps.count() == N
        assert not os.path.exists(p3._pending())

        # lineage is an APPEND in incremental runs: the full-build records
        # written by the earlier run() (a different process in production)
        # must survive alongside the new '+append' audit rows
        lin_stages = {r["stage"] for r in spark.read.parquet(
            os.path.join(td, "wh", "lineage")).collect()}
        assert "signatures" in lin_stages
        assert "signatures+append" in lin_stages


def test_run_incremental_empty_batch_is_noop(spark, images):
    """An empty append batch must leave the assignment unchanged (and not
    crash any of the probe/append paths on zero rows)."""
    with tempfile.TemporaryDirectory() as td:
        cfg = PipelineConfig(warehouse=os.path.join(td, "wh"))
        before = {(r["image_id"], r["component_id"])
                  for r in DedupPipeline(spark, cfg).run(images).collect()}
        empty = images.filter(F.lit(False))
        after = {(r["image_id"], r["component_id"])
                 for r in DedupPipeline(spark, cfg).run_incremental(empty)
                 .collect()}
        assert after == before


def test_mixed_multimodal_pipeline_incremental_matches_rebuild(spark):
    """use_video/use_audio branches: one pipeline over images + sibling AVI
    and WAV corpora (FIXTURES.md §A conventions). Base = even ids of every
    modality, then a MIXED append batch — every modality's persisted token
    /signature/bucket stages must be probed and appended (never re-decoded
    or re-signatured), and the single cross-modality assignment must equal
    a full rebuild over everything (cross-batch media copies r1 straddle
    the split)."""
    import glob

    images = datagen.make_images(spark, 60).cache()
    videos = datagen.make_videos(spark, 40).cache()
    audio = datagen.make_audio(spark, 40).cache()
    for df in (images, videos, audio):
        df.count()
    par_i = F.substring("image_id", -1, 1).cast("int") % 2
    par_m = F.substring("media_id", -1, 1).cast("int") % 2
    with tempfile.TemporaryDirectory() as td:
        cfg = PipelineConfig(warehouse=os.path.join(td, "wh"),
                             use_video=True, use_audio=True, video_every_n=1)
        DedupPipeline(spark, cfg).run(
            images.filter(par_i == 0), videos.filter(par_m == 0),
            audio.filter(par_m == 0))
        tok_before = {f: os.path.getmtime(f) for f in glob.glob(
            os.path.join(td, "wh", "video_tokens", "*.parquet"))}
        p2 = DedupPipeline(spark, cfg)
        comps = p2.run_incremental(
            images.filter(par_i == 1), videos.filter(par_m == 1),
            audio.filter(par_m == 1))
        got = {(r["image_id"], r["component_id"]) for r in comps.collect()}

        cfg_full = PipelineConfig(warehouse=os.path.join(td, "wh_full"),
                                  use_video=True, use_audio=True,
                                  video_every_n=1)
        want = {(r["image_id"], r["component_id"]) for r in
                DedupPipeline(spark, cfg_full).run(images, videos, audio)
                .collect()}
        assert got == want and len(got) == 140

        # appended, never rebuilt: the base's token files are untouched
        for f, mt in tok_before.items():
            assert os.path.getmtime(f) == mt
        # the batch landed as APPENDS in every media stage family
        lin = {r["stage"] for r in spark.read.parquet(
            os.path.join(td, "wh", "lineage")).collect()}
        for st in ("video_tokens", "video_lsh_sigs", "video_lsh_buckets",
                   "video_lsh_edges", "audio_tokens", "audio_lsh_sigs",
                   "audio_lsh_buckets", "audio_lsh_edges"):
            assert f"{st}+append" in lin, st
        # media branches demand their corpora
        with pytest.raises(ValueError, match="needs a videos frame"):
            DedupPipeline(spark, cfg_full).run(images)
    for df in (images, videos, audio):
        df.unpersist()


def test_media_frame_without_flag_refuses(spark, tmp_path):
    """The flag/frame consistency check is two-way: a videos/audio frame
    passed to run() or run_incremental() while its use_* flag is off would
    silently drop a whole modality from the dedup output — the
    accounted-never-silent policy demands a loud refusal instead."""
    images = datagen.make_images(spark, 20)
    videos = datagen.make_videos(spark, 10)
    wh = str(tmp_path / "wh")
    cfg = PipelineConfig(warehouse=wh)  # use_video/use_audio default False
    with pytest.raises(ValueError, match="use_video=False"):
        DedupPipeline(spark, cfg).run(images, videos=videos)
    DedupPipeline(spark, cfg).run(images)
    with pytest.raises(ValueError, match="use_video=False"):
        DedupPipeline(spark, cfg).run_incremental(images.limit(0),
                                                  new_videos=videos)
    # the refusal happened before the append window opened
    assert not os.path.exists(os.path.join(wh, "_INC_PENDING"))
