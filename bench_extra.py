"""Supplementary benchmarks — NOT part of the frozen driver bench contract
(bench.py is measurement-frozen; this file exists so optimization evidence
can be reproduced without touching it). Three sections:

  1. noop-isolated stage timings (guide §1.4): each expensive sub-stage of
     the headline dedup pipeline is timed against the no-op sink, so the
     numbers measure computation, not sinks or downstream consumers.
  2. decode-path isolation: the normal-mode image_features stage alone —
     the round-7 average_phash vectorization's before/after lives here.
  3. pipeline-level append (round-6 verdict #7): run_incremental of a 1%
     batch against a prebuilt warehouse, timed end-to-end with the same
     /proc/stat load evidence as bench.py, plus per-phase rows/seconds
     from the pipeline's own metrics.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from dupers_spark.operators import exact, minhash_lsh as ml, simhash as sh  # noqa: E402
from dupers_spark.operators.components import connected_components  # noqa: E402
from dupers_spark.plans.dedup_job import dedup_edges_concurrent  # noqa: E402
from dupers_spark.plans.pipeline import DedupPipeline, PipelineConfig  # noqa: E402
from dupers_spark.session import build_session  # noqa: E402
from dupers_spark.sources import datagen  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "400000"))


def _cpu_snap() -> list[int]:
    return list(map(int, open("/proc/stat").readline().split()[1:9]))


def main() -> None:
    spark = build_session("dupers_bench_extra", cores=CPUS,
                          shuffle_partitions=max(CPUS, 8))
    sc = spark.sparkContext
    out: dict = {}
    load: dict = {}

    def timed(name: str, fn) -> float:
        sc.setJobDescription(name)
        c0, t0 = _cpu_snap(), time.time()
        fn()
        dt = time.time() - t0
        d = [b - a for a, b in zip(c0, _cpu_snap())]
        out[name] = round(dt, 3)
        load[name] = {"busy_core_s": round((d[0] + d[2]) / 100.0, 1),
                      "steal_pct": round(100 * d[7] / max(1, sum(d)), 1)}
        sc.setJobDescription(None)
        return dt

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    img_path = (f"/tmp/dupers_bench_images_v{datagen.FIXTURE_VERSION}_{N_IMAGES}.parquet")
    if not os.path.exists(img_path):
        datagen.make_images(spark, N_IMAGES).write.mode("overwrite") \
            .parquet(img_path)
    images = spark.read.parquet(img_path)

    # warm the kernels outside every clock (bench.py does the same)
    warm = images.limit(2000).localCheckpoint()
    connected_components(dedup_edges_concurrent(warm, recompute_phash=True)) \
        .select("component_id").distinct().count()

    # ---- 1. noop-isolated stages of the -fast headline -------------------
    caps = images.select("image_id", "caption")
    timed("stage_exact_sha256_edges",
          lambda: noop(exact.dup_edges(exact.signatures(images))))
    par = sc.defaultParallelism * 2
    grouped = ml.collapse_groups(caps).repartition(par)
    timed("stage_lsh_collapse", lambda: noop(grouped))
    sigs = ml.signatures(grouped.select("rep_id", "caption")).localCheckpoint()
    timed("stage_lsh_signatures_kernel_ckpt",
          lambda: noop(ml.signatures(grouped.select("rep_id", "caption"))))
    timed("stage_lsh_band_pairs", lambda: noop(
        ml.candidate_pairs(ml.band_buckets(sigs))[0]))
    pairs = ml.candidate_pairs(ml.band_buckets(sigs))[0].localCheckpoint()
    timed("stage_lsh_verify", lambda: noop(ml.verify_pairs(pairs, sigs)))
    feats = images.select("image_id", "phash").filter(F.col("phash").isNotNull())
    timed("stage_phash_engine",
          lambda: noop(sh.phash_near_dup_edges(feats, 3)[0]))
    edges = dedup_edges_concurrent(images, recompute_phash=False)
    edges_ck = edges.localCheckpoint()
    timed("stage_connected_components",
          lambda: connected_components(edges_ck)
          .select("component_id").distinct().count())

    # ---- 2. decode-path isolation (normal mode's delta) ------------------
    from dupers_spark.operators import multimodal as mm

    timed("stage_image_features_decode",
          lambda: noop(mm.image_features(images)))

    # ---- 3. pipeline-level append: 1% batch on a full warehouse ----------
    wh = f"/tmp/dupers_bench_extra_wh_{N_IMAGES}"
    shutil.rmtree(wh, ignore_errors=True)
    os.makedirs(wh, exist_ok=True)
    n_batch = max(N_IMAGES // 100, 1000)
    base = images.filter(~F.col("image_id").isin(
        [f"img_{i:08d}" for i in range(n_batch)]))
    batch = images.filter(F.col("image_id").isin(
        [f"img_{i:08d}" for i in range(n_batch)])).localCheckpoint()
    cfg = PipelineConfig(warehouse=wh)
    DedupPipeline(spark, cfg).run(base)  # warehouse build OUTSIDE the clock
    pipe = DedupPipeline(spark, cfg)
    timed("pipeline_append_1pct", lambda: pipe.run_incremental(batch))
    out["pipeline_append_rows"] = n_batch
    out["pipeline_append_rows_per_sec"] = round(
        n_batch / out["pipeline_append_1pct"], 1)
    out["pipeline_append_phases"] = {
        m["stage"]: {"rows": m["rows"], "seconds": m["seconds"]}
        for m in pipe.metrics}

    print(json.dumps({"metric": "bench_extra", "n_images": N_IMAGES,
                      "queries": out, "load": load}))
    spark.stop()


if __name__ == "__main__":
    main()
