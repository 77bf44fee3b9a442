"""spark-submit entry point for the dedup pipeline (north_rule: runs via
``spark-submit --py-files`` on a multi-executor cluster).

Usage:
  spark-submit [--master local[N]] jobs/run_pipeline.py \
      --n-images 1000 --warehouse /tmp/dedup_wh [--resume] \
      [--report /tmp/report.json]

  # incremental append (dupers `up`): probe + append a batch against a
  # COMPLETED warehouse — the corpus is never re-read or re-signatured
  spark-submit jobs/run_pipeline.py --append --images-path batch.parquet \
      --warehouse /tmp/dedup_wh

Reads nothing outside the warehouse; the input table is the deterministic
synthetic images table (swap --images-path for a real Iceberg/parquet table).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=1000)
    ap.add_argument("--images-path", default=None,
                    help="parquet path of an images table; default: synthesize")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing stage checkpoints")
    ap.add_argument("--append", action="store_true",
                    help="incremental append: probe the batch against the "
                         "completed warehouse's index stages and append "
                         "(dupers `up`); requires a prior full run with "
                         "the same config")
    ap.add_argument("--report", default=None, help="write a JSON run report here")
    ap.add_argument("--no-fast", action="store_true",
                    help="decode payloads and recompute perceptual features "
                         "(dupers 'normal mode'); default trusts stored phash "
                         "(dupers -fast)")
    ap.add_argument("--phash-radius", type=int, default=3)
    ap.add_argument("--lsh-threshold", type=float, default=0.5)
    ap.add_argument("--psnr-sample", type=float, default=0.05)
    args = ap.parse_args()
    if args.append:
        if args.fresh:
            ap.error("--append and --fresh are mutually exclusive")
        if not args.images_path:
            # the default synthetic corpus regenerates the SAME ids the
            # original run indexed — appending it onto itself would
            # silently duplicate every signature/rep/edge row
            ap.error("--append requires --images-path (a batch of NEW rows)")

    from dupers_spark.operators.minhash_lsh import LSHConfig
    from dupers_spark.plans.pipeline import DedupPipeline, PipelineConfig
    from dupers_spark.sources import datagen

    spark = SparkSession.builder.appName("dupers_spark_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.fresh and os.path.isdir(args.warehouse):
        import shutil

        shutil.rmtree(args.warehouse)

    t0 = time.time()
    if args.images_path:
        images = spark.read.parquet(args.images_path)
    else:
        images = datagen.make_images(spark, args.n_images)

    pipe = DedupPipeline(spark, PipelineConfig(
        warehouse=args.warehouse,
        lsh=LSHConfig(threshold=args.lsh_threshold),
        phash_radius=args.phash_radius,
        fast=not args.no_fast,
        psnr_sample=args.psnr_sample,
    ))
    if args.append:
        comps = pipe.run_incremental(images)
    else:
        comps = pipe.run(images)
    n_images = images.count()
    n_clusters = comps.select("component_id").distinct().count()
    n_clustered = comps.filter(F.col("component_id") != F.col("image_id")).count()
    elapsed = time.time() - t0

    report = {
        "images": n_images,
        "clusters": n_clusters,
        "non_singleton_members": n_clustered,
        "seconds": round(elapsed, 2),
        "images_per_sec": round(n_images / elapsed, 1),
        "stages": pipe.metrics,
    }
    print(json.dumps(report))
    if args.report:
        with open(args.report, "w") as fh:
            json.dump(report, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
