"""Cluster-side Iceberg smoke test for the StageStore shim.

This sandbox ships no Iceberg jars, so ``sources/storage.py``'s Iceberg
branch can never execute locally — the parquet fallback is what every local
test exercises. On a real cluster, run this once to prove the Iceberg path
end-to-end (write → read → overwrite → partitioned write → drop):

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=/tmp/iceberg_smoke_wh \\
      --py-files dupers_spark.zip \\
      jobs/iceberg_smoke.py --catalog lake

Without jars (this sandbox) the probe falls back to parquet and the same
five operations run against a parquet warehouse — so the script doubles as
a fallback smoke. Prints ONE JSON line:

    {"mode": "iceberg"|"parquet", "rows": 10, "rows_after_overwrite": 3,
     "partitions": ["bucket=b0", "bucket=b1"], "dropped": true}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

# direct `python jobs/iceberg_smoke.py` runs without --py-files: make the
# repo root importable (same bootstrap as run_pipeline.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", default="spark_catalog")
    ap.add_argument("--namespace", default="dupers_smoke")
    ap.add_argument("--warehouse", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from dupers_spark.sources.storage import StageStore

    spark = SparkSession.builder.appName("iceberg_smoke").getOrCreate()
    warehouse = args.warehouse or tempfile.mkdtemp(prefix="iceberg_smoke_")
    store = StageStore(spark, warehouse, catalog=args.catalog,
                       namespace=args.namespace)
    if store.use_iceberg:
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS "
                  f"{args.catalog}.{args.namespace}")

    df = spark.range(10).selectExpr("id", "concat('b', id % 2) AS bucket")
    store.write("smoke", df)
    rows = store.read("smoke").count()
    store.write("smoke", df.limit(3))  # overwrite = snapshot/dir swap
    rows2 = store.read("smoke").count()
    store.write("smoke_p", df, partition_by=["bucket"])
    parts = sorted(
        r[0] for r in store.read("smoke_p")
        .select("bucket").distinct().collect()
    )
    store.drop("smoke")
    store.drop("smoke_p")
    dropped = not store.exists("smoke") and not store.exists("smoke_p")
    print(json.dumps({
        "mode": "iceberg" if store.use_iceberg else "parquet",
        "rows": rows,
        "rows_after_overwrite": rows2,
        "partitions": parts,
        "dropped": dropped,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
