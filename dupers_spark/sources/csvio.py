"""CSV export/import with dupers' interchange contract.

Reference format (pkg/database/csv/csv.go:28, pkg/database/io.go:88-123):
  header  ``sha256_sum,path#<bucket-abs-path>``
  rows    ``<64-hex-digest>,<relative path>``

Export strips the bucket prefix from ids (io.go:115 TrimPrefix); import
validates the header, restores absolute ids, and rejects rows whose digest
is not 64 hex chars (csv.go:79-91 checksum validation). Batched writes
(io.go:191, 50 000 rows/tx) are inherent to Spark's per-partition writers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

HEADER_LHS = "sha256_sum"
HEADER_RHS_PREFIX = "path#"


def csv_export(sigs: DataFrame, bucket: str, path: str) -> None:
    """Write one bucket's signatures as a dupers-format CSV directory.

    sigs: (image_id, bucket, sha256-hex). ids are treated as
    '<bucket>/<relative>' paths; the bucket prefix is stripped like
    TrimPrefix does.
    """
    # literal prefix strip (reference uses strings.TrimPrefix, io.go:115) —
    # a regex here would misfire on buckets containing metacharacters
    rel = F.when(
        F.col("image_id").startswith(bucket + "/"),
        F.expr(f"substring(image_id, {len(bucket) + 2})"),
    ).otherwise(F.col("image_id"))
    out = (
        sigs.filter(F.col("bucket") == bucket)
        .select(
            F.col("sha256").alias(HEADER_LHS),
            rel.alias(HEADER_RHS_PREFIX + bucket),
        )
        .orderBy(HEADER_LHS)
    )
    out.write.mode("overwrite").option("header", True).csv(path)


def csv_import(spark: SparkSession, path: str) -> tuple[DataFrame, str]:
    """Read a dupers-format CSV back into (image_id, bucket, sha256).

    Returns (df, bucket). Raises ValueError on a malformed header
    (csv.go:96-112 checkHeader) ; malformed digests are dropped with the
    same 64-hex rule the reference enforces.
    """
    raw = spark.read.option("header", False).csv(path)
    header = raw.limit(1).collect()[0]
    lhs, rhs = header[0], header[1]
    if lhs != HEADER_LHS or rhs is None or not rhs.startswith(HEADER_RHS_PREFIX):
        raise ValueError(f"invalid dupers CSV header: {lhs!r},{rhs!r}")
    bucket = rhs[len(HEADER_RHS_PREFIX):]

    # rename positionally before any select: the rhs header embeds the
    # bucket path, which may contain characters the column resolver would
    # parse as syntax (dots, parens)
    df = spark.read.option("header", True).csv(path).toDF("sha256", "rel")
    out = (
        df.select("sha256", "rel")
        .filter(F.col("sha256").rlike("^[0-9a-fA-F]{64}$"))
        .select(
            # genuine dupers CSVs keep a leading '/' on rel paths — trim it
            # so restored ids are 'bucket/rel', never 'bucket//rel'
            F.concat(
                F.lit(bucket + "/"), F.regexp_replace(F.col("rel"), "^/", "")
            ).alias("image_id"),
            F.lit(bucket).alias("bucket"),
            F.lower(F.col("sha256")).alias("sha256"),
        )
    )
    return out, bucket


def mv_bucket(sigs: DataFrame, old: str, new: str) -> DataFrame:
    """`dupers mv`: rename a bucket (database.go:693-716) — pure projection;
    on Iceberg this is a partition overwrite."""
    return sigs.withColumn(
        "bucket",
        F.when(F.col("bucket") == old, F.lit(new)).otherwise(F.col("bucket")),
    ).withColumn(
        "image_id",
        F.when(
            F.col("image_id").startswith(old + "/"),
            F.concat(F.lit(new), F.expr(f"substring(image_id, {len(old) + 1})")),
        ).otherwise(F.col("image_id")),
    )


def rm_bucket(sigs: DataFrame, bucket: str) -> DataFrame:
    """`dupers rm`: drop a bucket (database.go:719-729) — partition delete."""
    return sigs.filter(F.col("bucket") != bucket)


def backup(sigs: DataFrame, path: str) -> None:
    """`dupers backup` (io.go:40-55): full copy; Iceberg snapshots subsume
    this — parquet fallback writes a timestampless full dump."""
    sigs.write.mode("overwrite").parquet(os.path.join(path, "backup"))
