"""SparkSession construction tuned for the dedup workload.

Local-mode testing uses ``local[N]`` threads; the same config block is what
we would pass to ``spark-submit`` on a real cluster (AQE, skew-join handling,
Arrow batching for binary image payloads).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "dupers_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    cores: local[N] thread count; default $SPARK_GRAFT_CPUS or all cores.
    shuffle_partitions: default = cores (local mode has no network shuffle;
    at cluster scale this would be sized to ~128 MB per shuffle partition).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    # Spark owns core-level parallelism (one Python worker per task slot);
    # letting each worker's BLAS spin up its own threads oversubscribes the
    # box ~2× on the matmul-heavy ANN kernels (measured: 1M×512 brute-force
    # top-k more stable and ≥15% faster with nested BLAS threading off).
    # Must be set before the JVM forks so the python workers inherit it.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 64MB coalesces post-shuffle stages to ~16 tasks at our
        # scales — too coarse for 32 cores; 8MB keeps reduce-side
        # parallelism while still batching small shuffles
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds Python-worker memory (batch × row size)
        # AND sets the per-batch overhead floor for skinny-row stages like
        # LSH pair-gen (59M rows / batch size × ~10 ms). 16384 ≈ 10 MB for
        # our payloads; drop toward 1-2k when individual rows reach ~1 MB.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "16384"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # shuffle/spill files: the sandbox disk is a single-queue virtio
        # device whose bandwidth does not scale with cores — tmpfs keeps
        # shuffle I/O off the serial path (126 GB available). On a real
        # cluster this is per-executor local SSD instead.
        .config("spark.local.dir",
                os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
