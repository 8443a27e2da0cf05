"""SparkSession construction.

Local sandbox runs on local[N] (single JVM); cluster runs are launched via
``spark-submit --py-files dedup.zip jobs/run_dedup.py`` (BASELINE.json:6).
All scale-relevant knobs (AQE, skew-join, shuffle partitions, Arrow) are set
here so every entry point gets the same execution profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DedupConfig, DEFAULT_CONFIG


def build_session(
    app_name: str = "final_deduplicator_spark",
    master: str | None = None,
    config: DedupConfig = DEFAULT_CONFIG,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the dedup pipeline.

    On a real cluster, omit ``master`` and let spark-submit supply it; the
    Iceberg catalog is configured via ``--packages org.apache.iceberg:
    iceberg-spark-runtime-*`` + ``spark.sql.catalog.*`` submit conf (no
    Iceberg jar in this sandbox — parquet fallback in io.py).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # AQE: runtime coalescing + skew-join splitting; band-key skew is
        # additionally handled explicitly (candidates.py bucket cap).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # CPU-bound pandas-UDF stages die when byte-based coalescing packs a
        # small-but-expensive dataset onto 1-2 cores: size partitions for
        # cores, not for 64/128 MB of bytes. At petabyte scale these would be
        # raised back toward defaults (bytes per task dominates there).
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_MAX_PART", "16m"))
        .config("spark.sql.shuffle.partitions", str(config.shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # shuffle/spill files on tmpfs: the sandbox block device has high
        # latency variance; on a real cluster leave this on local SSDs
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # footer-level count/min/max pushdown: stage row counts come from
        # parquet metadata instead of data scans
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # PySpark 4's DataFrame-debugging origin capture wraps EVERY Python
        # DataFrame/Column API call with a conf lookup + PySparkCurrentOrigin
        # set/clear — three extra py4j round trips plus a Python stack walk
        # per call. A micro-batch merge is plan-construction-bound (measured:
        # ~14.5k py4j round trips per micro-batch, ~46s of an 8-batch drain's
        # 54s inside py4j socket reads), so this instrumentation is pure
        # driver fixed cost; disabling it only drops the Python call-site
        # line from error messages.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER_SET"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
