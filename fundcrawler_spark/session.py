"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]``; the same settings are what we
would submit with ``spark-submit --py-files dist/fundcrawler_spark.zip``
on a real cluster (shuffle partitions are then sized to 2-3x total cores
and ``spark.sql.files.maxPartitionBytes`` left at 128m so a 100 TB scan
splits into ~800k tasks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "fundcrawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    AQE is on: at cluster scale it coalesces small shuffle partitions and
    splits skewed ones (the single-host eastmoney skew case); Arrow is on
    for every pandas-UDF kernel boundary.
    """
    cores = cores or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # scan split size, parameterised (SPARK_GRAFT_MAX_PARTITION_BYTES).
        # Local default 16m: the testdata tables are single parquet files
        # under the stock 128m, so a 128m split serialises every scan
        # stage onto ONE task (r7 measurement: the lineitem scan+project
        # feeding retry_priority_admission ran 1-task; 16m opens it to
        # the file's row-group count). On a real cluster set 128m-512m
        # (guide §6.1: large sequential scans want fewer, bigger splits;
        # a 100 TB scan at 128m is ~800k tasks).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        # e.g. /dev/shm/spark-local: tmpfs shuffle for bench runs where
        # the sandbox's shared disk would otherwise cap scaling
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
