"""SparkSession factory tuned for this engine.

Mirrors the reference's single `SessionContext` entry point
(/root/reference/record_matching/context.py:110-168) but with Spark-native
knobs: AQE (runtime re-planning + skew-join splitting), Arrow transfer for
the pandas-UDF scoring path, and shuffle partitioning sized to the runtime
rather than the 200-partition default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "record_matching_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    On a real cluster these settings arrive via spark-submit; locally we
    default to local[$SPARK_GRAFT_CPUS].
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    mem = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")

    # shuffle/spill scratch: prefer tmpfs when present — local-mode shuffles
    # otherwise bottleneck on the (often virtualized, noisy) block device.
    # On a real cluster this comes from spark-submit / node config instead.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark_local"

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", mem)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # master() only applies when we are actually creating the session; under
    # spark-submit the cluster master wins (getOrCreate returns the active one).
    builder = builder.master(master)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
