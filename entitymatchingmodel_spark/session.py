"""SparkSession factory with scale-appropriate defaults.

Unlike the reference (emm/parameters.py:104-123), which force-disables AQE to
keep grouped-pandas partitioning stable, this engine keeps AQE **on**: every
per-group computation is expressed as a window function or groupBy, so Spark is
free to coalesce/split shuffle partitions and handle skew at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "entitymatchingmodel_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale posture: on a real cluster these settings are inherited from
    spark-submit; locally we default to all cores and a matching shuffle
    partition count so small benchmarks don't drown in task overhead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas_udf / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # 100 TB posture: bigger broadcast ceiling (dim tables, GT vocab maps);
        # AQE converts eligible shuffle joins to broadcast at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # local[N] runs every executor thread inside the driver JVM: N
        # concurrent task slots' execution memory plus all persisted blocks
        # share this one heap.  8g measurably GC-thrashes a 32-slot bench
        # (2-3x wall-clock inflation on later queries); on a real cluster
        # this is spark.executor.memory territory (reference recommends 30g,
        # emm/parameters.py:113).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
        # Even with the UI off, the status listeners retain per-execution /
        # per-stage state (defaults: 1000 executions, 1000 stages); a
        # long-lived session running hundreds of queries drags every job
        # submission through that backlog — iterative operators that
        # launch ~40 tiny jobs per call (clustering loops) amplify it.
        # Tight retention keeps deep-session scheduling cost flat.
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "400")
        .config("spark.ui.retainedTasks", "10000")
        .config("spark.ui.retainedDeadExecutors", "10")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def write_meta_json(spark: SparkSession, path: str, payload: str) -> None:
    """Write a 1-row ``meta string`` JSON side-file via a ``range(1)``
    projection instead of ``createDataFrame([...])``: the LocalRelation /
    parallelize write path stalls ~4s PER WRITE in local mode (measured
    r8: 4.3-5.8s vs 0.14s for the identical bytes), which dominated every
    model ``save()``.  Scheme-agnostic like the rest of the persistence
    layer (plain DataFrame write)."""
    from pyspark.sql import functions as F

    (
        spark.range(1)
        .select(F.lit(payload).alias("meta"))
        .coalesce(1)
        .write.mode("overwrite")
        .json(path)
    )
