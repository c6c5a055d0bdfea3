"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same config block is what we would
ship to a 1000-executor cluster (AQE on, adaptive coalescing, skew-join
handling, Arrow for the few pandas exchanges).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "orestes_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to the number of local cores — right
    for local mode; on a real cluster it should be ~2-3x total cores or
    left to AQE's coalescing (which is enabled here).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Parameterised for A/B (round-12 opt): "false" coalesces
        # post-shuffle partitions to the advisory size (64 MB) instead
        # of the default parallelism. MEASURED WORSE here — 12-query
        # CPU-bound subset 28.1/30.3 s (true) vs 35.5/35.6 s (false),
        # two runs each: at sub-64MB data volumes advisory-size
        # coalescing serializes compute-heavy post-shuffle stages onto
        # one core. At 100 TB partitions exceed the advisory target
        # and the two modes converge, so the default keeps both
        # regimes right; the knob stays for cluster-profile A/Bs.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Wider broadcast window: dimension/array side tables up to
        # 64 MB go map-side instead of shuffling the fact side (the
        # driver has plenty of headroom; at cluster scale this is a
        # per-executor memory call, still cheap at 64 MB).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Driver testdata stores events.ts as TIMESTAMP(NANOS), which
        # Spark refuses by default; read it as LONG nanoseconds and let
        # sources.testdata convert (micros precision, matching DuckDB).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive parquet timestamps (no tz metadata) read as LTZ UTC
        # instants, not TIMESTAMP_NTZ — unix_millis() rejects NTZ and the
        # DuckDB oracle treats the same stored int64 as a UTC epoch.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
