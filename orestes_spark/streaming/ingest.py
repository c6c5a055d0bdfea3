"""Structured Streaming ingest: the write path (S1-S5, D2) as a
continuous pipeline.

The reference ingests via request-driven HTTP batches
(/root/reference/lib/orestes.js:69-80); readers see data once both the
point write and the metadata write land. Here the same contract is a
streaming query:

    file/kafka source → normalize/validate → foreachBatch:
        append valid points (bucket-partitioned, series-sorted)
        upsert new (bucket, series) metadata with anti-join dedup
        append rejected points to an errors sink (per-point error
        strings, never batch abort)

``foreachBatch`` gives exactly-once-per-epoch appends against the same
layout the batch engine uses, so every read-path operator works on
streamed data unchanged. The Bubo write-time series-dedup cache
(/root/reference/lib/orestes-inserter.js:98-116) becomes the anti-join
in OrestesEngine._append — per micro-batch, against the durable series
table, instead of an in-memory hash set: restart-safe and shared
across writers.

The reference has no event-time semantics (no watermarks/windows —
SURVEY.md §2.5); ``streaming_rollup`` adds them as new surface:
watermarked tumbling-window aggregation with documented late-data
behavior (append mode drops events later than the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from orestes_spark import schema, validation
from orestes_spark.engine import OrestesEngine

# Raw input contract for file sources: reference-style points with a
# flexible time column plus a tags map.
RAW_DDL = "time STRING, value DOUBLE, tags MAP<STRING,STRING>"


def canonicalize(raw: DataFrame) -> DataFrame:
    """Raw (time, value, tags) → canonical (time_ms, value, tags)."""
    return raw.select(
        schema.normalize_time_col(F.col("time")).alias("time_ms"),
        F.col("value").cast("double").alias("value"),
        F.col("tags"),
    )


def start_ingest(
    engine: OrestesEngine,
    source: DataFrame,
    space: str = "default",
    checkpoint: str | None = None,
    errors_path: str | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Run a streaming ingest into ``space``. ``source`` is any
    streaming DataFrame with (time, value, tags) — e.g.
    ``spark.readStream.schema(RAW_DDL).parquet(dir)`` or a mapped
    Kafka source."""

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        valid, errors = validation.split_valid(canonicalize(batch_df))
        if errors_path is not None:
            (
                errors.withColumn("epoch", F.lit(epoch_id))
                .write.mode("append")
                .parquet(errors_path)
            )
        engine._append(valid, space)

    writer = source.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_rollup(
    points: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    time_col: str = "ts",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Watermarked tumbling-window rollup over a streaming points
    frame: (window, *group_cols, n, sum_value). Late events beyond the
    watermark are dropped (append-mode semantics) — the late-data
    policy the reference never had to define."""
    return (
        points.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


def streaming_sessionize(
    points: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    time_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Event-time sessionization with ``session_window``: sessions close
    when no event arrives within ``gap``; late events beyond the
    watermark are dropped. Output: (session_window, *key_cols, n_events,
    sum_value) — the streaming twin of the batch lag+cumsum
    sessionization query."""
    return (
        points.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
