"""File-format adapters for point ingest: JSON lines and CSV → the
canonical (time_ms, value, tags) shape the engine writes.

The reference ingests JSON arrays over HTTP; a Spark-native engine
additionally reads point files directly (batch or readStream with the
same schemas). JSON carries the dynamic tag map natively; CSV (flat by
nature) treats every non-time/value column as a tag via
``points_from_wide``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from orestes_spark import schema

JSON_POINTS_DDL = "time STRING, value DOUBLE, tags MAP<STRING,STRING>"


def read_points_json(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """JSON-lines point files: {"time": ..., "value": ..., "tags": {...}}.
    Returns the canonical frame; invalid rows surface as NULL time_ms
    for the validation split (never a parse abort)."""
    reader = spark.readStream if streaming else spark.read
    raw = reader.schema(JSON_POINTS_DDL).json(path)
    from pyspark.sql import functions as F

    return raw.select(
        schema.normalize_time_col(F.col("time")).alias("time_ms"),
        F.col("value").cast("double").alias("value"),
        F.coalesce(F.col("tags"), F.create_map()).alias("tags"),
    )


def read_points_orc(
    spark: SparkSession,
    path: str,
    time_col: str = "time",
    value_col: str = "value",
    streaming: bool = False,
) -> DataFrame:
    """ORC point files (columnar twin of the parquet layout): either
    the canonical shape (tags MAP present) or a wide/flat shape where
    every extra column becomes a tag. The schema comes from the ORC
    footer; for streams (which require an explicit schema) it is
    probed once from the existing files at start."""
    if streaming:
        raw = spark.readStream.schema(spark.read.orc(path).schema).orc(path)
    else:
        raw = spark.read.orc(path)
    if "tags" in raw.columns:
        from pyspark.sql import functions as F

        return raw.select(
            schema.normalize_time_col(F.col(time_col)).alias("time_ms"),
            F.col(value_col).cast("double").alias("value"),
            F.coalesce(F.col("tags"), F.create_map()).alias("tags"),
        )
    return schema.points_from_wide(raw, time_col, value_col)


def read_points_csv(
    spark: SparkSession,
    path: str,
    time_col: str = "time",
    value_col: str = "value",
    streaming: bool = False,
    schema_ddl: str | None = None,
) -> DataFrame:
    """CSV point files with a header: time/value plus one column per
    tag. Streaming reads require ``schema_ddl`` (no inference on
    streams)."""
    reader = spark.readStream if streaming else spark.read
    opts = {"header": "true"}
    if schema_ddl is not None:
        raw = reader.options(**opts).schema(schema_ddl).csv(path)
    elif streaming:
        raise ValueError("streaming CSV requires schema_ddl")
    else:
        raw = reader.options(**opts, inferSchema="false").csv(path)
    return schema.points_from_wide(raw, time_col, value_col)
