"""Bucketed co-located joins: the shuffle-elimination tool for
repeated fact⋈fact joins.

A join between two big tables shuffles BOTH sides on the key every
time it runs. When the same join key is hit repeatedly (orders ⋈
lineitem in every report; points ⋈ series in every grouped read),
pre-bucketing both tables on that key pays the shuffle once at write
time: `bucketBy(n, key)` hash-clusters rows into n files per table so
Spark's planner sees matching `HashPartitioning(key, n)` output
partitioning on both scans and plans a SortMergeJoin with ZERO
Exchange nodes. At 100 TB that converts every downstream join of the
pair from a full-network shuffle into node-local stitching.

Requirements Spark imposes (and this module encodes):
  - bucketed tables must be saved via ``saveAsTable`` (the bucket
    metadata lives in the catalog, not the parquet files);
  - both sides must have the same bucket count (or a divisor, with
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
  - the join key must equal the bucket key prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.
    Sorting within buckets lets the SortMergeJoin skip its sort step
    too (plan shows neither Exchange nor Sort)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two pre-bucketed catalog tables on their bucket key —
    plans with no Exchange when both were saved via save_bucketed
    with the same bucket count."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)
