"""Input-parallelism guard for CPU-heavy per-row kernels.

A parquet file is splittable only at row-group boundaries: a corpus
delivered as few files with one big row group each scans as few tasks
no matter how many cores the cluster has, and an expression-heavy
kernel (shingling, hashing, signatures) then runs effectively serial.
``ensure_min_parallelism`` repartitions ONLY in that degenerate case —
when the input already carries at least the cluster's default
parallelism (the normal state for a 100 TB corpus in thousands of
files), it is a strict no-op, so well-partitioned pipelines never pay
the extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_partitions`` (default:
    the cluster's defaultParallelism) when — and only when — its plan
    currently yields fewer partitions.

    Intended for scan-stage inputs (that is where row-group packing can
    starve parallelism): the partition probe is free on a shuffle-less
    plan. On a plan that already contains exchanges, ``df.rdd`` may
    materialize upstream stages under AQE — apply this helper before
    shuffling operators, not after."""
    if df.isStreaming:
        # df.rdd raises on streaming DataFrames, and micro-batch
        # parallelism is the source's concern — the batch-only guard
        # must not break operators (simhash, token_count, ...) that
        # are also applied to readStream inputs.
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — AnalysisException on exotic plans
        return df
    if current < target:
        return df.repartition(target)
    return df
