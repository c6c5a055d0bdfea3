"""Pathological-series stress (round-6 verdict task 3): one series
holding 10M points across ~116 daily buckets.

The grouped read (one array per series) funnels such a series into a
single aggregation task — the likeliest OOM at 100× scale. This
measures the three answers shipped in round 6:

  1. read(grouped=True)            — the risky shape, timed for the record
  2. read(grouped=True, max_group_points=N) — loud failure BEFORE the
     array materializes past N (error message, not an executor OOM)
  3. read_chunked()                — per-(series, bucket) arrays: task
     memory bounded by one series-day (~86k points here) no matter how
     much history the series accumulates

Run:  python tools/pathological_series.py [n_points]
Writes a summary line; numbers go to SCALING.md.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
MS_IN_DAY = 86_400_000
START = 1_700_000_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from orestes_spark.engine import OrestesEngine
    from orestes_spark.session import get_spark

    spark = get_spark("pathological-series")
    eng = OrestesEngine(spark, tempfile.mkdtemp(prefix="patho_wh_"))

    # One series, N points, 1 s apart → N/86400 daily buckets
    # (10M points ≈ 116 buckets of ~86.4k points each).
    pts = (
        spark.range(N)
        .select(
            (F.lit(START) + F.col("id") * 1000).alias("time_ms"),
            F.col("id").cast("double").alias("value"),
            F.create_map(F.lit("host"), F.lit("the-one")).alias("tags"),
        )
    )
    t0 = time.perf_counter()
    eng._append(pts, "default")
    t_write = time.perf_counter() - t0
    n_buckets = len(list(eng._points_path("default").glob("bucket=*")))

    # 3. chunked: count points via the chunked shape (forces the full
    # per-bucket array build + a scan over the arrays).
    t0 = time.perf_counter()
    n_chunks, n_pts_chunked = (
        eng.read_chunked(None, "default", 0, 2**50)
        .select(F.count("*"), F.sum(F.size("points")))
        .first()
    )
    t_chunked = time.perf_counter() - t0

    # 2. capped grouped read: must fail loudly, fast, with the series name.
    t0 = time.perf_counter()
    try:
        eng.read(None, "default", 0, 2**50, max_group_points=1_000_000).collect()
        capped = "NO ERROR (BUG)"
    except Exception as e:  # Py4J wraps the SparkRuntimeException
        capped = "loud" if "max_group_points" in str(e) else f"WRONG ERROR: {e}"
    t_capped = time.perf_counter() - t0

    # 1. uncapped grouped read, for the record (single giant array row;
    # measure but don't collect the array to the driver — count points).
    # Above ~130M points the single row exceeds Spark's 2 GB UnsafeRow
    # limit ("Cannot grow BufferHolder") — the failure mode the cap and
    # the chunked path exist to prevent; report it, don't crash.
    t0 = time.perf_counter()
    try:
        n_grouped = str(
            eng.read(None, "default", 0, 2**50).select(F.sum(F.size("points"))).first()[0]
        )
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        n_grouped = f"FAILED as predicted ({msg})"
    t_grouped = time.perf_counter() - t0

    print(
        f"n={N} buckets={n_buckets} write={t_write:.1f}s | "
        f"chunked: {n_chunks} chunks / {n_pts_chunked} pts in {t_chunked:.1f}s | "
        f"cap=1M: {capped} in {t_capped:.1f}s | "
        f"uncapped grouped: {n_grouped} pts in {t_grouped:.1f}s"
    )


if __name__ == "__main__":
    main()
