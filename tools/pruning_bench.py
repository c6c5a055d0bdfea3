"""Partition-pruning evidence at 10M points: the same warehouse read
three ways — match-all over all history, a one-day time slice, and a
one-day slice + selective tag filter — so the bucket-predicate (F3)
and series-semi-join costs are measured, not asserted. 10M points at
864 ms spacing span ~100 daily buckets.

Usage: python tools/pruning_bench.py   (append results to SCALING.md)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from orestes_spark.engine import OrestesEngine
from orestes_spark.session import get_spark

START = 1_700_000_000_000
MS_IN_DAY = 86_400_000
N = 10_000_000


def main() -> None:
    spark = get_spark("pruning-bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    eng = OrestesEngine(spark, tempfile.mkdtemp(prefix="orestes_prune_"))
    pts = spark.range(N).select(
        (F.lit(START) + F.col("id") * 864).alias("time_ms"),
        (F.rand(42) * 100).alias("value"),
        F.map_from_arrays(
            F.array(F.lit("tag0"), F.lit("tag1"), F.lit("tag2"), F.lit("tag3")),
            F.array(*[
                F.concat(F.lit("value"), (F.floor(F.rand(k) * 10)).cast("string"))
                for k in range(4)
            ]),
        ).alias("tags"),
    )
    t0 = time.perf_counter()
    eng._append(pts, "default")
    t_write = time.perf_counter() - t0
    n_buckets = len(list(eng._points_path("default").glob("bucket=*")))
    end = START + N * 864

    def timed_read(name, es, lo, hi):
        t0 = time.perf_counter()
        n = eng.read(es, "default", lo, hi, grouped=False).count()
        dt = time.perf_counter() - t0
        print(f"| {name} | {n:,} | {dt:.2f} |")
        return dt

    print(f"write: {t_write:.1f}s, buckets: {n_buckets}")
    print("| read | rows | s |")
    print("|---|---|---|")
    full = timed_read("match-all, full history", None, 0, end)
    day = timed_read("match-all, 1 day of ~100", None, START + 50 * MS_IN_DAY,
                     START + 51 * MS_IN_DAY)
    filt = timed_read("term tag0=value3, 1 day", {"term": {"tag0": "value3"}},
                      START + 50 * MS_IN_DAY, START + 51 * MS_IN_DAY)
    print(f"day/full: {day/full:.3f}, filtered-day/full: {filt/full:.3f}")


if __name__ == "__main__":
    main()
