"""Reproduce the reference's perf-test shape (BASELINE.md) on the
Spark engine: N points across S series (tags tag0..tagk over
value0..value9), write then match-all read, at the reference's exact
configurations. Records evidence for the scaling law:

    write time ~ linear in #points, ~independent of #series
    read time ~ linear in #series,  ~independent of #points

Usage: python tools/scaling_bench.py  (writes SCALING.md table rows)
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


def synth_points(spark, n_points: int, n_tags: int, n_values: int):
    """Reference perf-test data shape (scripts/perf-test.js:21-37):
    1 ms spacing, tag k of point i uniform over value0..value{v-1} —
    generated distributed (spark.range), not driver-side."""
    df = spark.range(n_points).select(
        (F.lit(START) + F.col("id")).alias("time_ms"),
        (F.rand(42) * 100).alias("value"),
        F.map_from_arrays(
            F.array(*[F.lit(f"tag{k}") for k in range(n_tags)]),
            F.array(
                *[
                    F.concat(F.lit("value"), (F.floor(F.rand(k) * n_values)).cast("string"))
                    for k in range(n_tags)
                ]
            ),
        ).alias("tags"),
    )
    return df


def run_config(spark, n_points: int, n_tags: int, n_values: int) -> tuple[float, float, int]:
    import shutil

    pts = synth_points(spark, n_points, n_tags, n_values).localCheckpoint()
    wh = tempfile.mkdtemp(prefix="scaling_")
    eng = OrestesEngine(spark, wh)
    t0 = time.perf_counter()
    eng._append(pts, "default")
    write_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = eng.read(None, "default", 0, START + n_points + 1, grouped=True)
    n_series = n.count()
    read_s = time.perf_counter() - t0
    # Release this config's localCheckpoint blocks before the next one:
    # accumulated checkpoint RDDs from earlier configs otherwise sit in
    # executor memory and degrade the largest config ~1.5x (measured:
    # 10M write 51s after six retained configs vs 35s clean).
    del pts
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    # each warehouse is a full copy of the config's data (the 10M row
    # is ~GB-scale) — never leave them accumulating in /tmp
    shutil.rmtree(wh, ignore_errors=True)
    return write_s, read_s, n_series


def main() -> None:
    spark = get_spark("scaling-bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    configs = [
        (100_000, 1, 1),
        (100_000, 1, 10),
        (100_000, 2, 10),
        (100_000, 3, 10),
        (100_000, 4, 10),
        (1_000_000, 4, 10),
        (10_000_000, 4, 10),  # 10× the reference's largest config
    ]
    print("| points | tags×values | series | write s (pts/s) | read s (pts/s) |")
    print("|---|---|---|---|---|")
    for n_points, n_tags, n_values in configs:
        w, r, s = run_config(spark, n_points, n_tags, n_values)
        print(
            f"| {n_points:,} | {n_tags}×{n_values} | {s:,} "
            f"| {w:.2f} ({n_points / w:,.0f}/s) | {r:.2f} ({n_points / r:,.0f}/s) |"
        )


if __name__ == "__main__":
    main()
