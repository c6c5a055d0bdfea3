"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>}

Each query is forced with .collect() (driver-equivalent action).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from orestes_spark.queries import QUERIES
    from orestes_spark.session import get_spark

    spark = get_spark("orestes-bench")

    # Warm the JVM/codegen path outside the timed region.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    # BASELINE.md comparison: engine write/read throughput at the same
    # batch size shape as the reference's perf-test (match-all read).
    import tempfile

    from orestes_spark.engine import OrestesEngine
    from orestes_spark.sources.testdata import events_as_points

    pts = events_as_points(spark, sf_dir).localCheckpoint()
    n_pts = pts.count()
    eng = OrestesEngine(spark, tempfile.mkdtemp(prefix="orestes_bench_wh_"))
    t0 = time.perf_counter()
    eng._append(pts, "default")
    write_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_read = eng.read(None, "default", 0, 2_000_000_000_000, grouped=False).count()
    read_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "orestes_spark_total_query_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "write_pts_per_sec": round(n_pts / write_s),
                "read_pts_per_sec": round(n_read / read_s),
            }
        )
    )


if __name__ == "__main__":
    main()
