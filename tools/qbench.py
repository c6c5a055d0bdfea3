"""Targeted per-query micro-bench for the optimization rounds: run a
named subset of registered queries (and/or shared artifacts) N times
each in ONE session and report the per-query MIN plus the steal ticks
burned over the whole window.

Rationale (round 12): the full bench.py protocol takes ~25 min and
this shared host is in a steal storm (all 6 round-open measured
passes rejected at 3.4k-29k ticks vs the 900-tick gate), so per-change
evidence comes from min-of-N on the touched queries — min-of-N is
robust to additive steal noise, and a small subset keeps the exposure
window short. The full bench still runs at round close for the
committed artifact.

Usage:
    python tools/qbench.py [--reps N] [--sf DIR] name [name ...]
    python tools/qbench.py --artifacts            # time build_shared_artifacts
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def steal_ticks() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--artifacts", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from orestes_spark.queries import QUERIES, build_shared_artifacts
    from orestes_spark.session import get_spark

    spark = get_spark("qbench")
    names = args.names
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warmup: worker pool, codegen, page cache, shared artifacts
    if args.artifacts or names:
        build_shared_artifacts(spark, args.sf)
    for n in names:
        QUERIES[n](spark, args.sf).collect()

    s0 = steal_ticks()
    t_all = time.perf_counter()
    mins: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    art_samples: dict[str, list[float]] = {}
    for _ in range(args.reps):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        if args.artifacts:
            for aname, secs in build_shared_artifacts(spark, args.sf).items():
                art_samples.setdefault(aname, []).append(secs)
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n](spark, args.sf).collect()
            samples[n].append(round(time.perf_counter() - t0, 3))
    for n, ss in list(samples.items()) + list(art_samples.items()):
        mins[n] = min(ss)
    out = {
        "reps": args.reps,
        "sf": args.sf,
        "steal_ticks": steal_ticks() - s0,
        "window_s": round(time.perf_counter() - t_all, 1),
        "min": mins,
        "samples": {**samples, **art_samples},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
