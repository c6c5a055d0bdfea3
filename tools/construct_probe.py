"""Split per-query wall time into DataFrame CONSTRUCTION (Python/py4j
expression building + any probe jobs run before the action) vs
EXECUTION (the .collect()), steady-state min over N reps — the
round-12 diagnostic that exposed construction as the dominant cost of
the HOF-expression query families at sf0.1.

Usage: python tools/construct_probe.py [--reps N] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from orestes_spark.queries import QUERIES, build_shared_artifacts
    from orestes_spark.session import get_spark

    spark = get_spark("construct-probe")
    build_shared_artifacts(spark, args.sf)
    for n in args.names:
        QUERIES[n](spark, args.sf).collect()  # warmup

    out = {}
    for n in args.names:
        cs, es = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = QUERIES[n](spark, args.sf)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            cs.append(round(t1 - t0, 3))
            es.append(round(t2 - t1, 3))
        out[n] = {"construct_min": min(cs), "exec_min": min(es),
                  "construct": cs, "exec": es}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
