"""Dump ``explain("formatted")`` for named queries into
plans/r12/<query>_<tag>.txt — the before/after plan evidence files for
the optimization rounds. Checkpointed sub-stage plans (captured at
localCheckpoint time, before lineage truncation) are appended after
the final plan so iterative queries show their full shape.

Usage: python tools/plan_for.py --tag before [--sf DIR] name [...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default=str(REPO / "plans" / "r12"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from orestes_spark.plans.explain import capture_checkpoints
    from orestes_spark.queries import QUERIES
    from orestes_spark.session import get_spark

    spark = get_spark("plan-for")
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for name in args.names:
        stages: list[str] = []
        with capture_checkpoints(stages):
            df = QUERIES[name](spark, args.sf)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        parts = [f"== {name} ({args.tag}) ==\n", formatted]
        for i, p in enumerate(stages):
            parts.append(f"\n== checkpointed sub-stage {i + 1}/{len(stages)} ==\n{p}")
        (outdir / f"{name}_{args.tag}.txt").write_text("\n".join(parts))
        print(f"wrote {name}_{args.tag}.txt ({len(stages)} sub-stages)")


if __name__ == "__main__":
    main()
