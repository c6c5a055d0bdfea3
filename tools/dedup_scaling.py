"""Dedup-pipeline scaling measurement → the SCALING.md dedup section.

At tiny corpora Spark's fixed costs (plan compile, codegen JIT, task
launch) dominate the dedup pipelines, which makes per-query wall time
look slow next to an embedded engine. This bench shows the costs are
fixed, not proportional: wall time across a 100× corpus range
(sf0.001 → sf0.1), plus a steady-state re-run at the largest sf that
strips the one-time JIT/compile share.

Usage: python tools/dedup_scaling.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from orestes_spark.operators import dedup
from orestes_spark.session import get_spark
from orestes_spark.sources.testdata import load_table


def main() -> None:
    spark = get_spark("dedup-scaling")
    spark.range(1000).selectExpr("sum(id)").collect()

    print("| corpus (docs) | minhash+LSH+verify s | docs/s |")
    print("|---|---|---|")
    for sf in ("0.001", "0.01", "0.1"):
        d = load_table(spark, f"/root/testdata/sf{sf}", "documents")
        n = d.count()
        t0 = time.perf_counter()
        dedup.minhash_lsh_dedup(d, "doc_id", "text").collect()
        dt = time.perf_counter() - t0
        print(f"| {n:,} | {dt:.2f} | {n / dt:,.0f} |")

    # steady state at the largest sf: same query, warm JIT/codegen —
    # the marginal cost a long-running cluster job actually pays.
    d = load_table(spark, "/root/testdata/sf0.1", "documents")
    n = d.count()
    t0 = time.perf_counter()
    dedup.minhash_lsh_dedup(d, "doc_id", "text").collect()
    dt = time.perf_counter() - t0
    print(f"| {n:,} (steady state) | {dt:.2f} | {n / dt:,.0f} |")


if __name__ == "__main__":
    main()
