"""Scale check for similarity.kmeans_cosine: per-pass cost and plan
shape as the corpus grows.

The docstring's claim: assignment is a broadcast-centroid map-side
argmax whose shuffle carries |corpus| rows (never |corpus| x k), and
the centroid update is one (cluster, dim) partial-combinable agg — so
wall per pass should scale ~linearly in rows and stay flat in k (for
k x d tables that broadcast). This measures train wall at three corpus
sizes and two k values, plus the count of Exchange operators in the
final assignment plan.

Usage: python tools/kmeans_scale_bench.py [rows...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orestes_spark.operators.similarity import kmeans_cosine  # noqa: E402
from orestes_spark.session import get_spark  # noqa: E402


def run(spark, n: int, k: int, dim: int = 32, iters: int = 2) -> float:
    rng = np.random.default_rng(11)
    dirs = rng.normal(size=(k, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    labels = rng.integers(k, size=n)
    mat = dirs[labels] + rng.normal(scale=0.4, size=(n, dim))
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>").repartition(32)
    df = df.localCheckpoint()  # exclude data-gen from the timed region
    t0 = time.perf_counter()
    out = kmeans_cosine(df, k=k, iters=iters, quantize=1000)
    n_out = out.count()
    wall = time.perf_counter() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    single = plan.count("SinglePartition")
    assert n_out == n
    print(
        f"rows={n:7d} k={k:3d} iters={iters} wall={wall:6.2f}s"
        f" exchanges(final assignment plan)={n_exchange} single_partition={single}",
        flush=True,
    )
    return wall


def main() -> None:
    spark = get_spark("kmeans-scale")
    sizes = [int(a) for a in sys.argv[1:]] or [25_000, 100_000, 200_000]
    for k in (8, 64):
        walls = [run(spark, n, k) for n in sizes]
        growth = walls[-1] / walls[0]
        data_growth = sizes[-1] / sizes[0]
        print(
            f"k={k}: wall growth {growth:.2f}x over {data_growth:.0f}x rows "
            f"({'sub' if growth < data_growth else 'SUPER'}-linear)",
            flush=True,
        )


if __name__ == "__main__":
    main()
