"""Recall probe for IVF over TRAINED cells (round-8 verdict task 6):
emb_ivf_recall's measurement at scale, on the same Zipf-clustered
corpus as tools/ann_scale_bench.py (64 Gaussian clusters, Zipf(1.3)
sizes — the head cluster is ~30% of the corpus).

ann_scale_bench routes IVF on the GIVEN labels; this probe earns its
cells with similarity.kmeans_cosine (the label-free path emb_ivf_
trained/emb_ivf_recall exercise) and reports recall@10 vs the exact
brute-force oracle at nprobe=1/2 — the dial feedback an operator
needs before trusting a trained quantizer on an unlabeled corpus.

Run: python tools/ivf_trained_recall_bench.py [sizes...]
One line per size; numbers go to SCALING.md.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

D, C, ZIPF_S, K, NQ, KCELLS = 32, 64, 1.3, 10, 50, 16


def main() -> None:
    from pyspark.sql import functions as F

    from orestes_spark.operators import similarity
    from orestes_spark.session import get_spark

    spark = get_spark("ivf-trained-recall")
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000]

    random.seed(7)
    centers = [[random.gauss(0.0, 1.0) for _ in range(D)] for _ in range(C)]
    w = [1.0 / (i + 1) ** ZIPF_S for i in range(C)]
    tot = sum(w)
    cum, acc = [], 0.0
    for i in range(C):
        lo = acc
        acc += w[i] / tot
        cum.append((i, lo, acc if i < C - 1 else 1.01))
    cdf = spark.createDataFrame(
        [(i, lo, hi, centers[i]) for (i, lo, hi) in cum],
        "cluster INT, lo DOUBLE, hi DOUBLE, center ARRAY<DOUBLE>",
    )

    for n in sizes:
        corpus = (
            spark.range(n)
            .withColumn("u", F.rand(11))
            .join(F.broadcast(cdf), (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
            .select(
                F.col("id").alias("vec_id"),
                F.array(
                    *[
                        (F.col("center")[j] + (F.rand(100 + j) - 0.5) * 3.5).alias(f"e{j}")
                        for j in range(D)
                    ]
                ).alias("embedding"),
            )
            .localCheckpoint()
        )
        queries = corpus.limit(NQ).localCheckpoint()

        t0 = time.perf_counter()
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.cosine_topk_arrow(corpus, queries, k=K).collect()
        }
        t_exact = time.perf_counter() - t0

        t0 = time.perf_counter()
        assign = similarity.kmeans_cosine(corpus, k=KCELLS, iters=2).localCheckpoint()
        t_train = time.perf_counter() - t0
        labeled = corpus.join(assign, "vec_id").localCheckpoint()
        cell_sizes = sorted(
            r["c"] for r in labeled.groupBy("cluster").agg(F.count("*").alias("c")).collect()
        )

        rec, t_ivf = {}, {}
        for nprobe in (1, 2):
            t0 = time.perf_counter()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in similarity.ivf_topk(
                    labeled, queries, label_col="cluster", k=K, nprobe=nprobe
                ).collect()
            }
            t_ivf[nprobe] = time.perf_counter() - t0
            rec[nprobe] = len(got & exact) / len(exact)

        print(
            f"n={n} trained k={KCELLS}: train={t_train:.1f}s "
            f"cells p50={cell_sizes[len(cell_sizes) // 2]} max={cell_sizes[-1]} "
            f"({cell_sizes[-1] / n:.0%}) | exact@{K}: {t_exact:.1f}s | "
            f"ivf nprobe=1: {t_ivf[1]:.1f}s recall={rec[1]:.2f}; "
            f"nprobe=2: {t_ivf[2]:.1f}s recall={rec[2]:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
