"""Skewed-ANN scale run (round-6 verdict task 5): the embedding-side
mirror of the round-5 Zipf dedup evidence.

Synthetic CLUSTERED (non-uniform) corpus: 64 Gaussian clusters with
Zipf(1.3)-distributed sizes — the head cluster holds ~30% of the
corpus, the worst case for anything whose cost is Σ|cell|². Sizes
50k → 200k → 800k (16×), dim 32. Per size:

  - IVF cell-size distribution (p50 / p99 / max) — quantifies the skew
    the cap must survive
  - ivf_topk nprobe=1 and nprobe=2 wall time, and recall@10 against
    the exact brute-force oracle (cosine_topk_arrow)
  - semantic_dedup_arrow with max_cluster=10k: wall time + refinement
    outcome (round 7: over-cap clusters are re-quantized — exact-dup
    collapse + nearest-seed splits — so the Zipf head is DEDUPED, not
    exempted; the report shows hot members seen vs members still
    excluded after bounded splitting)
  - incremental SemDeDup (round 7): a 5% batch deduped against a
    persisted semantic_index of the other 95% via the cogrouped-GEMM
    kernel — index build charged separately, batch dedup wall is the
    per-ingest steady-state cost to compare against the full rebuild

Run: python tools/ann_scale_bench.py [sizes...]
One summary line per size; numbers go to SCALING.md.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

D, C, ZIPF_S, K, NQ, MAX_CLUSTER = 32, 64, 1.3, 10, 50, 10_000


def main() -> None:
    from pyspark.sql import functions as F

    from orestes_spark.operators import similarity
    from orestes_spark.session import get_spark

    spark = get_spark("ann-scale")
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000, 800_000]

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
                F.col("cluster").cast("string").alias("label"),
                F.array(
                    *[
                        (F.col("center")[j] + (F.rand(100 + j) - 0.5) * 3.5).alias(f"e{j}")
                        for j in range(D)
                    ]
                ).alias("embedding"),
            )
            .localCheckpoint()  # pin: everything below reuses this corpus
        )
        queries = corpus.limit(NQ).localCheckpoint()

        sizes_rows = sorted(
            r["c"] for r in corpus.groupBy("label").agg(F.count("*").alias("c")).collect()
        )
        p50 = sizes_rows[len(sizes_rows) // 2]
        p99 = sizes_rows[min(len(sizes_rows) - 1, int(len(sizes_rows) * 0.99))]

        t0 = time.perf_counter()
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.cosine_topk_arrow(corpus, queries, k=K).collect()
        }
        t_exact = time.perf_counter() - t0

        rec = {}
        t_ivf = {}
        for nprobe in (1, 2):
            t0 = time.perf_counter()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in similarity.ivf_topk(
                    corpus, queries, k=K, nprobe=nprobe
                ).collect()
            }
            t_ivf[nprobe] = time.perf_counter() - t0
            rec[nprobe] = len(got & exact) / len(exact)

        hot = [c for c in sizes_rows if c > MAX_CLUSTER]
        t0 = time.perf_counter()
        n_kept = (
            similarity.semantic_dedup_arrow(
                corpus, threshold=0.9, quantize=1000, max_cluster=MAX_CLUSTER
            )
            .where(F.col("kept"))
            .count()
        )
        t_sem = time.perf_counter() - t0
        st = similarity.REFINE_STATS.get("semantic_dedup_arrow", {})

        # incremental path: 95% of the corpus is a persisted index,
        # the remaining 5% plays the per-ingest batch
        import shutil
        import tempfile

        idx_dir = tempfile.mkdtemp(prefix="ann_scale_idx_")
        corpus95 = corpus.where(F.col("vec_id") % 20 != 0)
        batch5 = corpus.where(F.col("vec_id") % 20 == 0)
        t0 = time.perf_counter()
        similarity.semantic_index(corpus95, quantize=1000).write.partitionBy(
            "cluster"
        ).parquet(idx_dir + "/i")
        similarity.semantic_index_centroids(
            spark.read.parquet(idx_dir + "/i")
        ).write.parquet(idx_dir + "/c")
        t_idx_build = time.perf_counter() - t0
        idx = spark.read.parquet(idx_dir + "/i")
        cents = spark.read.parquet(idx_dir + "/c")
        t0 = time.perf_counter()
        n_inc_kept = (
            similarity.incremental_semantic_dedup_arrow(
                batch5, idx, threshold=0.9, quantize=1000, cents=cents
            )
            .where(F.col("kept"))
            .count()
        )
        t_inc = time.perf_counter() - t0
        shutil.rmtree(idx_dir, ignore_errors=True)

        print(
            f"n={n} cells: p50={p50} p99={p99} max={sizes_rows[-1]} "
            f"({sizes_rows[-1] / n:.0%} of corpus) | "
            f"exact@{K}: {t_exact:.1f}s | "
            f"ivf nprobe=1: {t_ivf[1]:.1f}s recall={rec[1]:.2f}; "
            f"nprobe=2: {t_ivf[2]:.1f}s recall={rec[2]:.2f} | "
            f"semdedup cap={MAX_CLUSTER}: {t_sem:.1f}s kept={n_kept} "
            f"hot_clusters={len(hot)} ({sum(hot)} members) "
            f"refine: hot_members={st.get('hot_members', 0)} "
            f"direct_drops={st.get('direct_drops', 0)} "
            f"still_excluded={st.get('excluded_members', 0)} "
            f"({(st.get('excluded_members') or 0) / n:.1%} of corpus) | "
            f"incremental(5% batch vs 95% index): build={t_idx_build:.1f}s "
            f"dedup={t_inc:.1f}s kept={n_inc_kept}"
        )


if __name__ == "__main__":
    main()
