"""Skewed-corpus dedup scaling: does the Σ|bucket|²/2 candidate bound
hold off the uniform synthetic testdata?

Generates a Zipfian corpus IN SPARK (deterministic xxhash64-based
log-uniform token ranks — frequency ∝ 1/rank, the classic text law —
so hot tokens dominate exactly the way a real crawl's do), plants
duplicate clusters (2% of docs in clusters of 20 identical texts), and
measures, across a 16× corpus range:

  - LSH band-bucket skew (max / p99 bucket size),
  - candidate-pair count and pairs/doc (near-constant ⇒ near-linear
    total work),
  - full minhash_lsh_dedup wall time and docs/s.

Usage: python tools/dedup_skew_scaling.py   (append table to SCALING.md)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orestes_spark.operators import dedup
from orestes_spark.session import get_spark

VOCAB = 50_000
TOKENS_PER_DOC = 30
CLUSTER = 20          # planted duplicate-cluster size
CLUSTER_PER_1000 = 1  # one 20-doc cluster per 1000 docs (2% of docs)


def zipf_corpus(spark, n: int) -> DataFrame:
    """(doc_id, text): Zipfian tokens, deterministic, cluster-planted.

    rank = floor(VOCAB^u) with u uniform from xxhash64 gives the
    log-uniform rank distribution (P(rank=r) ∝ 1/r — Zipf s=1); docs
    in a planted cluster share their base doc's hash stream, so their
    texts are byte-identical."""
    base = F.when(
        (F.col("id") % 1000) < CLUSTER, F.col("id") - (F.col("id") % 1000)
    ).otherwise(F.col("id"))
    u = lambda p: (
        F.pmod(F.xxhash64(base, p, F.lit("zipf-skew")), F.lit(1_000_000_007))
        / 1_000_000_007.0
    )
    tok = lambda p: F.concat(
        F.lit("t"), F.floor(F.pow(F.lit(float(VOCAB)), u(p))).cast("long").cast("string")
    )
    toks = F.array(*[tok(F.lit(p)) for p in range(TOKENS_PER_DOC)])
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    )


def main() -> None:
    spark = get_spark("dedup-skew-scaling")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm JIT

    print("| docs | max bucket | p99 bucket | cand pairs | pairs/doc | dedup wall s | docs/s |")
    print("|---|---|---|---|---|---|---|")
    rows = []
    for n in (50_000, 200_000, 800_000):
        docs = zipf_corpus(spark, n).localCheckpoint()  # freeze: generation cost excluded
        arrays = dedup.token_shingle_arrays(docs, "doc_id", "text")
        sig = dedup.minhash_signatures(arrays, 8)
        bands = dedup.minhash_band_rows(sig, 8, 2)
        bsizes = bands.groupBy("band", "bval").count()
        stats = bsizes.agg(
            F.max("count").alias("mx"), F.expr("percentile_approx(count, 0.99)").alias("p99")
        ).collect()[0]
        n_cand = dedup.minhash_band_candidates(sig, 8, 2).count()
        t0 = time.perf_counter()
        n_pairs = dedup.minhash_lsh_dedup(docs, "doc_id", "text").count()
        dt = time.perf_counter() - t0
        rows.append((n, n_cand / n))
        print(
            f"| {n:,} | {stats['mx']} | {stats['p99']} | {n_cand:,} |"
            f" {n_cand / n:.2f} | {dt:.2f} | {n / dt:,.0f} |"
        )
        # sanity: the planted clusters are found (each cluster of 20
        # identical docs yields C(20,2)=190 jaccard-1.0 pairs)
        expected = (n // 1000) * (CLUSTER * (CLUSTER - 1) // 2)
        assert n_pairs >= expected, (n_pairs, expected)

    growth = rows[-1][1] / rows[0][1]
    print(
        f"\npairs/doc growth across {rows[-1][0] // rows[0][0]}x corpus:"
        f" {growth:.2f}x (1.0 = perfectly linear candidate work)"
    )


if __name__ == "__main__":
    main()
