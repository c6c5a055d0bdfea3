"""Bigram-LM codebook boundedness → the SCALING.md trained-LM row.

The claim (round-10): text.train_bigram_lm's driver state is bounded
BY CONSTRUCTION at (V+1)^2 id pairs — the (p, c) groupBy reduces
corpus tokens to at most that many rows before the collect — so
training cost grows with the corpus scan but the collected codebook
does NOT. This measures both across the three test scale factors:
train wall, observed |pairs| (vs the (V+1)^2 ceiling), and scoring
wall over the complementary corpus slice.

Usage: python tools/lm_codebook_bench.py [vocab_size]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from orestes_spark.session import get_spark
from orestes_spark.sources.testdata import load_table


def main(vocab_size: int = 256) -> None:
    from orestes_spark.operators.text import bigram_lm_nll, train_bigram_lm

    spark = get_spark("lm-codebook-bench")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    ceiling = (vocab_size + 1) ** 2
    print(f"(vocab_size={vocab_size}; codebook ceiling = (V+1)^2 = {ceiling:,})")
    print("| sf | corpus docs | train wall s | observed pairs | score wall s |")
    print("|---|---|---|---|---|")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = load_table(spark, f"/root/testdata/{sf}", "documents")
        target = d.where(F.col("doc_id") % 20 == 0)
        corpus = d.where(F.col("doc_id") % 20 != 0)
        n_docs = d.count()
        t0 = time.perf_counter()
        model = train_bigram_lm(target, "doc_id", "text", vocab_size)
        t_train = time.perf_counter() - t0
        n_pairs = model[1].count()
        assert n_pairs <= ceiling, (n_pairs, ceiling)
        t0 = time.perf_counter()
        bigram_lm_nll(corpus, None, "doc_id", "text", model=model).count()
        t_score = time.perf_counter() - t0
        print(
            f"| {sf} | {n_docs:,} | {t_train:.2f} | {n_pairs:,} | {t_score:.2f} |"
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
