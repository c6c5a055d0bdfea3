"""Corpus-ingest gate soak → the SCALING.md streaming-gates row.

The claim under test (round 9, extended round 10): with FIVE
cross-batch modalities armed — MinHash near-dup, incremental near-dup
vs the band index, the span duplicated-text gate, the frozen-codebook
DSIR quality gate, and the frozen-bigram-LM perplexity gate —
per-batch wall stays ~flat as the accepted corpus grows,
because each gate's per-batch work is batch-sized (broadcast
batch-hash probes, fixed-size codebook join), never corpus-sized.
The DSIR gate specifically must add a CONSTANT per batch: its state
is the frozen ~64 KiB codebook, read per batch, with zero
corpus-dependent terms.

Each batch: 300 novel docs (pass all gates) + 50 off-target docs
(DSIR drops) + 25 all-OOV noise docs (the perplexity gate drops: every
bigram lands on the unseen-context floor ln(1/(V+1))) + 25
verbatim-padded copiers of earlier batches (span gate drops; they sail
under the MinHash threshold) + 25 near-dup re-sends
(minhash/incremental drop). Batch composition is constant,
so wall growth could only come from corpus-sized state — which is
the thing the design forbids.

Usage: python tools/corpus_gate_soak.py [n_batches]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from orestes_spark.session import get_spark


def main(n_batches: int = 10, span_buckets: int | None = None) -> None:
    from orestes_spark.streaming.ingest import (
        make_corpus_batch_processor,
        prepare_dsir_gate,
        prepare_ppl_gate,
    )

    spark = get_spark("corpus-gate-soak")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    store = tempfile.mkdtemp(prefix="gate_soak_") + "/store"
    ddl = "doc_id LONG, text STRING"
    if span_buckets:
        print(f"(span gate bucketed: span_buckets={span_buckets})")

    tvoc = [f"t{i}" for i in range(40)]
    jvoc = [f"j{i}" for i in range(40)]
    target = spark.createDataFrame(
        [(10_000_000 + i, " ".join(tvoc)) for i in range(5)], ddl
    )
    raw = spark.createDataFrame(
        [(20_000_000, " ".join(tvoc)), (20_000_001, " ".join(jvoc))], ddl
    )
    prepare_dsir_gate(target, raw, store)
    prepare_ppl_gate(target, store, vocab_size=256)
    # Deterministic cohort NLLs under this LM: novel pass-docs ~5.08,
    # span-gate copiers ~5.28 (they must PASS the ppl gate to reach
    # the span gate that owns them), pure-OOV noise ~5.55 (= ln(257)
    # with ctx(0)=0). The ceiling sits at the copier/noise MIDPOINT
    # (margin ~0.13 nats each side; the original 5.3 cleared the
    # copiers by only 0.019 — one padding-token tweak away from the
    # ppl gate silently eating the span gate's cohort while the
    # accepted count still read 300: review finding).
    process = make_corpus_batch_processor(
        store, span_k=6, span_max_frac=0.5, dsir_floor=0.0,
        span_buckets=span_buckets, ppl_ceiling=5.42,
    )

    def novel_text(doc: int) -> str:
        # 6 target-voc tokens (one k=6 window — span coverage 6/20 =
        # 0.3, under the 0.5 bar) + 14 unique: passes every gate
        uniq = " ".join(f"u{doc}x{i}" for i in range(14))
        return " ".join(tvoc[doc % 8 : doc % 8 + 6]) + " " + uniq

    print("| batch | accepted corpus (docs) | batch wall s | accepted this batch |")
    print("|---|---|---|---|")
    for b in range(n_batches):
        base = b * 1000
        rows = [(base + i, novel_text(base + i)) for i in range(300)]
        rows += [
            (base + 400 + i, " ".join(jvoc) + f" z{base + i}") for i in range(50)
        ]  # off-target → DSIR gate
        rows += [
            (base + 600 + i, " ".join(f"q{base + i}n{j}" for j in range(20)))
            for i in range(25)
        ]  # all-OOV noise → perplexity gate
        if b > 0:
            prev = (b - 1) * 1000
            rows += [
                # 16 tokens verbatim from an accepted doc + padding:
                # under the Jaccard threshold, caught by the span gate
                (base + 500 + i, novel_text(prev + i) + " " + " ".join(f"p{base + i}y{j}" for j in range(14)))
                for i in range(25)
            ]
            rows += [(prev + i, novel_text(prev + i)) for i in range(25)]  # re-sends
        batch = spark.createDataFrame(rows, ddl)
        t0 = time.perf_counter()
        process(batch, b)
        dt = time.perf_counter() - t0
        import pyspark.sql.functions as F

        docs = spark.read.parquet(f"{store}/docs")
        n = docs.count()
        this = docs.where(F.col("epoch") == b).count()
        print(f"| {b} | {n:,} | {dt:.2f} | {this} |")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 10,
        int(sys.argv[2]) if len(sys.argv) > 2 else None,
    )
