"""Distribution-shift soak for the frozen text-gate drift policy
(round-11, VERDICT r10 #3) → the SCALING.md drift-trigger row.

The claim under test: a corpus whose distribution shifts under a
FROZEN DSIR gate silently collapses acceptance; the measured trigger
(``text_gate_retrain_if`` reading ``<store>/gate_stats``) detects the
collapse from the per-epoch acceptance rate, retrains the codebook
from current reference data with an atomic swap, and acceptance
RECOVERS — while a healthy stream never triggers (no-op path).

Scenario, per epoch: 200 docs of the current topic mix with unique
ids/paraphrase suffixes so the dedup gates pass them. Epochs 0..k-1
draw from topic A (the frozen gate's target); epochs k..2k-1 draw
from topic B (the shift). After each epoch the soak prints the gate's
recorded acceptance; at the shift boundary + ``window`` epochs it
runs the trigger with a B-topic reference and prints the before/after
acceptance — the recovery curve SCALING.md quotes.

Round-12 (VERDICT r11 #5): the soak now has one ARM PER FROZEN GATE —
``dsir`` (the original), ``quality`` (NB classifier log-odds floor),
and ``ppl`` (bigram-LM perplexity ceiling) — each producing the same
measured shift -> starve -> retrain -> recover curve, since each gate
freezes a different artifact and can drift independently. The ppl
arm's ceiling is MEASURED from the frozen LM (midpoint of the
A-target and B-shift mean NLL), not hand-tuned: the point is the
acceptance dynamics, not a magic constant.

Usage: python tools/gate_drift_soak.py [epochs_per_phase] [gate|all]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from orestes_spark.session import get_spark

VOC_A = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
VOC_B = ["nova", "quasar", "pulsar", "comet", "meteor", "nebula", "aurora", "zenith"]


def _docs(spark, voc: list[str], epoch: int, n: int = 200):
    rows = []
    for i in range(n):
        did = epoch * 1000 + i
        # unique tokens interleaved every 2 positions: no 3-token
        # shingle is ever fully shared between docs, so the dedup
        # gates (MinHash jaccard 0) pass everything and the DSIR gate
        # alone decides — 5 of 8 tokens carry the topic signal
        v = [voc[(i + j) % len(voc)] for j in range(5)]
        toks = [v[0], v[1], f"u{did}", v[2], v[3], f"v{did}", v[4], f"w{did}"]
        rows.append((did, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _run_arm(spark, gate: str, epochs_per_phase: int) -> None:
    """One shift -> starve -> retrain -> recover curve for ``gate``."""
    from orestes_spark.streaming.ingest import (
        make_corpus_batch_processor,
        prepare_dsir_gate,
        prepare_ppl_gate,
        prepare_quality_gate,
        read_gate_stats,
        text_gate_retrain_if,
    )

    store = tempfile.mkdtemp(prefix=f"gate_drift_{gate}_") + "/store"
    target_a = _docs(spark, VOC_A, 900)
    raw_mix = _docs(spark, VOC_A, 901, 100).unionByName(_docs(spark, VOC_B, 902, 100))

    if gate == "dsir":
        prepare_dsir_gate(target_a, raw_mix, store)
        process = make_corpus_batch_processor(store, dsir_floor=0.0)
        retrain_kw = dict(dsir=(_docs(spark, VOC_B, 903), raw_mix))
    elif gate == "quality":
        # labeled reference: topic-A positive, topic-B negative — the
        # frozen NB model starves a B-shifted stream; the retrain
        # source flips the labels (B is now the wanted topic)
        docs = _docs(spark, VOC_A, 904, 100).unionByName(_docs(spark, VOC_B, 905, 100))
        import pyspark.sql.functions as F

        labels = docs.select(
            "doc_id", (F.col("doc_id") < 905000).alias("label")
        )
        prepare_quality_gate(docs, labels, store)
        process = make_corpus_batch_processor(store, quality_floor=0.0)
        flipped = labels.select("doc_id", (~F.col("label")).alias("label"))
        retrain_kw = dict(quality=(docs, flipped))
    elif gate == "ppl":
        prepare_ppl_gate(target_a, store, vocab_size=32)
        # MEASURED ceiling: midpoint of the frozen LM's mean NLL over
        # an A-phase sample and a B-phase sample — the soak tests the
        # acceptance dynamics, not a hand-tuned constant
        from orestes_spark.operators.text import bigram_lm_nll
        import pyspark.sql.functions as F

        vocab = {
            r["tok"]: r["id"]
            for r in spark.read.parquet(f"{store}/bigram_lm/vocab").collect()
        }
        model = (
            vocab,
            spark.read.parquet(f"{store}/bigram_lm/pairs"),
            spark.read.parquet(f"{store}/bigram_lm/fb"),
        )
        mean_a = bigram_lm_nll(
            _docs(spark, VOC_A, 906, 50), None, "doc_id", "text", model=model
        ).agg(F.avg("avg_nll")).first()[0]
        mean_b = bigram_lm_nll(
            _docs(spark, VOC_B, 907, 50), None, "doc_id", "text", model=model
        ).agg(F.avg("avg_nll")).first()[0]
        ceiling = (mean_a + mean_b) / 2
        print(f"ppl arm: mean_nll A={mean_a:.3f} B={mean_b:.3f} -> ceiling {ceiling:.3f}")
        process = make_corpus_batch_processor(store, ppl_ceiling=ceiling)
        retrain_kw = dict(ppl=_docs(spark, VOC_B, 903))
    else:
        raise SystemExit(f"unknown gate arm {gate!r}")

    print(f"=== arm: {gate} ===")
    print(f"{'epoch':>5} {'phase':>7} {'scored':>7} {'dropped':>8} {'accept':>7} {'wall_s':>7}")

    def epoch_row(epoch):
        return (
            read_gate_stats(spark, store)
            .where(f"epoch = {epoch} AND gate = '{gate}'")
            .collect()[0]
        )

    rates = {}
    for epoch in range(2 * epochs_per_phase):
        voc = VOC_A if epoch < epochs_per_phase else VOC_B
        phase = "A" if epoch < epochs_per_phase else "B-shift"
        t0 = time.perf_counter()
        process(_docs(spark, voc, epoch), epoch)
        wall = time.perf_counter() - t0
        row = epoch_row(epoch)
        rate = (row["n_scored"] - row["n_dropped"]) / row["n_scored"]
        rates[epoch] = rate
        print(
            f"{epoch:>5} {phase:>7} {row['n_scored']:>7} {row['n_dropped']:>8}"
            f" {rate:>7.3f} {wall:>7.2f}"
        )
    a_rates = [rates[e] for e in range(epochs_per_phase)]
    b_rates = [rates[e] for e in range(epochs_per_phase, 2 * epochs_per_phase)]
    assert min(a_rates) > 0.9, f"{gate}: phase A should accept, got {a_rates}"
    assert max(b_rates) < 0.1, f"{gate}: shift should starve, got {b_rates}"

    # no-op control: over the FULL window the shift dilutes to ~0.5
    # acceptance — a floor below that (0.4) does not trigger, showing
    # the band is a real policy knob, not a hair trigger
    pre = text_gate_retrain_if(spark, store, accept_floor=0.4, window=2 * epochs_per_phase)
    print(f"full-window rate (diluted): {pre[gate]['rate']}, triggered={pre[gate]['triggered']} (floor 0.4: no-op)")
    assert not pre[gate]["triggered"]

    res = text_gate_retrain_if(
        spark, store, accept_floor=0.5, window=epochs_per_phase, **retrain_kw
    )
    print(f"trigger on shifted window: {res[gate]}")
    assert res[gate]["retrained"], f"{gate}: expected the drift trigger to retrain"

    # recovery: same shifted distribution, retrained gate
    for epoch in range(2 * epochs_per_phase, 2 * epochs_per_phase + 2):
        t0 = time.perf_counter()
        process(_docs(spark, VOC_B, epoch), epoch)
        wall = time.perf_counter() - t0
        row = epoch_row(epoch)
        rate = (row["n_scored"] - row["n_dropped"]) / row["n_scored"]
        print(
            f"{epoch:>5} {'B-rec':>7} {row['n_scored']:>7} {row['n_dropped']:>8}"
            f" {rate:>7.3f} {wall:>7.2f}"
        )
        assert rate > 0.9, f"{gate}: retrained gate should accept, got {rate}"
    print(f"RECOVERED ({gate}): the retrained gate accepts the shifted distribution")


def main(epochs_per_phase: int = 5, gate: str = "all") -> None:
    spark = get_spark("gate-drift-soak")
    spark.range(1000).selectExpr("sum(id)").collect()
    arms = ["dsir", "quality", "ppl"] if gate == "all" else [gate]
    for g in arms:
        _run_arm(spark, g, epochs_per_phase)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 5,
        sys.argv[2] if len(sys.argv) > 2 else "all",
    )
