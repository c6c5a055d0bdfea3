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

Usage: python tools/gate_drift_soak.py [epochs_per_phase]
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


def main(epochs_per_phase: int = 5) -> None:
    from orestes_spark.streaming.ingest import (
        make_corpus_batch_processor,
        prepare_dsir_gate,
        read_gate_stats,
        text_gate_retrain_if,
    )

    spark = get_spark("gate-drift-soak")
    spark.range(1000).selectExpr("sum(id)").collect()
    store = tempfile.mkdtemp(prefix="gate_drift_") + "/store"
    target_a = _docs(spark, VOC_A, 900)
    raw_mix = _docs(spark, VOC_A, 901, 100).unionByName(_docs(spark, VOC_B, 902, 100))
    prepare_dsir_gate(target_a, raw_mix, store)
    process = make_corpus_batch_processor(store, dsir_floor=0.0)

    print(f"{'epoch':>5} {'phase':>6} {'scored':>7} {'dropped':>8} {'accept':>7} {'wall_s':>7}")
    for epoch in range(2 * epochs_per_phase):
        voc = VOC_A if epoch < epochs_per_phase else VOC_B
        phase = "A" if epoch < epochs_per_phase else "B-shift"
        t0 = time.perf_counter()
        process(_docs(spark, voc, epoch), epoch)
        wall = time.perf_counter() - t0
        row = (
            read_gate_stats(spark, store)
            .where(f"epoch = {epoch} AND gate = 'dsir'")
            .collect()[0]
        )
        rate = (row["n_scored"] - row["n_dropped"]) / row["n_scored"]
        print(
            f"{epoch:>5} {phase:>6} {row['n_scored']:>7} {row['n_dropped']:>8}"
            f" {rate:>7.3f} {wall:>7.2f}"
        )

    # no-op control: over the FULL window the shift dilutes to ~0.5
    # acceptance — a floor below that (0.4) does not trigger, showing
    # the band is a real policy knob, not a hair trigger
    pre = text_gate_retrain_if(spark, store, accept_floor=0.4, window=2 * epochs_per_phase)
    print(f"full-window rate (diluted): {pre['dsir']['rate']}, triggered={pre['dsir']['triggered']} (floor 0.4: no-op)")
    assert not pre["dsir"]["triggered"]

    target_b = _docs(spark, VOC_B, 903)
    res = text_gate_retrain_if(
        spark, store, accept_floor=0.5, window=epochs_per_phase,
        dsir=(target_b, raw_mix),
    )
    print(f"trigger on shifted window: {res['dsir']}")
    assert res["dsir"]["retrained"], "expected the drift trigger to retrain"

    # recovery: same shifted distribution, retrained gate
    for epoch in range(2 * epochs_per_phase, 2 * epochs_per_phase + 2):
        t0 = time.perf_counter()
        process(_docs(spark, VOC_B, epoch), epoch)
        wall = time.perf_counter() - t0
        row = (
            read_gate_stats(spark, store)
            .where(f"epoch = {epoch} AND gate = 'dsir'")
            .collect()[0]
        )
        rate = (row["n_scored"] - row["n_dropped"]) / row["n_scored"]
        print(
            f"{epoch:>5} {'B-rec':>6} {row['n_scored']:>7} {row['n_dropped']:>8}"
            f" {rate:>7.3f} {wall:>7.2f}"
        )
        assert rate > 0.9, f"retrained gate should accept the shifted corpus, got {rate}"
    print("RECOVERED: the retrained gate accepts the shifted distribution")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
