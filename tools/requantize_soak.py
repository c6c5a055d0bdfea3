"""Soak the self-healing quantizer policy (requantize_if /
auto_requantize_cell_rows): a drifting Zipf stream piles accepted
vectors into one frozen cell, per-epoch dedup wall climbs with the
hot cell (O(|batch| x hottest-cell rows)), the trigger trips on the
store's own per-cell stats, retrains, and the wall returns to the
flat band.

Two runs over IDENTICAL pre-generated batches:
  A: auto_requantize_cell_rows wired into the foreachBatch processor
  B: no auto; the operator runs the same policy by hand
     (requantize_if) after every epoch
and the final stores must be BYTE-IDENTICAL (same kept ids, same
quantized vectors, same cells) — the trigger changes when maintenance
runs, never what the gate decides.

Usage: python tools/requantize_soak.py [epochs] [batch_rows] [cap]
Prints one line per (run, epoch) and the equality verdict; numbers go
to SCALING.md.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orestes_spark.session import get_spark  # noqa: E402
from orestes_spark.streaming.ingest import (  # noqa: E402
    make_embedding_batch_processor,
    requantize_if,
)

DDL = "vec_id LONG, label LONG, embedding ARRAY<DOUBLE>"


def gen_batches(epochs: int, batch_rows: int, dim: int = 32, k: int = 8, seed: int = 11):
    """Deterministic drifting-Zipf stream: epoch 0 balanced over k
    well-separated directions (so the frozen bootstrap earns k real
    cells); later epochs draw directions Zipf(1.5)-skewed with the
    hot rank pinned to direction 0 — the drift the bootstrap never
    saw. Noise scale 0.5 keeps same-cell vectors below the 0.9
    accept threshold (distinct, so the hot CELL grows)."""
    rng = np.random.default_rng(seed)
    dirs = np.zeros((k, dim))
    for j in range(k):
        dirs[j, j] = 1.0
    zipf_w = np.array([1.0 / (r + 1) ** 1.5 for r in range(k)])
    zipf_w /= zipf_w.sum()
    batches, next_id = [], 0
    for ep in range(epochs):
        rows = []
        for _ in range(batch_rows):
            j = int(rng.integers(k)) if ep == 0 else int(rng.choice(k, p=zipf_w))
            v = dirs[j] + rng.normal(scale=0.5, size=dim)
            rows.append((next_id, 0, [float(x) for x in v]))
            next_id += 1
        batches.append(rows)
    return batches


def run(spark, batches, cap, auto: bool, tag: str):
    store = tempfile.mkdtemp(prefix=f"rq_soak_{tag}_") + "/store"
    process = make_embedding_batch_processor(
        store, label_col=None, threshold=0.9, bootstrap_k=8,
        auto_requantize_cell_rows=cap if auto else None,
    )
    walls, fires = [], []
    cents_mtime = None
    for ep, rows in enumerate(batches):
        batch = spark.createDataFrame(rows, DDL)
        t0 = time.perf_counter()
        process(batch, ep)
        if not auto:
            res = requantize_if(spark, store, max_cell_rows=cap)
            if res:
                fires.append((ep, res["k"]))
        wall = time.perf_counter() - t0
        if auto:
            m = os.path.getmtime(f"{store}/cents")
            if cents_mtime is not None and m != cents_mtime:
                fires.append((ep, None))
            cents_mtime = m
        walls.append(wall)
        hot = max(
            r["n"]
            for r in spark.read.parquet(f"{store}/vecs")
            .groupBy("cluster").agg({"*": "count"})
            .withColumnRenamed("count(1)", "n").collect()
        )
        print(f"{tag} epoch={ep:3d} wall_s={wall:6.2f} hottest_cell={hot:6d}", flush=True)
    return store, walls, fires


def snapshot(spark, store):
    vecs = sorted(
        (r["vec_id"], r["label"], tuple(r["vec"]), r["cluster"])
        for r in spark.read.parquet(f"{store}/vecs").collect()
    )
    cents = sorted(
        (r["label"], tuple(r["csum"]))
        for r in spark.read.parquet(f"{store}/cents").collect()
    )
    return vecs, cents


def main(epochs: int = 24, batch_rows: int = 400, cap: int = 3000) -> None:
    spark = get_spark("requantize-soak")
    batches = gen_batches(epochs, batch_rows)
    store_a, walls_a, fires_a = run(spark, batches, cap, auto=True, tag="auto")
    store_b, walls_b, fires_b = run(spark, batches, cap, auto=False, tag="manual")

    same = snapshot(spark, store_a) == snapshot(spark, store_b)
    n = spark.read.parquet(f"{store_a}/vecs").count()
    print(f"auto fires (cents swapped) at epochs: {[e for e, _ in fires_a]}")
    print(f"manual fires at epochs: {fires_b}")
    w = max(1, min(3, len(walls_a) // 2))
    pre = [e for e, _ in fires_a]
    first_fire = pre[0] if pre else epochs
    peak = max(walls_a[:first_fire + 1]) if first_fire < epochs else max(walls_a)
    tail = sum(walls_a[-w:]) / w
    print(
        f"auto: peak pre-fire wall {peak:.2f}s, last-{w} mean {tail:.2f}s, "
        f"{n} kept rows over {epochs} epochs"
    )
    print(f"BYTE-IDENTICAL stores: {same}")
    if not same:
        sys.exit(1)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 24,
        int(sys.argv[2]) if len(sys.argv) > 2 else 400,
        int(sys.argv[3]) if len(sys.argv) > 3 else 3000,
    )
