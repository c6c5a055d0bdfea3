"""Soak the streaming embedding-ingest gate: per-epoch wall clock as
the durable semantic index grows.

The claim under test (SCALING.md): per-batch work is BATCH-sized, not
corpus-sized — the index read prunes to the cells the batch touches
(cluster partition column), the quantizer is frozen (no per-epoch
re-aggregation), and the only corpus-growth cost is file listing,
which the compaction slot owns. If any per-epoch step secretly scaled
with the corpus, the epoch wall would climb with the index row count.

Usage: python tools/embedding_ingest_soak.py [epochs] [batch_rows] [kernel]
Prints one line per epoch (epoch, index_rows, wall_s) and a
head-window/tail-window mean comparison (windows never overlap:
min(3, epochs // 2) epochs each).
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orestes_spark.session import get_spark  # noqa: E402
from orestes_spark.streaming.ingest import make_embedding_batch_processor  # noqa: E402


def main(
    epochs: int = 24, batch_rows: int = 400, kernel: str = "expr",
    dim: int = 32, k: int = 8,
) -> None:
    spark = get_spark("emb-ingest-soak")
    store = tempfile.mkdtemp(prefix="emb_soak_") + "/store"
    process = make_embedding_batch_processor(store, threshold=0.9, kernel=kernel)
    rng = np.random.default_rng(7)
    # k well-separated label directions so the frozen quantizer has
    # meaningful cells
    dirs = rng.normal(size=(k, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    accepted_pool: list[np.ndarray] = []
    next_id = 0
    walls = []
    for ep in range(epochs):
        rows = []
        for _ in range(batch_rows):
            lab = int(rng.integers(k))
            if accepted_pool and rng.random() < 0.3:
                # near-dup of an already-accepted vector → should be
                # rejected against the index
                v = accepted_pool[int(rng.integers(len(accepted_pool)))]
                v = v + rng.normal(scale=1e-3, size=dim)
            else:
                v = dirs[lab] + rng.normal(scale=0.3, size=dim)
            rows.append((next_id, lab, [float(x) for x in v]))
            if len(accepted_pool) < 2000:
                accepted_pool.append(np.asarray(rows[-1][2]))
            next_id += 1
        batch = spark.createDataFrame(
            rows, "vec_id LONG, label LONG, embedding ARRAY<DOUBLE>"
        )
        t0 = time.perf_counter()
        process(batch, ep)
        wall = time.perf_counter() - t0
        walls.append(wall)
        idx_rows = spark.read.parquet(f"{store}/vecs").count()
        print(f"epoch={ep:3d} index_rows={idx_rows:7d} wall_s={wall:6.2f}", flush=True)
    w = max(1, min(3, len(walls) // 2))  # non-overlapping windows
    head = sum(walls[:w]) / w
    tail = sum(walls[-w:]) / w
    print(
        f"first-{w} mean {head:.2f}s, last-{w} mean {tail:.2f}s, "
        f"ratio {tail / head:.2f}x over {epochs} epochs "
        f"({spark.read.parquet(store + '/vecs').count()} indexed rows)"
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 24,
        int(sys.argv[2]) if len(sys.argv) > 2 else 400,
        sys.argv[3] if len(sys.argv) > 3 else "expr",
    )
