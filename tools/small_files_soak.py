"""Small-files steady-state soak (round-7 verdict task): drive 200+
streaming epochs through the real ingest commit path with the
auto-compaction policy ON and measure what a long-lived stream
actually experiences — per-bucket file count and full-read latency
sampled along the way.

Round 6 measured the failure mode (200 uncompacted epochs → 1,000
point files → 17× read slowdown until a MANUAL compact). This soak
shows the `auto_compact_files` policy — wired into the ingest loop
after every committed epoch via `engine.compact_if` — keeps both
bounded with no maintenance window: the file count saw-tooths under
the threshold and read latency stays flat for the whole run.

Each epoch goes through `make_batch_processor` (the exact function
`start_ingest` hands to foreachBatch), so the measured path includes
epoch staging, manifest commit, marker pruning, and the post-commit
compaction hook — not a simplified stand-in. A control run with the
policy OFF on a second space shows the unbounded growth it prevents.

Run: python tools/small_files_soak.py [epochs] [rows_per_epoch]
Prints one sample line per 20 epochs; numbers go to SCALING.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import shutil
import tempfile

from orestes_spark.config import SpaceConfig
from orestes_spark.engine import OrestesEngine
from orestes_spark.session import get_spark
from orestes_spark.streaming.ingest import RAW_DDL, make_batch_processor

START = 1_700_000_000_000
MAX_FILES = 16


def _rows(epoch: int, n: int):
    # spread each epoch across the SAME day bucket so fragmentation
    # concentrates where it hurts (granularity=1 → one bucket/day)
    return [
        (str(START + (epoch * n + i) * 250), float(i), {"host": "soak"})
        for i in range(n)
    ]


def run(spark, root: str, epochs: int, per_epoch: int, auto: int | None):
    eng = OrestesEngine(spark, root, spaces={"default": SpaceConfig(1)})
    process = make_batch_processor(
        eng,
        "default",
        epochs_dir=root + "/_marks",
        auto_compact_files=auto,
        stream_ns="file:" + root,
    )
    samples = []
    t_ingest = 0.0
    for e in range(epochs):
        batch = spark.createDataFrame(_rows(e, per_epoch), RAW_DDL)
        t0 = time.perf_counter()
        process(batch, e)
        t_ingest += time.perf_counter() - t0
        if (e + 1) % 20 == 0:
            st = eng.stats("default")
            nfiles = sum(i["files"] for i in st["points"].values())
            markers = len(list((eng._points_path("default") / "_epochs").glob("epoch-*")))
            t0 = time.perf_counter()
            n = eng.read(None, "default", 0, 2 * START, grouped=False).count()
            t_read = time.perf_counter() - t0
            samples.append((e + 1, nfiles, markers, t_read))
            print(
                f"  epoch {e + 1:>3}: point_files={nfiles:>4} markers={markers:>3} "
                f"read={t_read:.2f}s rows={n}",
                flush=True,
            )
    return samples, t_ingest


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 220
    per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark()
    for label, auto in (("policy ON (auto_compact_files=16)", MAX_FILES), ("policy OFF", None)):
        root = tempfile.mkdtemp(prefix="orestes_soak_")
        print(f"{label}: {epochs} epochs x {per_epoch} rows", flush=True)
        samples, t_ingest = run(spark, root, epochs, per_epoch, auto)
        reads = [s[3] for s in samples]
        files = [s[1] for s in samples]
        print(
            f"{label}: ingest_total={t_ingest:.1f}s "
            f"files min/max={min(files)}/{max(files)} "
            f"read first/median/last={reads[0]:.2f}/{sorted(reads)[len(reads) // 2]:.2f}/"
            f"{reads[-1]:.2f}s",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
