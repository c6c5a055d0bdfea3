"""Video/audio media-ingest gate growth soak (round-12, VERDICT r11
#1) → the SCALING.md streaming-media rows for the aligned-unit
modalities.

The claim under test: with the aligned-unit dedup gate armed —
within-batch aligned_near_pairs keep-min plus the cross-batch
incremental_aligned_pairs probe of the durable unit_sigs index —
per-batch wall stays ~flat as the accepted corpus grows, because
per-batch work is batch-sized (one decode pass, one equi-join on
(idx, sig) against the index) and index rows are 12-16 byte unit
entries, never payloads.

Each batch, per modality: 110 novel files (pass) + 20 re-encodes of
files accepted in EARLIER epochs (video: real frame-by-frame 2x
upscales; audio: re-renders with different waveform micro-structure —
the cross-batch gate must drop them, exactness asserted) + 10
in-batch re-encode dups (keep-min drops) + 10 same-id re-deliveries.
Constant composition, so wall growth could only come from
corpus-sized per-batch state — which the design forbids.

Usage: python tools/av_ingest_soak.py [n_batches] [video|audio|both]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from orestes_spark.session import get_spark


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _upv(mm, payload: bytes) -> bytes:
    """Real video re-encode: demux, 2x-upscale every frame, remux."""
    outs = []
    for fr in mm.decode_video(payload):
        m = mm.decode_image(fr)
        outs.append(mm.resize_ppm(fr, 2 * m["width"], 2 * m["height"]))
    return f"PV{len(outs)}\n".encode() + b"".join(outs)


def run_modality(
    spark, modality: str, n_batches: int, index_buckets: int | None = None
) -> None:
    from orestes_spark.operators import multimodal as mm
    from orestes_spark.streaming.ingest import make_media_batch_processor

    store = tempfile.mkdtemp(prefix=f"av_soak_{modality}_") + "/store"
    process = make_media_batch_processor(
        store, modality=modality, index_buckets=index_buckets
    )
    ddl = "media_id LONG, content BINARY"

    def synth(txt: str) -> bytes:
        if modality == "video":
            return mm.synth_video(txt)
        return mm.synth_wav_segments(txt, "h1")

    def reencode(txt: str, payload: bytes) -> bytes:
        if modality == "video":
            return _upv(mm, payload)
        return mm.synth_wav_segments(txt, "h2")  # same envelope, new bytes

    accepted: list[tuple[int, str]] = []
    print(f"=== modality: {modality} ===")
    print(f"{'epoch':>5} {'rows':>5} {'accepted':>9} {'index_ids':>10} {'wall_s':>7} {'steal':>6}")
    for e in range(n_batches):
        rows, novel = [], []
        for i in range(110):
            mid, txt = e * 1000 + i, f"soak {modality} e{e} i{i}"
            rows.append((mid, synth(txt)))
            novel.append((mid, txt))
        if accepted:
            for j in range(20):  # re-encodes of earlier accepts: must drop
                _, src_txt = accepted[(e * 7 + j) % len(accepted)]
                rows.append((e * 1000 + 500 + j, reencode(src_txt, synth(src_txt))))
            for j in range(10):  # same-id re-deliveries: must drop
                src_mid, src_txt = accepted[(e * 3 + j) % len(accepted)]
                rows.append((src_mid, synth(src_txt)))
        for j in range(10):  # in-batch re-encode dups of this batch's novels
            mid, txt = novel[j]
            rows.append((e * 1000 + 800 + j, reencode(txt, synth(txt))))
        batch = spark.createDataFrame(rows, ddl)
        s0, t0 = steal(), time.perf_counter()
        process(batch, e)
        wall, ds = time.perf_counter() - t0, steal() - s0
        ids = {r["media_id"] for r in spark.read.parquet(f"{store}/media").collect()}
        new_ids = [m for m, _ in novel if m in ids]
        # the DROP side is exact while no unit bucket exceeds the pair
        # stages' max_bucket stop-key (never hit at soak scale; the
        # stages log the cut if it fires): every planted re-encode,
        # in-batch dup, and re-delivery MUST be rejected
        assert not any(e * 1000 + 500 + j in ids for j in range(20))
        assert not any(e * 1000 + 800 + j in ids for j in range(10))
        # the ACCEPT side tolerates genuine near-collisions (two
        # fixtures sharing >= 2 aligned unit signatures is the
        # detector firing, not a bug)
        assert len(new_ids) >= 100, (e, len(new_ids))
        accepted.extend((m, t) for m, t in novel if m in ids)
        print(f"{e:>5} {len(rows):>5} {len(new_ids):>9} {len(ids):>10} {wall:>7.2f} {ds:>6}")
    print(f"gate exact at every epoch ({modality}); per-batch wall vs index growth above")


def main(
    n_batches: int = 10, which: str = "both", index_buckets: int | None = None
) -> None:
    spark = get_spark("av-ingest-soak")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    for modality in ("video", "audio") if which == "both" else (which,):
        run_modality(spark, modality, n_batches, index_buckets)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 10,
        sys.argv[2] if len(sys.argv) > 2 else "both",
        int(sys.argv[3]) if len(sys.argv) > 3 else None,
    )
