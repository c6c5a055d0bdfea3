"""Media-ingest gate growth soak → the SCALING.md streaming-media row.

The claim under test (round-11): with the perceptual dedup gate armed
— within-batch banded-Hamming keep-min plus the cross-batch probe of
the durable phash_bands index — per-batch wall stays ~flat as the
accepted image corpus grows, because per-batch work is batch-sized
(one decode+dHash pass, batch-side banding, one equi-join against the
index) and the index rows are 24-byte band entries, never payloads.

Each batch: 220 novel images (pass) + 40 2x-resized re-encodes of
images accepted in EARLIER epochs (the cross-batch gate must drop
them — exactness asserted, not just counted) + 20 in-batch upscale
dups (keep-min drops them) + 20 same-id re-deliveries. Constant
composition, so wall growth could only come from corpus-sized
per-batch state — which the design forbids.

Usage: python tools/media_ingest_soak.py [n_batches]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from orestes_spark.session import get_spark


def main(n_batches: int = 10) -> None:
    from orestes_spark.operators import multimodal as mm
    from orestes_spark.streaming.ingest import make_media_batch_processor

    spark = get_spark("media-ingest-soak")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    store = tempfile.mkdtemp(prefix="media_soak_") + "/store"
    process = make_media_batch_processor(store)
    ddl = "media_id LONG, content BINARY"

    def up(payload: bytes) -> bytes:
        m = mm.decode_image(payload)
        return mm.resize_ppm(payload, 2 * m["width"], 2 * m["height"])

    def steal() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    accepted_texts: list[tuple[int, str]] = []  # (media_id, text) accepted so far
    print(f"{'epoch':>5} {'rows':>5} {'accepted':>9} {'index_ids':>10} {'wall_s':>7} {'steal':>6}")
    for e in range(n_batches):
        rows = []
        novel = []
        for i in range(220):
            mid = e * 1000 + i
            txt = f"soak image e{e} i{i}"
            rows.append((mid, mm.synth_ppm_img(txt)))
            novel.append((mid, txt))
        if accepted_texts:
            for j in range(40):  # re-encodes of earlier accepts: must drop
                src_mid, src_txt = accepted_texts[(e * 7 + j) % len(accepted_texts)]
                rows.append((e * 1000 + 500 + j, up(mm.synth_ppm_img(src_txt))))
            for j in range(20):  # same-id re-deliveries: must drop
                src_mid, src_txt = accepted_texts[(e * 3 + j) % len(accepted_texts)]
                rows.append((src_mid, mm.synth_ppm_img(src_txt)))
        for j in range(20):  # in-batch dups of this batch's novels
            mid, txt = novel[j]
            rows.append((e * 1000 + 800 + j, up(mm.synth_ppm_img(txt))))
        batch = spark.createDataFrame(rows, ddl)
        s0, t0 = steal(), time.perf_counter()
        process(batch, e)
        wall, ds = time.perf_counter() - t0, steal() - s0
        ids = {r["media_id"] for r in spark.read.parquet(f"{store}/media").collect()}
        new_ids = [m for m, _ in novel if m in ids]
        # the DROP side is exact by construction (pigeonhole banding +
        # bit_count verify have no false negatives WHILE no band bucket
        # exceeds the pair stages' max_bucket stop-key — never hit at
        # soak scale, and the stages log the cut if it fires): every planted
        # re-encode, in-batch dup, and re-delivery MUST be rejected
        assert not any(e * 1000 + 500 + j in ids for j in range(40))
        assert not any(e * 1000 + 800 + j in ids for j in range(20))
        # the ACCEPT side tolerates genuine near-collisions: two
        # unrelated fixture images landing within Hamming 3 is the
        # detector firing, not a bug (observed ~1/220 per epoch on the
        # structured 16-byte-pattern space); a real corpus tunes
        # max_hamming for its measured collision rate
        assert len(new_ids) >= 210, (e, len(new_ids))
        accepted_texts.extend((m, t) for m, t in novel if m in ids)
        print(f"{e:>5} {len(rows):>5} {len(new_ids):>9} {len(ids):>10} {wall:>7.2f} {ds:>6}")
    print("gate exact at every epoch; per-batch wall vs index growth above")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
