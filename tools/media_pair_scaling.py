"""Scale curves for the multimodal batch pair operators (round-12,
VERDICT r11 #6) → the SCALING.md media-pair section.

The claim under test: the image/video/audio near-dup pair stages are
BANDED (signature equality or banded-Hamming is the candidate key),
so wall time grows ~linearly with corpus size — never quadratically —
exactly like the text dedup family measured in dedup_scaling.py. The
fixture corpus grows 1x -> 4x -> 16x by salting extra document copies
(each salt yields distinct payloads, so the pair structure stays
sparse and the measurement isolates the candidate/verify machinery,
not a degenerate everything-matches blowup).

The signature/unit build (decode + dHash / envelope) is materialized
BEFORE the timed window: it is one linear kernel pass measured by the
ingest soak; the quadratic risk lives in the pair stage, so that is
what the curve times. Sub-quadratic = the 4x-growth wall ratio stays
near 4 (linear) and far from 16 (quadratic) once fixed costs
amortize.

Usage: python tools/media_pair_scaling.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from orestes_spark.operators import dedup, multimodal as mm
from orestes_spark.session import get_spark
from orestes_spark.sources.testdata import load_table


def _grown(d, factor: int):
    """1x/4x/16x corpus growth by salted copies: copy s of doc i gets
    text 's<s>: <text>' (fresh md5 world -> distinct images/videos/
    audio) and id i*64+s (disjoint id space)."""
    parts = [
        d.select(
            (F.col("doc_id") * 64 + F.lit(s)).alias("doc_id"),
            F.concat(F.lit(f"s{s}: "), F.col("text")).alias("text"),
        )
        for s in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


ARMS = [
    (
        "image(phash)",
        lambda docs: mm.synth_ppm_pair_dhash(docs, "doc_id", "text"),
        lambda units: dedup.simhash_near_pairs(units, 3, 64, 16),
    ),
    (
        "video(frames)",
        lambda docs: mm.synth_video_pair_frame_dhash(docs, "doc_id", "text"),
        lambda units: mm.video_near_pairs(units, min_frames=2),
    ),
    (
        "audio(envelope)",
        lambda docs: mm.synth_wav_pair_envelope(docs, "doc_id", "text"),
        lambda units: mm.audio_near_pairs(units, min_windows=2),
    ),
]


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("media-pair-scaling")
    spark.range(1000).selectExpr("sum(id)").collect()
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    print("| modality | growth | units | pairs | pair-stage s | units/s | wall ratio vs prev |")
    print("|---|---|---|---|---|---|---|")
    for name, build, pair_stage in ARMS:
        prev = None
        for factor in (1, 4, 16):
            docs = _grown(base, factor)
            units = build(docs).localCheckpoint()  # materialized pre-window
            n_units = units.count()
            t0 = time.perf_counter()
            n_pairs = pair_stage(units).count()
            dt = time.perf_counter() - t0
            ratio = f"{dt / prev:.2f}x" if prev else "-"
            print(
                f"| {name} | {factor}x | {n_units:,} | {n_pairs:,} |"
                f" {dt:.2f} | {n_units / dt:,.0f} | {ratio} |"
            )
            prev = dt
            units.unpersist()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
