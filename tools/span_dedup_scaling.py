"""Span-dedup scaling measurement → the SCALING.md span-dedup row.

The claim under test: repeated_spans is LINEAR in corpus tokens —
every stage is a hash groupBy / semi-join / per-doc window; there is
no pairwise candidate stage anywhere, so (unlike the LSH paths, which
cap bucket fan-out with max_bucket) nothing can go quadratic. The
hot-group concern is different: a boilerplate k-gram repeated R times
contributes R flagged rows (linear), and max_count exists to drop
such groups as policy, not to bound complexity.

Measured here: wall across sf0.001 -> sf0.1 (100x docs), a steady
state re-run, and a worst-case corpus where HALF of every document is
one shared boilerplate span (the hottest possible group) at 1x / 4x /
16x docs — the wall must scale ~linearly with corpus size even
though one span hash holds |corpus| occurrences.

Usage: python tools/span_dedup_scaling.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from orestes_spark.operators import dedup
from orestes_spark.session import get_spark
from orestes_spark.sources.testdata import load_table


def main() -> None:
    spark = get_spark("span-dedup-scaling")
    spark.range(1000).selectExpr("sum(id)").collect()

    print("| corpus (docs) | repeated_spans s | docs/s |")
    print("|---|---|---|")
    for sf in ("0.001", "0.01", "0.1"):
        d = load_table(spark, f"/root/testdata/sf{sf}", "documents")
        n = d.count()
        t0 = time.perf_counter()
        dedup.repeated_spans(d, "doc_id", "text", k=8).collect()
        dt = time.perf_counter() - t0
        print(f"| {n:,} | {dt:.2f} | {n / dt:,.0f} |")
    d = load_table(spark, "/root/testdata/sf0.1", "documents")
    n = d.count()
    t0 = time.perf_counter()
    dedup.repeated_spans(d, "doc_id", "text", k=8).collect()
    dt = time.perf_counter() - t0
    print(f"| {n:,} (steady state) | {dt:.2f} | {n / dt:,.0f} |")

    # Worst case: one 20-token boilerplate span shared by EVERY doc
    # (plus 20 unique tokens per doc). The span hash's group holds
    # |corpus| occurrences — if anything in the pipeline paired
    # occurrences, 16x docs would cost 256x.
    print()
    print("| boilerplate corpus (docs) | repeated_spans s | flagged spans |")
    print("|---|---|---|")
    boiler = " ".join(f"b{i}" for i in range(20))
    base = 20_000
    for mult in (1, 4, 16):
        n = base * mult
        docs = spark.range(n).selectExpr(
            "id AS doc_id",
            f"concat('{boiler} ', 'u', id, ' x', id * 7, ' y', id * 13, ' z', id * 29)"
            " AS text",
        )
        t0 = time.perf_counter()
        cnt = dedup.repeated_spans(docs, "doc_id", "text", k=8).count()
        dt = time.perf_counter() - t0
        print(f"| {n:,} | {dt:.2f} | {cnt:,} |")


def incremental(spark=None) -> None:
    """Per-ingest cost vs corpus growth: a FIXED 5k-doc batch flagged
    against persisted span indices of 1x/4x/16x corpora. The index
    build is charged separately (once per corpus); the per-batch flag
    step must stay map-side (no corpus shuffle) — its wall may grow
    with the linear index SCAN but never with a shuffle of it."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    if spark is None:
        spark = get_spark("span-dedup-scaling")
    boiler = " ".join(f"s{i}" for i in range(10))
    batch = spark.range(5_000).selectExpr(
        "id + 10000000 AS doc_id",
        f"concat('{boiler} ', 'q', id, ' r', id * 3, ' s', id * 11, ' t', id * 17) AS text",
    ).localCheckpoint()
    print()
    print("| indexed corpus (docs) | index build s | batch flag s | flagged docs |")
    print("|---|---|---|---|")
    for mult in (1, 4, 16):
        n = 20_000 * mult
        corpus = spark.range(n).selectExpr(
            "id AS doc_id",
            f"concat('{boiler} ', 'u', id, ' x', id * 7, ' y', id * 13, ' z', id * 29) AS text",
        )
        d = tempfile.mkdtemp(prefix="span_idx_")
        t0 = time.perf_counter()
        dedup.span_index(corpus, "doc_id", "text", k=8).write.parquet(f"{d}/idx")
        t_build = time.perf_counter() - t0
        idx = spark.read.parquet(f"{d}/idx")
        t0 = time.perf_counter()
        flagged = dedup.incremental_repeated_spans(
            batch, idx, "doc_id", "text", k=8
        ).select("doc_id").distinct().count()
        t_flag = time.perf_counter() - t0
        print(f"| {n:,} | {t_build:.2f} | {t_flag:.2f} | {flagged:,} |")
        shutil.rmtree(d, ignore_errors=True)


def bucket_pruning(spark=None) -> None:
    """Round-9 (verdict #3): the hash-range-bucketed index. A SMALL
    batch (one ~200-token document) probed against 1x/4x/16x corpora
    indexed with buckets=256 and written partitionBy("hb"): the probe
    collects the batch's touched buckets and filters with literals, so
    the parquet scan partition-prunes to |touched|/256 of the index.
    Reported: total index bytes vs bytes under touched partitions
    (what the pruned scan can read at most) and the probe wall pruned
    vs unpruned — per-batch index I/O must DROP with pruning and stay
    ~flat as a fraction while the corpus grows 16x."""
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    if spark is None:
        spark = get_spark("span-dedup-scaling")
    buckets = 256
    boiler = " ".join(f"s{i}" for i in range(10))
    # one document: the per-ingest shape where pruning matters most
    batch = spark.range(1).selectExpr(
        "id + 10000000 AS doc_id",
        f"concat('{boiler} ', "
        + ", ' ', ".join(f"'w{j}', id * {2 * j + 1}" for j in range(100))
        + ") AS text",
    ).localCheckpoint()
    print()
    print("| indexed corpus (docs) | index MiB | touched buckets | touched MiB | probe s pruned | probe s full |")
    print("|---|---|---|---|---|---|")
    for mult in (1, 4, 16):
        n = 20_000 * mult
        corpus = spark.range(n).selectExpr(
            "id AS doc_id",
            f"concat('{boiler} ', 'u', id, ' x', id * 7, ' y', id * 13, ' z', id * 29) AS text",
        )
        d = tempfile.mkdtemp(prefix="span_idx_bkt_")
        dedup.span_index(corpus, "doc_id", "text", k=8, buckets=buckets).write.partitionBy(
            "hb"
        ).parquet(f"{d}/idx")
        idx = spark.read.parquet(f"{d}/idx")
        total_b = sum(p.stat().st_size for p in Path(f"{d}/idx").rglob("*.parquet"))
        touched = sorted(
            r[0]
            for r in dedup._kgram_starts(batch, "doc_id", "text", 8)
            .select(F.pmod(F.col("h"), F.lit(buckets)).cast("int").alias("hb"))
            .distinct()
            .collect()
        )
        touched_b = sum(
            p.stat().st_size
            for hb in touched
            for p in Path(f"{d}/idx/hb={hb}").rglob("*.parquet")
        )
        t0 = time.perf_counter()
        dedup.incremental_repeated_spans(
            batch, idx, "doc_id", "text", k=8, buckets=buckets
        ).count()
        t_pruned = time.perf_counter() - t0
        t0 = time.perf_counter()
        # the FULL baseline must really scan everything: drop the
        # self-describing columns or the probe auto-detects nb and
        # prunes, silently measuring the pruned path twice
        dedup.incremental_repeated_spans(
            batch, idx.drop("hb", "nb"), "doc_id", "text", k=8
        ).count()
        t_full = time.perf_counter() - t0
        print(
            f"| {n:,} | {total_b / 2**20:.1f} | {len(touched)}/{buckets} "
            f"| {touched_b / 2**20:.2f} | {t_pruned:.2f} | {t_full:.2f} |"
        )
        shutil.rmtree(d, ignore_errors=True)


def bloom_pruning(spark=None) -> None:
    """Round-10 (verdict #3): the Bloom sidecar on top of bucket
    pruning. Same one-document probe shape as bucket_pruning, but the
    batch hash set is pre-filtered through the touched buckets' Bloom
    blobs BEFORE the index scan, so the exact semi-join only reads
    buckets holding a SURVIVING hash. For this mostly-novel batch the
    surviving set collapses to the few true boilerplate hits (+ the
    ~p false-positive trickle), so scanned bytes drop from the
    touched-partition bound to near-zero while the spans stay
    IDENTICAL (asserted). Reported per corpus size: touched vs
    surviving buckets/bytes, probe wall with bucket pruning alone vs
    with the sidecar, and the sidecar's own size + build time."""
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    if spark is None:
        spark = get_spark("span-dedup-scaling")
    buckets = 256
    boiler = " ".join(f"s{i}" for i in range(10))
    batch = spark.range(1).selectExpr(
        "id + 10000000 AS doc_id",
        f"concat('{boiler} ', "
        + ", ' ', ".join(f"'w{j}', id * {2 * j + 1}" for j in range(100))
        + ") AS text",
    ).localCheckpoint()
    print()
    print(
        "| corpus (docs) | index MiB | sidecar MiB (build s) | touched bkts/MiB "
        "| surviving bkts/MiB | probe s pruned | probe s bloom | spans |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for mult in (1, 4, 16):
        n = 20_000 * mult
        corpus = spark.range(n).selectExpr(
            "id AS doc_id",
            f"concat('{boiler} ', 'u', id, ' x', id * 7, ' y', id * 13, ' z', id * 29) AS text",
        )
        d = tempfile.mkdtemp(prefix="span_idx_bloom_")
        dedup.span_index(corpus, "doc_id", "text", k=8, buckets=buckets).write.partitionBy(
            "hb"
        ).parquet(f"{d}/idx")
        idx = spark.read.parquet(f"{d}/idx")
        total_b = sum(p.stat().st_size for p in Path(f"{d}/idx").rglob("*.parquet"))
        t0 = time.perf_counter()
        dedup.span_bloom(idx, bits=1 << 17, hashes=4).write.parquet(f"{d}/bloom")
        t_build = time.perf_counter() - t0
        bloom = spark.read.parquet(f"{d}/bloom")
        bloom_b = sum(p.stat().st_size for p in Path(f"{d}/bloom").rglob("*.parquet"))

        kg = dedup._kgram_starts(batch, "doc_id", "text", 8).localCheckpoint()
        hb_of = F.pmod(F.col("h"), F.lit(buckets)).cast("int").alias("hb")
        touched = sorted(
            r[0] for r in kg.select(hb_of).distinct().collect()
        )
        survivors, _ = dedup._bloom_prefilter(kg.select("h").distinct(), bloom, buckets)
        surviving = sorted(r[0] for r in survivors.select(hb_of).distinct().collect())

        def part_bytes(bks):
            return sum(
                p.stat().st_size
                for hb in bks
                for p in Path(f"{d}/idx/hb={hb}").rglob("*.parquet")
            )

        t0 = time.perf_counter()
        plain = dedup.incremental_repeated_spans(
            batch, idx, "doc_id", "text", k=8, buckets=buckets
        ).collect()
        t_pruned = time.perf_counter() - t0
        t0 = time.perf_counter()
        with_bloom = dedup.incremental_repeated_spans(
            batch, idx, "doc_id", "text", k=8, buckets=buckets, bloom=bloom
        ).collect()
        t_bloom = time.perf_counter() - t0
        assert {tuple(r) for r in with_bloom} == {tuple(r) for r in plain}, "bloom changed the spans"
        print(
            f"| {n:,} | {total_b / 2**20:.1f} | {bloom_b / 2**20:.2f} ({t_build:.1f}) "
            f"| {len(touched)}/{part_bytes(touched) / 2**20:.2f} "
            f"| {len(surviving)}/{part_bytes(surviving) / 2**20:.3f} "
            f"| {t_pruned:.2f} | {t_bloom:.2f} | {len(with_bloom)} == {len(plain)} |"
        )
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) > 1:
        {"main": main, "incremental": incremental,
         "bucket_pruning": bucket_pruning, "bloom_pruning": bloom_pruning}[_sys.argv[1]]()
    else:
        main()
        incremental()
        bucket_pruning()
        bloom_pruning()
