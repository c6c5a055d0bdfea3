"""Incremental connected-components growth soak → SCALING.md round-10.

The claim under test (round-10 verdict #4): streaming near-dup cluster
ids can be maintained with BATCH-SIZED work instead of the corpus-sized
``neardup_components`` recompute, and stay BYTE-IDENTICAL to that
recompute. Per ingest batch:

1. new edges = within-batch LSH pairs + batch-vs-index pairs
   (``incremental_neardup`` against the appended band index);
2. ``incremental_components`` merges at the component-representative
   level (label propagation on the tiny merge graph, never the corpus)
   and emits a delta carrying ``prev_component``;
3. the label store — parquet partitioned by ``cb = pmod(component,
   P)`` — is updated with the append-heavy production shape: fresh
   and moved rows APPEND (no read), and only the LOSING components'
   partitions (named by the delta's ``prev_component``) are
   read-rewritten to drop the members that moved out. Read-modify
   I/O is therefore bounded by the merge activity, never by how many
   new docs arrived.

Batch composition is constant while the corpus grows ~11x: 300 unique
docs + 50 verbatim copies of random EARLIER docs (new-joins-old,
exercising the fresh path) + 25 within-batch duplicate twin pairs
(each a guaranteed 2-member component) + 8 BRIDGE docs concatenating
two earlier batches' twin texts — with ids monotone a new node can
never become a component min, so bridges are the only way two OLD
components merge, which is exactly the store-relabel path under test
(threshold 0.4: a concatenation's Jaccard against each half is ~0.45,
and no doc can exceed 0.5 against two disjoint halves at once).
Reported per batch: wall, delta rows, losing partitions rewritten (of
P), rows appended, and — at the end — a full
``connected_components`` recompute over every pair ever found,
compared set-equal (byte-identical labels) to the folded store, plus
that recompute's wall for contrast.

Usage: python tools/incremental_cc_soak.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from orestes_spark.operators import dedup
from orestes_spark.session import get_spark

P = 32  # component hash-range partitions of the label store
BATCHES = 10
UNIQUE, COPIES, TWINS, BRIDGES = 300, 50, 25, 8
THRESH = 0.4


def _batch_docs(spark, b: int):
    """Deterministic batch: ids [b*1000, ...); copies duplicate text of
    earlier ids (cross-batch merges), twins duplicate within-batch."""
    base = b * 1000
    uniq = spark.range(UNIQUE).selectExpr(
        f"id + {base} AS doc_id",
        f"concat('u{b}_', id, ' ', 'w', id * 7, ' x', id * 13, ' y', id * 29,"
        " ' alpha beta gamma delta epsilon zeta eta theta') AS text",
    )
    # copy earlier docs: source id = (doc_id * 37) % (base) for b>0,
    # else within-batch older ids — text reproduced by the same formula
    cp = spark.range(COPIES).selectExpr(
        f"id + {base + UNIQUE} AS doc_id",
        f"(id * 37 + {b}) % {max(base, UNIQUE)} AS src",
    )
    cp = cp.selectExpr(
        "doc_id",
        "src - (src % 1000) AS sb",
        "src % 1000 AS si",
    ).where(f"si < {UNIQUE}").selectExpr(
        "doc_id",
        "concat('u', CAST(sb / 1000 AS BIGINT), '_', si, ' ', 'w', si * 7, ' x',"
        " si * 13, ' y', si * 29,"
        " ' alpha beta gamma delta epsilon zeta eta theta') AS text",
    )
    tw = spark.range(TWINS * 2).selectExpr(
        f"id + {base + UNIQUE + COPIES} AS doc_id",
        f"concat('t{b}_', CAST(id / 2 AS BIGINT), ' twin pair text body',"
        " ' alpha beta gamma delta epsilon zeta eta theta iota kappa') AS text",
    )
    out = uniq.unionByName(cp).unionByName(tw)
    if b >= 2:
        def twin_text(bb, ii):
            return (
                f"t{bb}_{ii} twin pair text body"
                " alpha beta gamma delta epsilon zeta eta theta iota kappa"
            )

        rows = []
        for i in range(BRIDGES):
            b1, b2 = (i + b) % b, (i * 3 + 1) % b
            if b1 == b2:
                b2 = (b2 + 1) % b
            rows.append(
                (
                    base + UNIQUE + COPIES + TWINS * 2 + i,
                    twin_text(b1, i % TWINS) + " " + twin_text(b2, (i * 7 + 3) % TWINS),
                )
            )
        out = out.unionByName(
            spark.createDataFrame(rows, "doc_id LONG, text STRING")
        )
    return out


def main() -> None:
    spark = get_spark("incremental-cc-soak")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    root = tempfile.mkdtemp(prefix="cc_soak_")
    store = f"{root}/labels"
    idx_path = f"{root}/bands"
    docs_path = f"{root}/docs"
    total_rewrites: list[int] = []
    pair_frames: list = []

    print("| batch | corpus docs | batch wall s | delta rows | losing parts rewritten | appends |")
    print("|---|---|---|---|---|---|")
    for b in range(BATCHES):
        batch = _batch_docs(spark, b).localCheckpoint()
        t0 = time.perf_counter()
        within = dedup.minhash_lsh_dedup(batch, "doc_id", "text", threshold=THRESH).select("id_a", "id_b")
        if b == 0:
            new_pairs = within
            labels = spark.createDataFrame([], "node LONG, component LONG")
        else:
            corpus_docs = spark.read.parquet(docs_path)
            index = spark.read.parquet(idx_path)
            cross = dedup.incremental_neardup(
                batch, corpus_docs, index, "doc_id", "text", threshold=THRESH
            ).select(F.col("id_new").alias("id_a"), F.col("id_corpus").alias("id_b"))
            new_pairs = within.unionByName(cross)
            labels = spark.read.parquet(store).select("node", "component")
        new_pairs = new_pairs.localCheckpoint()
        delta = dedup.incremental_components(labels, new_pairs).localCheckpoint()
        n_delta = delta.count()
        # losing partitions: only these need read-rewrite (drop rows
        # whose nodes moved to a winner); fresh/moved rows just append
        losing = sorted(
            r[0]
            for r in delta.select(
                F.pmod(F.col("prev_component"), F.lit(P)).cast("int").alias("cb")
            ).where(F.col("cb").isNotNull()).distinct().collect()
        )
        appended = delta.select("node", "component").withColumn(
            "cb", F.pmod(F.col("component"), F.lit(P)).cast("int")
        )
        if b > 0 and losing:
            retained = (
                spark.read.parquet(store)
                .where(F.col("cb").isin(losing))
                .select("node", "component", "cb")
                .join(delta.select("node"), "node", "left_anti")
                .localCheckpoint()
            )
            # dynamic overwrite only replaces partitions present in the
            # frame; a fully-DRAINED partition (every member moved to a
            # winner — e.g. a 2-member twin component bridged away)
            # keeps its stale files, so remove those partition dirs
            # explicitly. The engine's partition-swap protocol is the
            # crash-atomic version of this; a soak tool can rmtree.
            still = {r[0] for r in retained.select("cb").distinct().collect()}
            for drained in set(losing) - still:
                shutil.rmtree(f"{store}/cb={drained}", ignore_errors=True)
            if still:
                retained.coalesce(1).write.mode("overwrite").partitionBy("cb").parquet(store)
        mode = "overwrite" if b == 0 else "append"
        appended.coalesce(1).write.mode(mode).partitionBy("cb").parquet(store)
        batch.coalesce(1).write.mode("append").parquet(docs_path)
        dedup.minhash_band_index(batch, "doc_id", "text").coalesce(1).write.mode(
            "append"
        ).parquet(idx_path)
        wall = time.perf_counter() - t0
        pair_frames.append(new_pairs)  # each already checkpointed
        n_docs = (b + 1) * (UNIQUE + COPIES + TWINS * 2) + max(0, b - 1) * BRIDGES
        total_rewrites.append(len(losing))
        print(f"| {b} | {n_docs:,} | {wall:.2f} | {n_delta} | {len(losing)}/{P} | {n_delta} appended |")

    from functools import reduce

    all_pairs = reduce(lambda a, c: a.unionByName(c), pair_frames)
    t0 = time.perf_counter()
    full = dedup.connected_components(all_pairs)
    t_full = time.perf_counter() - t0
    got = {(r["node"], r["component"]) for r in spark.read.parquet(store).select("node", "component").collect()}
    want = {(r["node"], r["component"]) for r in full.collect()}
    assert got == want, (
        f"incremental labels diverged from full recompute: "
        f"{len(got - want)} extra, {len(want - got)} missing"
    )
    assert sum(total_rewrites) > 0, "soak exercised no old-old component merges"
    print(
        f"\nfinal parity: {len(got):,} labels BYTE-IDENTICAL to full recompute"
        f" (full CC wall {t_full:.2f}s, vs per-batch incremental above;"
        f" {sum(total_rewrites)} losing-partition rewrites across the soak)"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
