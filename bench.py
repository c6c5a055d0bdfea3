"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Protocol (round 4): pass 1 runs every query once UNTIMED — it builds
the engine warehouses, spawns the Arrow/Python worker pool, fills the
codegen and parquet-footer caches, and warms the page cache; passes
2-3 are measured steady-state runs and each query reports the MIN of
the two. Round 2's single-pass numbers silently charged one-time
setup to whichever queries ran first; round 4 found the second
confounder — episodic host-level CPU steal on this shared-host VM
(/proc/stat steal ≈ 20% of user time cumulatively) that can inflate
one arbitrary query 5-10x in any single pass. Min-of-two is robust
to that additive noise; per-pass steal ticks are recorded in
bench_queries.json so a contaminated round is diagnosable after the
fact. Cold-start (pass 1) totals are recorded there too.

Round 8 adds the STEAL GATE: contamination is rejected DURING the
run, not explained after it. A measured pass whose /proc/stat steal
delta exceeds 3x the established ~300-tick quiet band is discarded
and re-run (bounded retries, sleep between); the same gate, scaled to
pass duration, covers the write/read throughput passes. Every
attempt is stamped accepted/rejected in bench_queries.json
("steal_gate"), so the artifact itself proves the sample is either
in-band or the best available after retries were exhausted.

Output contract (learned the hard way in round 2, where one giant
JSON line outgrew the driver's stdout-tail capture and parsed as
null): the per-query timing map goes to an EARLIER stdout line and to
bench_queries.json next to this file; the FINAL stdout line is a
compact summary —

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "sf": <float>, "write_pts_per_sec": N, "read_pts_per_sec": N,
     "queries": {<headline subset>}}

Each query is forced with .collect() (driver-equivalent action).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


HEADLINE = [
    "artifact:neardup_pair_graph",
    "os_read_grouped",
    "os_count_points",
    "tpch_q1",
    "doc_minhash_neardup",
    "doc_simhash_pairs",
    "emb_topk_cosine",
    "events_sessionization",
    "ts_asof_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from orestes_spark.queries import QUERIES
    from orestes_spark.session import get_spark

    spark = get_spark("orestes-bench")

    # Pass 1 (untimed warmup): one-time setup — engine warehouse
    # builds, Python worker pool spawn, codegen/footer caches.
    cold: dict[str, float] = {}
    t_warm0 = time.perf_counter()
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - t0, 3)
    warmup_s = round(time.perf_counter() - t_warm0, 3)

    # Flush pass-1 garbage OUTSIDE the measured window: dropping the
    # last references to pass 1's DataFrames triggers ContextCleaner
    # unpersist/broadcast-cleanup floods at the next driver GC, which
    # otherwise lands mid-pass-2 and stalls a contiguous block of
    # queries by 2-4x (observed on the events_* family). Forcing both
    # GCs plus a short settle absorbs the burst here.
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(5)

    # Passes 2-3 (measured): steady-state latencies, per-query MIN of
    # two passes. GC between queries (never inside a timed region)
    # every few queries: accumulated dead DataFrames otherwise trigger
    # the ContextCleaner burst mid-query and charge one arbitrary
    # victim 2-4x its real latency. Two passes + min because this
    # environment is a shared-host VM with REAL episodic CPU steal
    # (/proc/stat shows ~20% of user time stolen cumulatively):
    # a single pass let one host-level burst inflate one arbitrary
    # query 5-10x (observed: 2.1s -> 26s on an unchanged plan). The
    # min of two samples is robust to additive noise; steal ticks are
    # recorded per pass so a contaminated round is diagnosable.
    def steal_ticks() -> int:
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except Exception:
            return -1

    # Steal gate (round 8): two consecutive round-close artifacts were
    # contaminated samples (r6: 12k-22k, r7: ~2.1k steal ticks/pass vs
    # the ~300-tick quiet band established in r4-r7) that needed prose
    # defense after the fact. The harness now defends itself DURING
    # the run: a measured pass whose steal delta exceeds 3x the band
    # is rejected and re-run (bounded retries); every attempt —
    # accepted or rejected — is stamped into bench_queries.json with
    # its steal ticks so the artifact proves either "all accepted
    # passes in-band" or "retries exhausted, lowest-steal attempts
    # used". steal_ticks() < 0 (unreadable /proc/stat) disables the
    # gate rather than rejecting forever.
    STEAL_BAND_TICKS = 300
    STEAL_GATE_TICKS = 3 * STEAL_BAND_TICKS

    # Shared-artifact accounting (round 7): the near-dup pair graph,
    # its connected components, and the persisted LSH band index are
    # process-cached intermediates consumed by several queries (the
    # production materialized-table shape). Round 6 built them in the
    # UNTIMED warmup pass, so their consumers reported only the
    # checkpoint-read cost and suite totals silently lost ~7-9 s of
    # real work. Each measured pass now invalidates and rebuilds them
    # as explicit "artifact:*" timed lines, charged into the total;
    # ARTIFACT_CONSUMERS in bench_queries.json names which query lines
    # read the warm checkpoint.
    from orestes_spark.queries import ARTIFACT_CONSUMERS, build_shared_artifacts

    def run_query_pass() -> tuple[dict[str, float], int]:
        meas: dict[str, float] = {}
        s0 = steal_ticks()
        for aname, secs in build_shared_artifacts(spark, sf_dir).items():
            meas[f"artifact:{aname}"] = secs
        for i, (name, fn) in enumerate(QUERIES.items()):
            if i % 10 == 0:
                gc.collect()
                spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            meas[name] = round(time.perf_counter() - t0, 3)
        s1 = steal_ticks()
        return meas, (s1 - s0 if s0 >= 0 and s1 >= 0 else -1)

    NEEDED_PASSES = 2
    MAX_PASS_ATTEMPTS = 6  # 2 needed + up to 4 contaminated re-runs
    attempts: list[dict] = []
    accepted_passes: list[dict[str, float]] = []
    while len(accepted_passes) < NEEDED_PASSES and len(attempts) < MAX_PASS_ATTEMPTS:
        meas, steal = run_query_pass()
        ok = steal < 0 or steal <= STEAL_GATE_TICKS
        attempts.append(
            {
                "steal_ticks": steal,
                "accepted": ok,
                "total_s": round(sum(meas.values()), 3),
                "timings": meas,
            }
        )
        if ok:
            accepted_passes.append(meas)
        else:
            # let the host-level burst drain before re-measuring
            time.sleep(10)
    gate_exhausted = len(accepted_passes) < NEEDED_PASSES
    if gate_exhausted:
        # best effort on a persistently noisy host: keep the
        # lowest-steal attempts and say so in the artifact
        chosen = sorted(attempts, key=lambda a: a["steal_ticks"])[:NEEDED_PASSES]
    else:
        chosen = [a for a in attempts if a["accepted"]]
    passes = [a["timings"] for a in chosen]
    steals = [a["steal_ticks"] for a in chosen]
    timings = {n: min(p[n] for p in passes) for n in passes[0]}

    # BASELINE.md comparison: engine write/read throughput at the same
    # batch size shape as the reference's perf-test (match-all read).
    #
    # Variance protocol (round 4): one write pass is ~1.1 s wall on
    # this workload, so a single stray GC pause / writeback burst adds
    # 0.5 s and reads as a 40% "regression" — exactly the r3 driver's
    # 90k→55.9k drop, which a controlled experiment (fresh vs
    # after-172-queries vs after-GC, 2 passes each) reproduced as
    # run-to-run noise: fresh-session steady state 72k, after the full
    # query suite 93k (JIT fully warm — the query pass HELPS), after
    # GC settle 83–89k. Defense: GC + settle before the window (flush
    # the 172-query ContextCleaner backlog outside it), then one
    # warmup pass + THREE measured passes, report the MEDIAN; all
    # passes and per-sink critical paths go to bench_queries.json.
    import statistics
    import tempfile

    from orestes_spark.engine import OrestesEngine
    from orestes_spark.sources.testdata import events_as_points

    import shutil

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(5)

    pts = events_as_points(spark, sf_dir).localCheckpoint()
    n_pts = pts.count()

    # Same steal gate for the throughput window, scaled to pass length:
    # the ~300-tick band is per ~50 s query pass (~6 ticks/s); a
    # write+read pass is ~2-3 s, so gate at 3x the band RATE with a
    # 100-tick floor for burst tolerance on short windows.
    def run_throughput_pass() -> dict:
        wh = tempfile.mkdtemp(prefix="orestes_bench_wh_")
        eng = OrestesEngine(spark, wh)
        s0 = steal_ticks()
        t0 = time.perf_counter()
        eng._append(pts, "default")
        write_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_read = eng.read(None, "default", 0, 2_000_000_000_000, grouped=False).count()
        read_s = time.perf_counter() - t0
        s1 = steal_ticks()
        # each warehouse holds a full copy of the dataset — don't let
        # repeated bench runs accumulate them in /tmp
        shutil.rmtree(wh, ignore_errors=True)
        steal = s1 - s0 if s0 >= 0 and s1 >= 0 else -1
        gate = max(100.0, 18.0 * (write_s + read_s))
        return {
            "write_s": round(write_s, 3),
            "read_s": round(read_s, 3),
            "n_read": n_read,
            "steal_ticks": steal,
            "accepted": steal < 0 or steal <= gate,
            "sinks": dict(eng.last_append_timings),
        }

    run_throughput_pass()  # warmup (fresh-warehouse JIT/footer caches)
    write_passes: list[dict] = []
    tp_attempts = 0
    while sum(p["accepted"] for p in write_passes) < 3 and tp_attempts < 7:
        tp_attempts += 1
        p = run_throughput_pass()
        write_passes.append(p)
        if not p["accepted"]:
            time.sleep(5)
    tp_accepted = [p for p in write_passes if p["accepted"]]
    tp_exhausted = len(tp_accepted) < 3
    if tp_exhausted:
        tp_accepted = sorted(write_passes, key=lambda p: p["steal_ticks"])[:3]
    write_s = statistics.median(p["write_s"] for p in tp_accepted)
    read_s = statistics.median(p["read_s"] for p in tp_accepted)
    n_read = tp_accepted[0]["n_read"]

    # Per-query detail: separate stdout line + file, NOT the final line
    # (a single giant line overflows the driver's output-tail capture).
    detail_path = Path(__file__).resolve().parent / "bench_queries.json"
    detail_path.write_text(
        json.dumps(
            {
                "sf": sf,
                "queries": timings,
                "measured_passes": passes,
                "steal_ticks_per_pass": steals,
                "steal_gate": {
                    "band_ticks": STEAL_BAND_TICKS,
                    "gate_ticks": STEAL_GATE_TICKS,
                    "attempts": [
                        {k: a[k] for k in ("steal_ticks", "accepted", "total_s")}
                        for a in attempts
                    ],
                    "exhausted": gate_exhausted,
                    "throughput_exhausted": tp_exhausted,
                },
                "cold_pass": cold,
                "warmup_s": warmup_s,
                "write_passes": write_passes,
                "artifact_consumers": ARTIFACT_CONSUMERS,
            },
            indent=1,
        )
    )
    print(json.dumps({"bench_detail": timings}))
    sys.stdout.flush()

    print(
        json.dumps(
            {
                "metric": "orestes_spark_total_query_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf": sf,
                "write_pts_per_sec": round(n_pts / write_s),
                "read_pts_per_sec": round(n_read / read_s),
                # Headline subset only — full map is on the earlier
                # bench_detail line and in bench_queries.json. Keeps
                # the final line small enough for the driver's
                # stdout-tail capture (r2's 85-entry line overflowed
                # it and parsed as null).
                "queries": {k: timings[k] for k in HEADLINE if k in timings},
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
