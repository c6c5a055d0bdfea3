"""Controlled A/B of the r4→r5 bench drift (round-6 verdict task 1).

BENCH_r05 showed a one-directional drift vs r04 (write −7%, read −5%,
several ts_* +20-35%, multimodal_meta +108%) that round 5 attributed
to host CPU steal without proof. This harness settles it: it runs the
DRIFTED metrics only — the seven regressed queries plus the
write/read throughput loop — against two checked-out trees in strict
interleave (A,B,A,B,...), each rep a fresh process/JVM, so any
host-level noise episode lands on both arms. Per-rep /proc/stat steal
ticks are recorded so a contaminated rep is diagnosable.

Usage:
    python tools/ab_bench.py run <tree> <out.json>    # one rep
    python tools/ab_bench.py drive <treeA> <treeB> <reps> <out_dir>

Protocol per rep: warmup pass (untimed) → GC + settle → two measured
passes, per-query MIN; throughput loop = 1 warmup + 2 measured
appends/reads of the sf0.1 events table into a fresh warehouse,
median reported. The drive mode prints a per-metric A-vs-B table of
the min across reps (min-of-reps: same additive-noise robustness
argument as bench.py's min-of-two).
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

SUBSET = [
    "ts_gap_fill_hourly",
    "orders_set_ops",
    "ts_asof_join",
    "ts_moving_avg",
    "ts_rate_of_change",
    "ts_range_join",
    "multimodal_meta",
    "os_read_grouped",
    "os_count_points",
]


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return -1


def run_one(tree: str, out: str) -> None:
    sys.path.insert(0, tree)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from orestes_spark.queries import QUERIES
    from orestes_spark.session import get_spark

    spark = get_spark("ab-bench")
    for n in SUBSET:  # warmup: codegen, worker pool, page cache
        QUERIES[n](spark, sf_dir).collect()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)

    passes, steals = [], []
    for _ in range(2):
        m, s0 = {}, _steal()
        for n in SUBSET:
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).collect()
            m[n] = round(time.perf_counter() - t0, 3)
        steals.append(_steal() - s0)
        passes.append(m)
    timings = {n: min(p[n] for p in passes) for n in SUBSET}

    from orestes_spark.engine import OrestesEngine
    from orestes_spark.sources.testdata import events_as_points

    pts = events_as_points(spark, sf_dir).localCheckpoint()
    n_pts = pts.count()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)
    wr, rd = [], []
    s0 = _steal()
    for i in range(3):  # rep 0 = warmup
        wh = tempfile.mkdtemp(prefix="ab_wh_")
        eng = OrestesEngine(spark, wh)
        t0 = time.perf_counter()
        eng._append(pts, "default")
        ws = time.perf_counter() - t0
        t0 = time.perf_counter()
        eng.read(None, "default", 0, 2_000_000_000_000, grouped=False).count()
        rs = time.perf_counter() - t0
        if i:
            wr.append(n_pts / ws)
            rd.append(n_pts / rs)
        shutil.rmtree(wh, ignore_errors=True)
    res = {
        "tree": tree,
        "timings": timings,
        "query_steals": steals,
        "throughput_steal": _steal() - s0,
        "write_pts_per_sec": round(statistics.median(wr)),
        "read_pts_per_sec": round(statistics.median(rd)),
        "n_pts": n_pts,
    }
    with open(out, "w") as f:
        json.dump(res, f)
    print(json.dumps(res))


def _check_comparable_locations(tree_a: str, tree_b: str) -> None:
    """Round-9 (verdict #7): encode the round-8 A/B lesson in the
    harness. Runs 1-2 of the four-run r7-vs-r8 A/B burned a window on
    a LOCATION confound — one arm in /root/repo, one in /tmp — that
    produced a one-directional ~9% tilt which survived arm-swapping
    and vanished only when both trees sat under /tmp (the
    identical-code location control in SCALING.md pinned it). Both
    arms must live under the same parent mount; by convention, two
    /tmp worktrees (git worktree add --detach /tmp/<name> <commit>)."""
    a, b = os.path.realpath(tree_a), os.path.realpath(tree_b)
    pa, pb = os.path.dirname(a.rstrip("/")), os.path.dirname(b.rstrip("/"))
    if pa != pb:
        raise SystemExit(
            f"ab_bench: refusing to compare trees under different parents\n"
            f"  A: {a}\n  B: {b}\n"
            "The round-8 location control showed a ~9% one-directional tilt"
            " from tree location alone. Put BOTH arms in sibling /tmp"
            " worktrees:  git worktree add --detach /tmp/<name> <commit>"
        )
    if not pa.startswith(tempfile.gettempdir()):
        print(
            f"ab_bench: WARNING — arms live under {pa}, not"
            f" {tempfile.gettempdir()}; tmpfs-vs-disk page-cache effects are"
            " on you (the measured-clean convention is two /tmp worktrees)",
            file=sys.stderr,
        )


def drive(tree_a: str, tree_b: str, reps: int, out_dir: str) -> None:
    _check_comparable_locations(tree_a, tree_b)
    os.makedirs(out_dir, exist_ok=True)
    runs: dict[str, list[dict]] = {"A": [], "B": []}
    for rep in range(reps):
        for arm, tree in (("A", tree_a), ("B", tree_b)):
            out = os.path.join(out_dir, f"{arm}{rep}.json")
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run", tree, out],
                check=True,
                cwd=out_dir,  # keep derby/spark-warehouse litter out of the trees
                # PYTHONPATH (not driver sys.path) so executor-side
                # Python workers resolve the tree under test too.
                env={**os.environ, "PYTHONPATH": tree},
            )
            with open(out) as f:
                runs[arm].append(json.load(f))
            print(f"done {arm}{rep}", file=sys.stderr)

    def best(arm: str, key: str, qname: str | None = None):
        vals = [r["timings"][qname] if qname else r[key] for r in runs[arm]]
        return min(vals) if qname else max(vals)

    report = {"trees": {"A": tree_a, "B": tree_b}, "reps": reps, "metrics": {}}
    for q in SUBSET:
        a, b = best("A", "", q), best("B", "", q)
        report["metrics"][q] = {"A_min_s": a, "B_min_s": b, "B_over_A": round(b / a, 3)}
    for key in ("write_pts_per_sec", "read_pts_per_sec"):
        a, b = best("A", key), best("B", key)
        report["metrics"][key] = {"A_max": a, "B_max": b, "B_over_A": round(b / a, 3)}
    report["steals"] = {
        arm: [r["query_steals"] + [r["throughput_steal"]] for r in runs[arm]]
        for arm in runs
    }
    out = os.path.join(out_dir, "report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run_one(sys.argv[2], sys.argv[3])
    else:
        drive(sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5])
