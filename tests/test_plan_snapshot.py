"""Plan-regression guard (round-11, VERDICT r10 #5): PLANS.md is
regenerated prose; this pins every registered query's machine-readable
physical-plan profile (joins, shuffles, cartesian / single-partition
flags, filtered-scan count) against the committed
``plans_snapshot.json`` and fails on any regression. Intentional plan
changes are accepted by regenerating the snapshot:
``python tools/plan_snapshot.py --write``.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from orestes_spark.plans.explain import profile_regressions

REPO = Path(__file__).resolve().parent.parent
SNAPSHOT = REPO / "plans_snapshot.json"


def test_compare_catches_deliberately_broken_plans():
    """Self-check: every regression class the guard exists for is
    actually caught — a removed broadcast hint (SortMergeJoin
    appears), a new cartesian product, a single-partition exchange,
    shuffle growth, a lost pushed filter, and an unpinned query."""
    base = {
        "joins": ["BroadcastHashJoin"],
        "shuffles": 3,
        "cartesian": 0,
        "single_partition": 0,
        "filtered_scans": 2,
        "stages": 0,
    }
    old = {f"q{i}": dict(base) for i in range(6)}
    new = {f"q{i}": dict(base) for i in range(6)}
    new["q0"]["joins"] = ["BroadcastHashJoin", "SortMergeJoin"]
    new["q1"]["cartesian"] = 1
    new["q1"]["joins"] = ["BroadcastNestedLoopJoin", "CartesianProduct"]
    new["q2"]["single_partition"] = 1
    new["q3"]["shuffles"] = 4
    new["q4"]["filtered_scans"] = 1
    new["q6"] = dict(base)  # not in the snapshot at all
    errs = profile_regressions(old, new)
    joined = "\n".join(errs)
    assert "q0: new shuffle/loop join strategies ['SortMergeJoin']" in joined
    assert "q1: CartesianProduct appeared" in joined
    assert "q2: Exchange SinglePartition appeared" in joined
    assert "q3: shuffle count grew 3 -> 4" in joined
    assert "q4: pushed/partition-filtered scans dropped 2 -> 1" in joined
    assert "q6: not in plans_snapshot.json" in joined
    # and a clean diff is clean
    assert profile_regressions(old, {k: old[k] for k in old}) == []


def test_snapshot_has_no_cartesian_and_bounded_single_partition():
    """The committed snapshot itself must honor the repo invariants:
    zero CartesianProduct anywhere, and Exchange SinglePartition only
    as the benign <=2-exchange final reduce of a global-scalar /
    one-row query (partials are map-side combined first; the
    single-partition stage carries a handful of rows). GROWTH of
    either is what profile_regressions guards per query."""
    if not SNAPSHOT.exists():
        pytest.skip("plans_snapshot.json not generated yet")
    snap = json.loads(SNAPSHOT.read_text())
    cart = {n: p for n, p in snap.items() if p.get("cartesian", 0)}
    assert not cart, cart
    deep = {n: p for n, p in snap.items() if p.get("single_partition", 0) > 2}
    assert not deep, deep


def _load_snapshot_tool():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plan_snapshot", REPO / "tools" / "plan_snapshot.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_all_query_plans_match_snapshot(spark):
    """The full pin: regenerate every query's profile at HEAD and diff
    against the committed snapshot. Heavy (builds every query's plan
    at sf0.001), so it only runs when ORESTES_PLAN_GUARD=1 —
    ``python tools/plan_snapshot.py`` runs the identical check
    standalone per round."""
    import os

    if not os.environ.get("ORESTES_PLAN_GUARD"):
        pytest.skip(
            "set ORESTES_PLAN_GUARD=1 (or run tools/plan_snapshot.py)"
            " for the full 169-query plan regen"
        )
    if not SNAPSHOT.exists():
        pytest.skip("plans_snapshot.json not generated yet")
    ps = _load_snapshot_tool()

    old = json.loads(SNAPSHOT.read_text())
    new = ps.generate(spark)
    errored = {n: p for n, p in new.items() if "error" in p}
    assert not errored, errored
    errs = profile_regressions(old, new)
    assert not errs, "\n".join(errs)
