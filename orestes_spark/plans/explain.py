"""Plan-inspection helpers: the programmatic side of
``df.explain("formatted")`` used by the plan-quality tests and by
operators that assert their own physical shape."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, final: bool = False) -> str:
    """The executed plan string. With ``final=True`` an action is
    triggered first so AQE's final plan (broadcast conversions, skew
    splits, codegen stage markers ``*(n)``) is visible."""
    if final:
        df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def scans_of(df: DataFrame) -> list[dict[str, str]]:
    """Parquet scans in the plan: [{location, pushed, partition, schema}]."""
    return scans_of_plan(physical_plan(df))


def scans_of_plan(plan: str) -> list[dict[str, str]]:
    """scans_of over an already-captured plan string (used for the
    pre-``localCheckpoint`` sub-stage plans, whose DataFrames are gone
    by the time evidence is assembled)."""
    out = []
    for m in re.finditer(r"FileScan parquet [^\n]*", plan):
        line = m.group(0)

        def grab(key: str) -> str:
            g = re.search(key + r": \[?([^\]\n]*)", line)
            return g.group(1) if g else ""

        out.append(
            {
                "location": grab("Location"),
                "pushed": grab("PushedFilters"),
                "partition": grab("PartitionFilters"),
                "schema": grab("ReadSchema"),
            }
        )
    return out


import contextlib


@contextlib.contextmanager
def capture_checkpoints(recorded: list[str]):
    """Record the physical plan of every DataFrame at the moment it is
    localCheckpoint-ed (BEFORE lineage truncation), then delegate —
    checkpoint-heavy queries otherwise under-report their real
    join/shuffle profile. Shared by tools/plan_dump.py (PLANS.md) and
    tools/plan_snapshot.py (the machine-readable regression pin)."""
    try:  # Spark 4: the classic DataFrame subclass overrides it
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pragma: no cover - older Spark
        _DF = DataFrame
    orig = _DF.localCheckpoint

    def patched(self, eager: bool = True):
        try:
            recorded.append(physical_plan(self))
        except Exception:
            pass
        return orig(self, eager)

    _DF.localCheckpoint = patched
    try:
        yield
    finally:
        _DF.localCheckpoint = orig


def query_profile(spark, fn, sf_dir: str) -> dict:
    """Machine-readable physical-plan profile of one registered query
    (round-11, VERDICT r10 #5): join strategies, total Exchange count,
    CartesianProduct / Exchange SinglePartition occurrences, and the
    number of distinct parquet scans carrying pushed or partition
    filters — aggregated over the final plan plus every checkpointed
    sub-stage. The values a 100-TB plan regression shows up in."""
    stages: list[str] = []
    with capture_checkpoints(stages):
        df = fn(spark, sf_dir)
    plans = stages + [physical_plan(df)]
    joins = sorted(
        set().union(*(re.findall(r"(\w*Join\w*)", p) for p in plans)) - {"Join"}
    )
    seen: set[tuple] = set()
    filtered_scans = 0
    for p in plans:
        for s in scans_of_plan(p):
            loc = re.sub(
                r"file:[^,\]]*/(sf[\d.]+|orestes_\w+)", r"…/\1", s["location"]
            )
            key = (loc, s["pushed"], s["partition"], s["schema"])
            if key in seen:
                continue
            seen.add(key)
            if s["pushed"] or s["partition"]:
                filtered_scans += 1
    return {
        "joins": joins,
        "shuffles": sum(p.count("Exchange") for p in plans),
        "cartesian": sum(p.count("CartesianProduct") for p in plans),
        "single_partition": sum(p.count("Exchange SinglePartition") for p in plans),
        "filtered_scans": filtered_scans,
        "stages": len(stages),
    }


# join strategies that imply a shuffle or an all-pairs loop — a query
# whose snapshot never had one must not silently grow one
_REGRESSION_JOINS = ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct")


def profile_regressions(old: dict, new: dict) -> list[str]:
    """Diff freshly-generated query profiles against the committed
    snapshot; every string returned is a plan REGRESSION that must
    either be fixed or consciously accepted by regenerating the
    snapshot (tools/plan_snapshot.py --write). One-sided on purpose:
    fewer shuffles / more filtered scans pass silently."""
    errs: list[str] = []
    for name, np in new.items():
        op = old.get(name)
        if op is None:
            errs.append(
                f"{name}: not in plans_snapshot.json — regenerate via"
                " tools/plan_snapshot.py --write"
            )
            continue
        if np["cartesian"] > op["cartesian"]:
            errs.append(
                f"{name}: CartesianProduct appeared"
                f" ({op['cartesian']} -> {np['cartesian']})"
            )
        if np["single_partition"] > op["single_partition"]:
            errs.append(
                f"{name}: Exchange SinglePartition appeared"
                f" ({op['single_partition']} -> {np['single_partition']})"
            )
        if np["shuffles"] > op["shuffles"]:
            errs.append(
                f"{name}: shuffle count grew {op['shuffles']} -> {np['shuffles']}"
            )
        grown = set(np["joins"]) - set(op["joins"])
        bad = sorted(j for j in grown if any(b in j for b in _REGRESSION_JOINS))
        if bad:
            errs.append(f"{name}: new shuffle/loop join strategies {bad}")
        if np["filtered_scans"] < op["filtered_scans"]:
            errs.append(
                f"{name}: pushed/partition-filtered scans dropped"
                f" {op['filtered_scans']} -> {np['filtered_scans']}"
            )
    return errs
