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
