"""Custom stateful streaming operator: per-series running statistics
maintained across micro-batches with ``applyInPandasWithState``.

The reference keeps no cross-request state beyond the Bubo metadata
cache; this is new surface (SURVEY.md §2.5 — "semantics are ours to
define"): a continuously-updated per-series (count, sum, min, max,
last_time_ms) summary, emitted in ``update`` mode whenever a series
receives points. The state is the Spark-managed per-key store —
restart-safe under checkpointing, partitioned by series across
executors at scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "series_id STRING, count LONG, sum DOUBLE, min DOUBLE, max DOUBLE, last_time_ms LONG"
)
STATE_SCHEMA = "count LONG, sum DOUBLE, min DOUBLE, max DOUBLE, last_time_ms LONG"


def _update_series_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        count, total, mn, mx, last = state.get
    else:
        count, total, mn, mx, last = 0, 0.0, None, None, 0
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
        bmin, bmax = float(pdf["value"].min()), float(pdf["value"].max())
        mn = bmin if mn is None else min(mn, bmin)
        mx = bmax if mx is None else max(mx, bmax)
        last = max(last, int(pdf["time_ms"].max()))
    state.update((count, total, mn, mx, last))
    yield pd.DataFrame(
        [
            {
                "series_id": key[0],
                "count": count,
                "sum": total,
                "min": mn,
                "max": mx,
                "last_time_ms": last,
            }
        ]
    )


def series_stats_stream(points: DataFrame) -> DataFrame:
    """Streaming (series_id, time_ms, value) → continuously-updated
    per-series stats. Output mode must be ``update``."""
    return points.groupBy("series_id").applyInPandasWithState(
        _update_series_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
