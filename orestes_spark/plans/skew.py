"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these helpers are for the plans AQE can't fix — a groupBy
where one key holds a large share of all rows (a hot series, an empty
tag), or a join against a side too big to broadcast with a few hot
keys. Standard two-phase construction:

  salted_aggregate: add salt = hash(row) % N, aggregate on
  (key, salt) — N-way parallel partials — then merge the partials per
  key. Works for any algebraic aggregate (decomposable into
  partial/merge pairs).

  salted_join: replicate the (small but not broadcastable) right side
  N times with an explicit salt column; left rows pick a deterministic
  pseudo-random salt; join on (key, salt) → the hot key's rows spread
  over N tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial-aggregate builder, merge function) per supported reducer.
# Builders are lazy: constructing a Column requires an active
# SparkContext, which must not be an import-time requirement.
_MERGEABLE = {
    "count": (lambda v: F.count(F.lit(1)), F.sum),
    "sum": (lambda v: F.sum(v), F.sum),
    "min": (lambda v: F.min(v), F.min),
    "max": (lambda v: F.max(v), F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    aggs: list[str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: (keys..., <agg>_<value_col> ...).
    Equivalent to ``df.groupBy(keys).agg(...)`` but the first shuffle
    spreads every key over ``salt`` partitions, so one hot key cannot
    serialize a task."""
    unknown = [a for a in aggs if a not in _MERGEABLE]
    if unknown:
        raise ValueError(f"non-mergeable aggs for salting: {unknown}")
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"))
    partials = salted.groupBy(*keys, "_salt").agg(
        *[_MERGEABLE[a][0](value_col).alias(f"_p_{a}") for a in aggs]
    )
    merged = partials.groupBy(*keys).agg(
        *[
            (F.sum(f"_p_{a}") if a in ("count", "sum") else _MERGEABLE[a][1](f"_p_{a}")).alias(
                f"{a}_{value_col}" if a != "count" else "count"
            )
            for a in aggs
        ]
    )
    return merged


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: right replicated ``salt``×, left salted
    deterministically. Use when right is too big to broadcast and left
    has hot keys. Right-side row count multiplies by ``salt`` — keep it
    the smaller side."""
    keys = [key] if isinstance(key, str) else list(key)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    right_rep = right.select("*", salts)
    left_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    out = left_salted.join(right_rep, [*keys, "_salt"], how)
    return out.drop("_salt")
