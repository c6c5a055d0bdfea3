"""Write-time validation with per-point error collection (S4/S5).

The reference rejects individual bad points while the rest of the batch
proceeds, returning ``{errors: [{point, error}]}``
(/root/reference/lib/orestes-utils.js:158-182,
 /root/reference/lib/orestes-inserter.js:51-60). Error strings are kept
identical so clients can match on them:

  - ``missing required keys: ["time"]``
  - ``invalid value <v>``          (missing / non-numeric / NaN value)
  - ``metrics must have at least one tag``
  - ``invalid tag - value is an object or array``

Implementation is a declarative split: one pass computes an ``error``
column with ``when`` chains; ``valid``/``errors`` are two filters over
the same cached frame — Catalyst collapses each into a single scan.
Nested-tag rejection happens at the adapter layer (a MAP<STRING,STRING>
column cannot hold an object/array; the list-of-dicts adapter checks).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ERR_MISSING_TIME = 'missing required keys: ["time"]'
ERR_NO_TAGS = "metrics must have at least one tag"
ERR_NESTED_TAG = "invalid tag - value is an object or array"


def err_invalid_value(v: Any) -> str:
    return f"invalid value {v}"


def classify(points: DataFrame) -> DataFrame:
    """Add an ``error`` STRING column (NULL ⇒ valid) to a canonical
    (time_ms, value, tags) frame. time_ms NULL means unparseable/missing
    time; value NULL/NaN is invalid; empty tags map is invalid."""
    error = (
        F.when(F.col("time_ms").isNull(), F.lit(ERR_MISSING_TIME))
        .when(
            F.col("value").isNull() | F.isnan(F.col("value")),
            F.concat(F.lit("invalid value "), F.coalesce(F.col("value").cast("string"), F.lit("undefined"))),
        )
        .when(F.size(F.map_keys(F.col("tags"))) == 0, F.lit(ERR_NO_TAGS))
    )
    return points.withColumn("error", error)


def split_valid(points: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Return (valid_points, errors). ``errors`` has (time_ms, value,
    tags, error)."""
    classified = classify(points)
    valid = classified.where(F.col("error").isNull()).drop("error")
    errors = classified.where(F.col("error").isNotNull())
    return valid, errors


def validate_raw_rows(rows: list[dict[str, Any]]) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Driver-side adapter for reference-style JSON point lists.

    Performs the checks that require dynamic typing (nested tag values,
    missing keys) before the data ever becomes a DataFrame. Returns
    (valid_rows, errors) where each valid row is
    ``{"time": <ms|iso>, "value": float, "tags": {k: str}}`` and each
    error is ``{"point": <original>, "error": <reference string>}``.
    """
    valid: list[dict[str, Any]] = []
    errors: list[dict[str, Any]] = []
    for pt in rows:
        if not isinstance(pt, dict) or "time" not in pt:
            errors.append({"point": pt, "error": ERR_MISSING_TIME})
            continue
        v = pt.get("value")
        if not isinstance(v, (int, float)) or isinstance(v, bool) or v != v:
            errors.append({"point": pt, "error": err_invalid_value(v)})
            continue
        tags = {k: val for k, val in pt.items() if k not in ("time", "value")}
        if not tags:
            errors.append({"point": pt, "error": ERR_NO_TAGS})
            continue
        if any(isinstance(val, (dict, list, tuple)) for val in tags.values()):
            errors.append({"point": pt, "error": ERR_NESTED_TAG})
            continue
        valid.append({"time": pt["time"], "value": float(v), "tags": {k: str(val) for k, val in tags.items()}})
    return valid, errors


def time_key_ms(t: Any) -> int | None:
    """Best-effort driver-side epoch-ms, mirroring
    ``schema.normalize_time_col`` (numeric → epoch ms with the same
    double→long truncation; ISO-8601 string → UTC instant; otherwise
    None). Used for in-batch upsert dedup keys so the same instant in
    two representations (1700000000000 vs its ISO form) is ONE key —
    without it, a single delivery could store duplicate (series, time)
    rows that gated reads would return twice."""
    import datetime
    import re

    s = str(t)
    if re.fullmatch(r"-?\d+(\.\d+)?", s):
        try:
            return int(float(s))
        except (ValueError, OverflowError):
            return None
    try:
        dt = datetime.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return int(dt.timestamp() * 1000)
