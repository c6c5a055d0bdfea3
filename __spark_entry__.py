"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` delegate to the registry in
``orestes_spark.queries`` — one entry per implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions. ``entry`` runs the
flagship Orestes read path on sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: term-filtered per-series count over events-as-points
    (the reference's /read?aggregations=count path, A1)."""
    from orestes_spark.queries import QUERIES

    return QUERIES["os_count_points"](spark, "/root/testdata/sf0.001")


def _staleness_order(keys) -> list[str]:
    """Order registry keys so the driver's bounded per-round check
    window always hits the weakest signal first: queries NEVER
    driver-checked, then stalest-last-checked (ties alphabetical).
    Derived at call time from the CORRECTNESS_r*.json files the driver
    itself writes, so the rotation is automatic every round."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
            results = json.load(open(path))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, res in results.items():
            # an err/timeout row is not a trusted check — keep it stale
            if isinstance(res, dict) and res.get("err"):
                continue
            last[name] = max(last.get(name, 0), rnd)
    return sorted(keys, key=lambda k: (last.get(k, 0), k))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from orestes_spark.queries import QUERIES

    return {k: QUERIES[k] for k in _staleness_order(QUERIES)}


def oracle_sql() -> dict[str, str]:
    from orestes_spark.queries import ORACLES, QUERIES

    order = _staleness_order(QUERIES)
    return {k: ORACLES[k] for k in order if k in ORACLES}
