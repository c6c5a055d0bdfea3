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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from orestes_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from orestes_spark.queries import ORACLES

    return dict(ORACLES)
