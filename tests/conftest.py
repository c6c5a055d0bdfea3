from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from orestes_spark.session import get_spark

    spark = get_spark("orestes-tests")
    yield spark


@pytest.fixture()
def engine(spark, tmp_path):
    from orestes_spark.engine import OrestesEngine
    from orestes_spark.config import SpaceConfig

    return OrestesEngine(
        spark,
        str(tmp_path / "warehouse"),
        spaces={"default": SpaceConfig(1), "other": SpaceConfig(7)},
    )


def sf_dir(sf: str = "0.001") -> str:
    return f"/root/testdata/sf{sf}"
