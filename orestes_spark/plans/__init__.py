from orestes_spark.plans.explain import physical_plan, scans_of
from orestes_spark.plans.parallelism import ensure_min_parallelism
from orestes_spark.plans.skew import salted_aggregate, salted_join

__all__ = [
    "ensure_min_parallelism",
    "physical_plan",
    "salted_aggregate",
    "salted_join",
    "scans_of",
]
