from orestes_spark.plans.explain import physical_plan, scans_of
from orestes_spark.plans.skew import salted_aggregate, salted_join

__all__ = ["physical_plan", "scans_of", "salted_aggregate", "salted_join"]
