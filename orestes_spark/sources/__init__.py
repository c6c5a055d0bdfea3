from orestes_spark.sources.testdata import load_table, events_as_points

__all__ = ["load_table", "events_as_points"]
