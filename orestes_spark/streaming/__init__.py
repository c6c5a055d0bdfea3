from orestes_spark.streaming.ingest import start_ingest, streaming_rollup

__all__ = ["start_ingest", "streaming_rollup"]
