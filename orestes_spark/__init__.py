"""orestes_spark — a PySpark-native rebuild of the Orestes searchable
time-series engine (reference: davidvgalbraith/orestes), extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Design stance (see SURVEY.md §7): everything is declarative DataFrame/SQL
so Catalyst handles pushdown, pruning, and join strategy; Python UDFs are
confined to genuinely non-relational kernels (none are needed for the
reference's own surface).
"""

from orestes_spark.config import SpaceConfig, engine_config_from_json, load_space_configs
from orestes_spark.engine import (
    ConcurrentWriterError,
    OrestesEngine,
    RollupStaleError,
    RollupStaleWarning,
)
from orestes_spark.server import serve
from orestes_spark.session import get_spark

__all__ = [
    "ConcurrentWriterError",
    "OrestesEngine",
    "RollupStaleError",
    "RollupStaleWarning",
    "SpaceConfig",
    "engine_config_from_json",
    "get_spark",
    "load_space_configs",
    "serve",
]

__version__ = "0.1.0"
