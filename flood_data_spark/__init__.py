"""flood_data_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
openearthplatforminitiative/flood-data reference (GloFAS ensemble flood-risk
analytics): ensemble exceedance probabilities, 5-number summaries, tendency /
intensity / peak-timing classification, grid-cell geometry, float-key join
discipline, raster-ingestion plumbing, and serving lookups — plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal column plumbing) needed at 100 TB scale.

Design stance (see SURVEY.md §7): a DataFrame-library engine. The public API
is composable PySpark transform functions plus a thin pipeline runner; logical
plans flow through stock Catalyst/Tungsten with zero row-at-a-time Python UDFs
on the analytics path.
"""

from flood_data_spark.config import EngineConfig, DEFAULT_CONFIG
from flood_data_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["EngineConfig", "DEFAULT_CONFIG", "get_spark", "__version__"]
