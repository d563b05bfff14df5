"""vector_indexer_spark — a PySpark-native IVF/ANN analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference IVF vector indexer (NirajNair/vector-indexer), re-expressed
Spark-first: the index is partitioned Parquet + a broadcastable
centroid table, build is a DataFrame job, and search is a batch
DataFrame query. See SURVEY.md for the blueprint.
"""

from vector_indexer_spark.config import (
    IndexConfig,
    calculate_max_iterations,
    hierarchy_seed,
    mini_batch_size,
    num_shards,
    suggest_nlist,
    super_centroid_seed,
)
from vector_indexer_spark.session import get_spark

__all__ = [
    "IndexConfig",
    "calculate_max_iterations",
    "get_spark",
    "hierarchy_seed",
    "mini_batch_size",
    "num_shards",
    "suggest_nlist",
    "super_centroid_seed",
]

__version__ = "0.2.0"
