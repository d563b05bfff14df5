"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column names are aliased identically on both sides; float results are
computed with fold-left double accumulation in both engines (see
``vector_indexer_spark.functions.distance``) so value hashes match
bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Make the package importable by Python workers regardless of the
# harness's cwd or session configuration: export the repo root onto
# PYTHONPATH before any JVM (and its workers) observes the env.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
_existing = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _existing.split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        f"{_REPO_ROOT}{os.pathsep}{_existing}" if _existing else _REPO_ROOT
    )

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_indexer_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact top-10 kNN (arrow scale path) on sf0.001 embeddings."""
    from vector_indexer_spark.operators.knn import knn_exact

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return knn_exact(
        emb, queries_df, k=10, id_col="vec_id", vec_col="embedding"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    return entry_queries.ORACLE_SQL
