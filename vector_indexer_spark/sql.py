"""SQL surface: register the corpus tables as views and query them
with Spark SQL directly.

The engine is DataFrame-first, but an analytics engine's users also
arrive with plain SQL — this module makes the whole testdata corpus
(TPC-H-shaped facts + documents/events/embeddings) addressable by
name, so ``spark.sql("SELECT ... FROM lineitem JOIN orders ...")``
runs through the exact same Catalyst planning (pushdown, broadcast,
AQE) as the DataFrame operators. Views are lazy: registration reads
no data, and every query still plans from the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_corpus_views(
    spark: SparkSession, sf_dir: str, tables=CORPUS_TABLES
) -> None:
    """Register each parquet table under its own name as a temp view
    (same names the DuckDB oracle uses, so any oracle SQL that is
    dialect-portable runs on BOTH engines verbatim)."""
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(
            t
        )


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias for ``spark.sql`` — the declared SQL entry point."""
    return spark.sql(query)
