"""vector_indexer_spark.functions subpackage."""
