"""vector_indexer_spark.sources subpackage."""
