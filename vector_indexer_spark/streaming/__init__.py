"""vector_indexer_spark.streaming subpackage."""
