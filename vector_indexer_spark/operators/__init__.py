"""vector_indexer_spark.operators subpackage."""
