"""vector_indexer_spark.plans subpackage."""
