"""Fixed schemas for the engine's tables (reference: fixed, minimal type
system — SURVEY.md §1.2; src/vector_store.rs:9-15, src/api.rs:57-70).

The reference's data plane is f32 vectors + u64 ids/timestamps. Spark
mapping: ARRAY<FLOAT> + LONG (ids < 2^63 is a documented constraint;
the reference's own Python bindings already cast ids to i64,
bindings/python/src/lib.rs:180-186).
"""

from __future__ import annotations

from pyspark.sql import types as T

# vectors — the indexed base table (src/vector_store.rs:9-15)
VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("external_id", T.LongType(), False),
        T.StructField("values", T.ArrayType(T.FloatType(), containsNull=False), False),
        T.StructField("ts", T.LongType(), False),
    ]
)

# user-facing ingest record (src/api.rs:57-62) — ts nullable, defaulted at ingest
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("external_id", T.LongType(), False),
        T.StructField("values", T.ArrayType(T.FloatType(), containsNull=False), False),
        T.StructField("ts", T.LongType(), True),
    ]
)

# batched search input (bindings/python/src/lib.rs:133-146)
QUERY_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("query", T.ArrayType(T.FloatType(), containsNull=False), False),
    ]
)

# search output (src/api.rs:89-94) — squared L2, no sqrt
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("external_id", T.LongType(), False),
        T.StructField("dist2", T.DoubleType(), False),
    ]
)

# centroid table (src/ivf_index.rs:12-16, 36-41)
CENTROID_SCHEMA = T.StructType(
    [
        T.StructField("centroid_id", T.LongType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType(), containsNull=False), False),
        T.StructField("shard_id", T.LongType(), False),
    ]
)

# indexed vectors on disk — VECTOR_SCHEMA + partition columns
INDEXED_VECTOR_SCHEMA = T.StructType(
    list(VECTOR_SCHEMA.fields)
    + [
        T.StructField("cluster_id", T.LongType(), False),
        T.StructField("shard_id", T.LongType(), False),
    ]
)
