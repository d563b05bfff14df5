"""Declared correctness queries + DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 gets an entry here; the
driver runs the Spark callable and the oracle SQL side-by-side at
sf0.01 and compares row counts, schemas, and order-insensitive value
hashes. Float outputs are fold-left double sums on both sides →
bit-identical (verified locally by scripts/check_correctness.py).

Keys are grouped by prefix:
  ``cfg_``  — config heuristics (F5–F9)
  ``knn_``  — exact brute-force kNN (F1, W2, P7)
  ``ivf_``  — fixed-centroid IVF ops (J1/J3/J4, W1/W2, A5/A6, P6)
  ``dedup_``/``text_``/``sim_`` — LLM-pipeline operators
"""

from __future__ import annotations

from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLE_SQL: dict = {}


def _register(name, fn, sql=None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


# --------------------------------------------------------------------------
# cfg_ — heuristics F5-F9 (reference src/utils.rs:9-26, kmeans.rs:83,
# ivf_index.rs:104-106). Spark side computes via the Python functions;
# oracle side is hardcoded expected literals — a genuine lock on the
# formulas, not an echo.
# --------------------------------------------------------------------------

_HEURISTIC_NS = [500, 5_000, 60_000, 500_000, 5_000_000]


def _cfg_heuristics(spark, sf_dir):
    from vector_indexer_spark.config import (
        calculate_max_iterations,
        mini_batch_size,
        num_shards,
        suggest_nlist,
    )

    rows = [
        (
            n,
            suggest_nlist(n),
            calculate_max_iterations(n),
            mini_batch_size(n),
            num_shards(suggest_nlist(n)),
        )
        for n in _HEURISTIC_NS
    ]
    return spark.createDataFrame(
        rows, "n long, nlist long, max_iters long, batch_size long, shards long"
    )


_register(
    "cfg_heuristics",
    _cfg_heuristics,
    """
    SELECT CAST(c0 AS BIGINT) AS n, CAST(c1 AS BIGINT) AS nlist,
           CAST(c2 AS BIGINT) AS max_iters, CAST(c3 AS BIGINT) AS batch_size,
           CAST(c4 AS BIGINT) AS shards
    FROM (VALUES
      (500, 22, 300, 22, 5),
      (5000, 70, 300, 70, 9),
      (60000, 490, 100, 244, 23),
      (500000, 2832, 50, 256, 54),
      (5000000, 8948, 20, 256, 95)
    ) AS t(c0, c1, c2, c3, c4)
    """,
)


def _cfg_seeds(spark, sf_dir):
    from vector_indexer_spark.config import hierarchy_seed, super_centroid_seed

    rows = [
        (s, super_centroid_seed(s), hierarchy_seed(s)) for s in (0, 1, 42, 1000)
    ]
    return spark.createDataFrame(
        rows, "seed long, super_seed long, hierarchy_seed long"
    )


_register(
    "cfg_seeds",
    _cfg_seeds,
    """
    SELECT CAST(c0 AS BIGINT) AS seed, CAST(c1 AS BIGINT) AS super_seed,
           CAST(c2 AS BIGINT) AS hierarchy_seed
    FROM (VALUES (0, 7, 42), (1, 38, 59), (42, 1309, 756), (1000, 31007, 17042))
      AS t(c0, c1, c2)
    """,
)


# --------------------------------------------------------------------------
# knn_ — exact brute-force kNN (the reference's own ground truth)
# --------------------------------------------------------------------------

_KNN_DIST2_SQL = """
  list_reduce(
    list_transform(range(1, len(v.embedding) + 1),
      i -> (CAST(q.query[i] AS DOUBLE) - CAST(v.embedding[i] AS DOUBLE))
         * (CAST(q.query[i] AS DOUBLE) - CAST(v.embedding[i] AS DOUBLE))),
    (acc, x) -> acc + x)
"""


def _emb_queries(spark, sf_dir, n):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return emb, q


def _knn_exact_top10(spark, sf_dir):
    from vector_indexer_spark.operators.knn import knn_exact

    emb, q = _emb_queries(spark, sf_dir, 10)
    return knn_exact(
        emb, q, k=10, id_col="vec_id", vec_col="embedding", method="native"
    )


_register(
    "knn_exact_top10",
    _knn_exact_top10,
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id, {_KNN_DIST2_SQL} AS dist2
      FROM embeddings v CROSS JOIN q
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist2, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, dist2
    FROM ranked WHERE rank <= 10
    """,
)


def _knn_self_top1(spark, sf_dir):
    from vector_indexer_spark.operators.knn import knn_exact

    emb, q = _emb_queries(spark, sf_dir, 25)
    return knn_exact(
        emb, q, k=1, id_col="vec_id", vec_col="embedding", method="native"
    )


_register(
    "knn_self_top1",
    _knn_self_top1,
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query
               FROM embeddings WHERE vec_id < 25),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id, {_KNN_DIST2_SQL} AS dist2
      FROM embeddings v CROSS JOIN q
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist2, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, dist2
    FROM ranked WHERE rank <= 1
    """,
)


def _knn_k_gt_n(spark, sf_dir):
    # k > n returns exactly n rows per query (tests/ivf_index_tests.rs:278-306)
    from vector_indexer_spark.operators.knn import knn_exact

    emb, q = _emb_queries(spark, sf_dir, 2)
    return knn_exact(
        emb, q, k=100_000, id_col="vec_id", vec_col="embedding", method="native"
    )


_register(
    "knn_k_gt_n",
    _knn_k_gt_n,
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query
               FROM embeddings WHERE vec_id < 2),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id, {_KNN_DIST2_SQL} AS dist2
      FROM embeddings v CROSS JOIN q
    )
    SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist2, neighbor_id) AS INT) AS rank,
           neighbor_id, dist2
    FROM scored
    """,
)
