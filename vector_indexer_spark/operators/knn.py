"""Exact brute-force k-nearest-neighbor search.

This is the reference's own ground truth (tests/test_utils/mod.rs:223-235;
bench ground truth via Faiss FlatL2, bench_all_ivf.py:73-80) and the
recall denominator for the ANN path. Semantics: squared L2 (F1, no
sqrt), per-query ascending top-k with a deterministic
``(dist2, id)`` tie-break (reference relies on unstable f32 sort order,
src/ivf_index.rs:264-266 — we pin ties for reproducibility, SURVEY §2.6).

Two physical strategies for the same logical query:

- ``method="native"``: ``broadcast(queries) cross-join vectors`` scored
  by a Catalyst fold, ranked by a window. Fully JVM-side / codegen;
  bit-reproducible (the correctness oracle's path).
- ``method="arrow"`` (default): per-partition NumPy top-k against the
  broadcast query matrix inside ``mapInPandas`` — a map-side combine
  that reduces the shuffle from ``n_vectors × n_queries`` rows to
  ``n_partitions × n_queries × k`` rows before the global rank. At 100 TB
  the native plan's window over the full cross product is the bottleneck;
  this one shuffles only the per-partition winners.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_indexer_spark.functions.distance import dist2_expr
from vector_indexer_spark.functions.kernels import stack_arrays, topk_per_row


def knn_exact(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "id",
    vec_col: str = "values",
    query_id_col: str = "query_id",
    query_col: str = "query",
    method: str = "arrow",
    include_vectors: bool = False,
) -> DataFrame:
    """Exact top-k by squared L2 for every query.

    Returns ``(query_id, rank, neighbor_id, dist2[, values])``, rank
    1-based ascending by ``(dist2, neighbor_id)``. Fewer than k rows per
    query iff the vector table has fewer than k rows (reference
    behavior: k>n returns n, tests/ivf_index_tests.rs:278-306).
    """
    if k <= 0:
        raise ValueError("k must be positive")  # P3
    if method == "native":
        out = _knn_native(
            vectors, queries, k, id_col, vec_col, query_id_col, query_col
        )
    elif method == "arrow":
        out = _knn_arrow(
            vectors, queries, k, id_col, vec_col, query_id_col, query_col
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    if include_vectors:  # P7
        payload = vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("values")
        )
        out = out.join(payload, "neighbor_id", "left").select(
            "query_id", "rank", "neighbor_id", "dist2", "values"
        )
    return out


def _knn_native(vectors, queries, k, id_col, vec_col, query_id_col, query_col):
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_col).alias("__q")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    )
    # The query batch is the small side at scale — broadcast it so the
    # 100 TB vector table never shuffles for the join itself.
    # a wrong-length vector row yields NULL from zip_with, and ascending
    # sort is NULLS FIRST — map corrupt rows to +inf (sorts last) and
    # drop them after ranking. (A pre-window isNotNull filter gets
    # pushed into the join condition by Catalyst, re-evaluating the
    # whole O(d) fold once more per pair.)
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.coalesce(
            dist2_expr("__q", "__v"), F.lit(float("inf"))
        ).alias("dist2"),
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & (F.col("dist2") != float("inf")))
        .select("query_id", "rank", "neighbor_id", "dist2")
    )


def _knn_arrow(vectors, queries, k, id_col, vec_col, query_id_col, query_col):
    spark = vectors.sparkSession
    qrows = queries.select(query_id_col, query_col).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, dist2 double"
        )
    qids = [r[0] for r in qrows]
    qmat = stack_arrays([r[1] for r in qrows])
    bq = spark.sparkContext.broadcast((qids, qmat))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qmat_ = bq.value
        from vector_indexer_spark.functions.kernels import chunked_topk

        for pdf in batches:
            if pdf.empty:
                continue
            vmat = stack_arrays(pdf[vec_col])
            vids = pdf[id_col].to_numpy()
            # per-query local top-k; candidate-chunked so the scratch
            # matrix stays bounded for large query batches
            dists, ids = chunked_topk(qmat_, vmat, vids, k)
            nq, kk = dists.shape
            yield pd.DataFrame(
                {
                    "query_id": [qid for qid in qids_ for _ in range(kk)],
                    "neighbor_id": ids.reshape(-1),
                    "dist2": dists.reshape(-1),
                }
            )

    local = vectors.select(id_col, vec_col).mapInPandas(
        local_topk, "query_id long, neighbor_id long, dist2 double"
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist2")
    )
