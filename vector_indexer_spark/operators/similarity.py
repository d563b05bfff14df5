"""Similarity search over embedding columns.

Extension operators (the "similarity search" pillar of the
training-data pipeline): brute-force cosine top-k as the exact
baseline, and an IVF-accelerated cosine path built on the engine's own
index by the classic reduction — for unit vectors,
``cos(a,b) = 1 − dist2(â, b̂)/2`` — so cosine ANN *is* L2 ANN on
normalized vectors, reusing build/search/pruning unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_indexer_spark.functions.distance import cosine_expr, norm_expr
from vector_indexer_spark.operators.index_build import IvfIndex, build_index
from vector_indexer_spark.operators.search import search_index


def normalize_vectors(
    df: DataFrame, *, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """L2-normalize an embedding column (zero vectors pass through).

    The norm is hoisted into a temporary column first: referencing the
    aggregate inside the per-element transform lambda would re-evaluate
    the whole O(d) fold for every element (O(d²) per row — Catalyst
    does not CSE across a higher-order-function boundary).
    """
    out_col = out_col or vec_col
    tmp = "__norm"
    while tmp in df.columns:  # never clobber a caller's column
        tmp += "_"
    n = F.col(tmp)
    normed = F.when(
        n > 0,
        F.transform(F.col(vec_col), lambda x: (x.cast("double") / n).cast("float")),
    ).otherwise(F.col(vec_col))
    return (
        df.withColumn(tmp, norm_expr(vec_col))
        .withColumn(out_col, normed)
        .drop(tmp)
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Exact cosine top-k (descending, ties by neighbor id) — the
    brute-force baseline, fully oracle-checkable."""
    if k <= 0:
        raise ValueError("k must be positive")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_col).alias("__q")
    )
    scored = vectors.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_expr("__q", F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def build_cosine_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **build_kwargs,
) -> IvfIndex:
    """Build an IVF index over *normalized* vectors — the cosine ANN
    scale path (brute cosine is O(n) per query; this prunes like any
    IVF search)."""
    normed = normalize_vectors(df, vec_col=vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("values")
    )
    return build_index(normed, path, **build_kwargs)


def search_cosine(
    spark: SparkSession,
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 20,
    *,
    query_id_col: str = "query_id",
    query_col: str = "query",
    **kwargs,
) -> DataFrame:
    """Cosine ANN: normalize queries, run L2 search on the normalized
    index, convert dist2 back to cosine (cos = 1 − d²/2)."""
    qn = normalize_vectors(queries, vec_col=query_col)
    out = search_index(
        spark,
        index,
        qn,
        k=k,
        n_probe=n_probe,
        query_id_col=query_id_col,
        query_col=query_col,
        **kwargs,
    )
    return out.select(
        "query_id",
        "rank",
        "neighbor_id",
        (F.lit(1.0) - F.col("dist2") / F.lit(2.0)).alias("cosine"),
    )
