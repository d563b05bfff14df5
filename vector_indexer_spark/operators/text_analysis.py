"""Document-level text analysis operators (DataFrame in → DataFrame out).

Thin operator wrappers over the Catalyst expressions in
``functions.text`` — each is a scan-local projection (no shuffle, no
UDF, whole-stage codegen) over a ``documents``-shaped table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_indexer_spark.functions.text import (
    alpha_ratio_expr,
    digit_ratio_expr,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    space_ratio_expr,
    stopword_count_expr,
    stopword_ratio_expr,
    token_count_expr,
)


def text_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document statistics: length, token count, character-class
    ratios, stopword ratio, quality score."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        token_count_expr(text_col).alias("n_tokens"),
        digit_ratio_expr(text_col).alias("digit_ratio"),
        space_ratio_expr(text_col).alias("space_ratio"),
        alpha_ratio_expr(text_col).alias("alpha_ratio"),
        stopword_count_expr(text_col).alias("n_stopwords"),
        stopword_ratio_expr(text_col).alias("stopword_ratio"),
        quality_score_expr(text_col).alias("quality"),
    )


def language_id(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID ('en'/'de'/'fr'/'es'/'und')."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        lang_id_expr(text_col).alias("lang_pred"),
    )


def fingerprints(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprints."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_expr(text_col).alias("fingerprint"),
    )


def quality_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 8,
) -> DataFrame:
    """Keep documents above quality/length thresholds (the pipeline's
    pre-training filter stage); passes all input columns through."""
    return df.filter(
        (quality_score_expr(text_col) >= min_quality)
        & (token_count_expr(text_col) >= min_tokens)
    )
