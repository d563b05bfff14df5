"""Deterministic dataset splitting — the train/val/test assignment step
of a training-data pipeline.

Hash-based, not random: each row's split is a pure function of
``(seed, id)`` via the engine's portable md5-derived hash, so the
assignment is reproducible across runs, engines, and repartitionings —
``df.randomSplit`` (partition-order-dependent) cannot give that
guarantee, and at 100 TB "which rows were in train?" must never depend
on task scheduling. Scan-local projection; oracle-checked
(``split_assign`` in entry_queries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def split_expr(
    id_col: Column | str,
    weights: dict[str, float],
    *,
    seed: int = 42,
) -> Column:
    """STRING split label for an id column.

    ``bucket = md5("{seed}:{id}") mod 10_000`` mapped onto cumulative
    weight ranges (insertion order). Weights must sum to 1 within 1e-9;
    ranges are half-open, the final split absorbs rounding.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    cid = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), cid.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % SPLIT_BUCKETS
    )
    names = list(weights)
    cum = 0.0
    out = F.lit(names[-1])  # last split absorbs rounding remainder
    cases = []
    for name in names[:-1]:
        cum += weights[name]
        cases.append((name, int(round(cum * SPLIT_BUCKETS))))
    for name, hi in reversed(cases):
        out = F.when(bucket < hi, F.lit(name)).otherwise(
            out if not isinstance(out, str) else F.lit(out)
        )
    return out


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    *,
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Append the deterministic split label; all columns pass through."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn(out_col, split_expr(id_col, weights, seed=seed))


def split_leakage(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    train_split: str = "train",
) -> DataFrame:
    """Cross-split contamination audit: duplicate text content that
    landed in BOTH the train split and some eval split — exactly the
    leakage a hash split cannot prevent when the corpus itself contains
    duplicates (dedup before splitting, or decontaminate after).

    Returns one row per leaking content group:
    ``(content_hash, train_ids, eval_ids)`` with the member ids sorted.
    Plan: one content-hash aggregation (map-side combined) over
    (hash, split) — the same single-shuffle shape as exact dedup.
    """
    labeled = hash_split(
        df, weights, id_col=id_col, seed=seed, out_col="__split"
    ).select(
        F.col(id_col).alias("__id"),
        F.sha2(F.col(text_col), 256).alias("content_hash"),
        "__split",
    )
    grouped = labeled.groupBy("content_hash").agg(
        F.sort_array(
            F.collect_list(
                F.when(F.col("__split") == train_split, F.col("__id"))
            )
        ).alias("train_ids"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("__split") != train_split, F.col("__id"))
            )
        ).alias("eval_ids"),
    )
    return grouped.filter(
        (F.size("train_ids") > 0) & (F.size("eval_ids") > 0)
    )
