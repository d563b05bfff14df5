"""Margin-based bitext mining over embedding spaces.

The canonical parallel-corpus miner for large-scale training-data
pipelines (Artetxe & Schwenk, "Margin-based Parallel Corpus Mining with
Multilingual Sentence Embeddings", ACL 2019 — the LASER/CCMatrix
recipe): a source/target pair scores not by raw cosine (unreliable
across languages — hubness) but by the RATIO margin

    margin(x, y) = cos(x, y) / (Σ_{z∈NNk(x)} cos(x,z)/(2k)
                                + Σ_{w∈NNk(y)} cos(w,y)/(2k))

— the pair's similarity relative to the mean similarity of each side's
k-neighborhood. Pairs above a threshold (typically ~1.06) are mined;
``mutual=True`` additionally requires x and y to be each other's best
margin candidate (the strictest, highest-precision variant).

Determinism contract (the oracle relies on it): per-pair cosines are
fold-exact doubles (``functions.distance.cosine_expr`` shape), but the
k-neighborhood SUMS would be order-sensitive float adds — so each
neighbor contributes ``floor(1e6·cos)`` as a BIGINT and the sums are
integer (order-free), the same integer-micros idiom as the sparse
retrieval scores. The margin is then computed from those exact
integers: ``margin = cos·(2k·1e6)/(sum_f + sum_b)`` — identical double
ops on identical inputs on both engines.

Scale posture: the default exact path cross-joins src × broadcast(tgt)
— correct when ONE side is bounded (the usual mining shape: a query
shard against a broadcastable index slice, tiled by the driver). For
two web-scale sides, pass ``candidates`` — any bounded (src_id,
tgt_id) pair frame from an ANN shortlist (IVF / graph / RaBitQ
``search → select``) — and only those pairs are scored; the
k-neighborhood sums then come from the same shortlist, matching the
paper's FAISS-shortlist practice. Either way: one window per side on
bounded frames, winners-only shuffles, no all-pairs materialization
beyond the declared candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_indexer_spark.functions.distance import cosine_expr

MICROS = 1_000_000


def _cos_micros(c: Column) -> Column:
    """Order-free integer contribution of one neighbor cosine."""
    return F.floor(c * F.lit(float(MICROS))).cast("long")


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    *,
    k: int = 4,
    threshold: float = 1.0,
    mutual: bool = False,
    src_id_col: str = "id",
    src_vec_col: str = "values",
    tgt_id_col: str = "id",
    tgt_vec_col: str = "values",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Mine aligned pairs: ``(src_id, tgt_id, cos, margin)``, one row
    per source with its best-margin target above ``threshold``
    (``mutual=True``: only pairs that are each other's best).

    ``k`` is the neighborhood size for the margin denominator (the
    paper uses 4). ``candidates``: optional bounded ``(src_id,
    tgt_id)`` frame restricting both scoring and neighborhoods to an
    ANN shortlist; default scores the full cross product with the
    target side broadcast (one side must be bounded — tile the other
    from the driver at corpus scale)."""
    if k <= 0:
        raise ValueError("k must be positive")  # P3
    s = src.select(
        F.col(src_id_col).alias("src_id"), F.col(src_vec_col).alias("__sv")
    )
    t = tgt.select(
        F.col(tgt_id_col).alias("tgt_id"), F.col(tgt_vec_col).alias("__tv")
    )
    if candidates is not None:
        # Plain shuffle joins on both id keys: `s` and `t` are
        # corpus-sized in the two-web-scale-sides mode this path exists
        # for, so neither may be broadcast (AQE still broadcasts a side
        # that turns out small at runtime). The join OUTPUT is bounded
        # by |candidates|; only the inputs are large.
        pairs = (
            candidates.select("src_id", "tgt_id")
            .join(s, "src_id")
            .join(t, "tgt_id")
        )
    else:
        pairs = s.crossJoin(F.broadcast(t))
    scored = pairs.select(
        "src_id",
        "tgt_id",
        cosine_expr("__sv", "__tv").alias("cos"),
    )
    # k-neighborhood mean contributions, integer-micros order-free.
    # Tie rule everywhere: (cos DESC, id ASC) — deterministic at equal
    # cosines, the engine-wide contract.
    wf = Window.partitionBy("src_id").orderBy(F.col("cos").desc(), "tgt_id")
    wb = Window.partitionBy("tgt_id").orderBy(F.col("cos").desc(), "src_id")
    ranked = scored.select(
        "src_id",
        "tgt_id",
        "cos",
        F.row_number().over(wf).alias("__fr"),
        F.row_number().over(wb).alias("__br"),
    )
    fsum = (
        ranked.filter(F.col("__fr") <= k)
        .groupBy("src_id")
        .agg(
            F.sum(_cos_micros(F.col("cos"))).alias("__fsum"),
            F.count(F.lit(1)).alias("__fn"),
        )
    )
    bsum = (
        ranked.filter(F.col("__br") <= k)
        .groupBy("tgt_id")
        .agg(
            F.sum(_cos_micros(F.col("cos"))).alias("__bsum"),
            F.count(F.lit(1)).alias("__bn"),
        )
    )
    # margin from exact integers: cos·(fn+bn)·1e6 / (fsum+bsum) — the
    # (fn+bn) factor generalizes 2k to boundary cases (fewer than k
    # neighbors exist when a side is smaller than k)
    withm = (
        scored.join(F.broadcast(fsum), "src_id")
        .join(F.broadcast(bsum), "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cos",
            # Denominator guard: with non-positive neighborhood cosines
            # (anti-correlated corpora) fsum+bsum can be 0 (Spark Divide
            # → NULL, DuckDB → ±inf: an oracle parity edge) or negative
            # (flips the ordering). -inf sorts last under DESC on both
            # engines and never passes a margin threshold.
            F.when(
                (F.col("__fsum") + F.col("__bsum")) > 0,
                F.col("cos")
                * (
                    (F.col("__fn") + F.col("__bn")).cast("double")
                    * F.lit(float(MICROS))
                )
                / (F.col("__fsum") + F.col("__bsum")).cast("double"),
            )
            .otherwise(F.lit(float("-inf")))
            .alias("margin"),
        )
    )
    wbest = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), "tgt_id"
    )
    best = (
        withm.withColumn("__r", F.row_number().over(wbest))
        .filter((F.col("__r") == 1) & (F.col("margin") > threshold))
        .drop("__r")
    )
    if not mutual:
        return best
    wtbest = Window.partitionBy("tgt_id").orderBy(
        F.col("margin").desc(), "src_id"
    )
    tbest = (
        withm.withColumn("__r", F.row_number().over(wtbest))
        .filter(F.col("__r") == 1)
        .select(
            F.col("src_id").alias("__bs"), F.col("tgt_id").alias("__bt")
        )
    )
    return best.join(
        F.broadcast(tbest),
        (best.src_id == F.col("__bs")) & (best.tgt_id == F.col("__bt")),
    ).select("src_id", "tgt_id", "cos", "margin")
