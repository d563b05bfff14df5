"""Table profiling — the ANALYZE / dataset-card report.

One scan produces per-column statistics (non-null count, null count,
distinct count, min/max) for any column list, unpivoted to one row
per column. This is the first query every pipeline runs against a new
100 TB drop: schema sanity, null rates, key cardinalities.

Scale shape: ALL statistics come from a single aggregation pass —
column stats are parallel aggregate expressions over one scan, never
per-column jobs. Exact distinct counts expand the aggregation buffer
per distinct column (Spark's Expand operator); at warehouse scale
pass ``distinct="approx"`` to swap in ``approx_count_distinct``
(HLL-based, one pass, no expand) — the same trade
:mod:`~vector_indexer_spark.operators.sketches` makes explicit.

min/max render as strings so the unpivoted rows are homogeneous;
floating-point, array, and binary columns report NULL there (their
text rendering is engine-specific, and a min over float NaNs is not
meaningful) while their counts remain real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# types whose min/max text rendering is stable and meaningful
_REPR_OK_PREFIXES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "string",
    "date",
    "timestamp",
    "boolean",
    "decimal",
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    distinct: str = "exact",
) -> DataFrame:
    """Per-column profile: ``(col_name, dtype, n_nonnull, n_null,
    n_distinct, min_repr, max_repr)``, one row per column, ordered by
    column name.

    ``distinct="exact"`` uses ``count_distinct`` (bit-reproducible,
    oracle-checkable); ``"approx"`` uses ``approx_count_distinct``
    for the one-pass warehouse-scale variant.
    """
    if distinct not in ("exact", "approx"):
        raise ValueError(f"distinct must be exact|approx: {distinct!r}")
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    dtypes = dict(df.dtypes)

    ndv = F.count_distinct if distinct == "exact" else (
        lambda c: F.approx_count_distinct(c)
    )
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        repr_ok = dtypes[c].startswith(_REPR_OK_PREFIXES)
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            ndv(F.col(c)).alias(f"{c}__ndv"),
            (
                F.min(F.col(c)).cast("string")
                if repr_ok
                else F.lit(None).cast("string")
            ).alias(f"{c}__min"),
            (
                F.max(F.col(c)).cast("string")
                if repr_ok
                else F.lit(None).cast("string")
            ).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)

    # unpivot the single stats row into one row per column; stack()
    # keeps this inside the same plan (no driver round-trip)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.lit(dtypes[c]),
            F.col(f"{c}__nn"),
            (F.col("__total") - F.col(f"{c}__nn")).cast("long"),
            F.col(f"{c}__ndv"),
            F.col(f"{c}__min"),
            F.col(f"{c}__max"),
        ]
    return (
        one.select(
            F.stack(
                F.lit(len(cols)),
                *stack_args,
            ).alias(
                "col_name",
                "dtype",
                "n_nonnull",
                "n_null",
                "n_distinct",
                "min_repr",
                "max_repr",
            )
        )
        .orderBy("col_name")
    )


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    *,
    scale: int = 100,
) -> DataFrame:
    """Pearson correlation for every column pair in ONE aggregation
    pass: ``(col_a, col_b, n, corr)``, pairs ordered ``a < b``.

    Determinism discipline (the ``rolling_anomalies`` precedent):
    values quantize to integers (``floor(x·scale)``) BEFORE any sum,
    so the moment sums are exact longs whatever the partition order,
    and the final correlation is a fixed sequence of IEEE ops on exact
    integers — bit-reproducible by the SQL oracle. Bound: Σx·y must
    fit int64 — |x·scale| ≤ 3·10⁶ over 10⁹ rows is safe; past that,
    raise ``scale`` granularity down or pre-aggregate per partition
    into decimals.

    Scale shape: one map-side-combined aggregation (k + k² sum
    expressions), 1-row result expanded to k(k−1)/2 pair rows in-plan.
    """
    if len(cols) < 2:
        raise ValueError("need at least 2 columns")
    q = {c: F.floor(F.col(c) * F.lit(scale)).cast("long") for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(q[c]).alias(f"s_{c}"))
        aggs.append(F.sum(q[c] * q[c]).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(q[a] * q[b]).alias(f"sp_{a}_{b}"))
    one = df.agg(*aggs)

    def corr(a: str, b: str) -> F.Column:
        n = F.col("__n").cast("double")
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        ssa = F.col(f"ss_{a}").cast("double")
        ssb = F.col(f"ss_{b}").cast("double")
        sab = F.col(f"sp_{a}_{b}").cast("double")
        num = n * sab - sa * sb
        den = F.sqrt(n * ssa - sa * sa) * F.sqrt(n * ssb - sb * sb)
        return F.when(den == 0, F.lit(None)).otherwise(num / den)

    stack_args = []
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]
    for a, b in pairs:
        stack_args += [F.lit(a), F.lit(b), F.col("__n"), corr(a, b)]
    return one.select(
        F.stack(F.lit(len(pairs)), *stack_args).alias(
            "col_a", "col_b", "n", "corr"
        )
    ).orderBy("col_a", "col_b")


def psi_by_slice(
    df: DataFrame,
    value_col: str,
    *,
    by_col: str = "source",
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per corpus slice: the numeric-
    feature drift monitor (doc length, quality score, token count)
    complementing the vocabulary-KL monitor in
    ``text_analysis.source_drift_kl``. Convention: PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted.

        PSI(slice) = Σ_bins (p_b − q_b) · ln(p_b / q_b)

    over a FIXED equal-width binning of ``[lo, hi)`` plus underflow /
    overflow bins — the caller pins the bin edges, so the monitor
    never needs a global min/max pass and scores are comparable
    across runs. Add-one smoothing on counts keeps empty bins finite;
    per-bin contributions floor to integer nanos before the sum, the
    engine-wide order-independence discipline. Returns
    ``(group, n_rows, psi_nanos)``.

    Physical shape: bin ids are scan-local arithmetic; ONE map-side-
    combined count per (slice, bin) (≤ slices·(n_bins+2) rows), the
    corpus marginal aggregated from that table, a bins-sized join —
    raw rows shuffle once, everything after is sketch-sized.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if not lo < hi:
        raise ValueError("need lo < hi")
    # NULL values would fall into a NULL bin the dense grid drops while
    # still counting toward the marginal denominator — biasing every
    # smoothed q downward. Exclude them up front so counts, totals and
    # n_all all describe the same (non-null) population.
    df = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double")
    width = (hi - lo) / n_bins
    bin_id = (
        F.when(v < F.lit(lo), F.lit(-1))
        .when(v >= F.lit(hi), F.lit(n_bins))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)))
        .cast("int")
    )
    counts = (
        df.select(F.col(by_col).alias("group"), bin_id.alias("bin"))
        .groupBy("group", "bin")
        .agg(F.count("*").alias("c_slice"))
    )
    # dense (group x bin) grid so empty bins smooth identically on
    # both engines
    groups = counts.select("group").distinct()
    bins = df.sparkSession.range(-1, n_bins + 1).select(
        F.col("id").cast("int").alias("bin")
    )
    grid = groups.crossJoin(F.broadcast(bins))
    dense = grid.join(counts, ["group", "bin"], "left").withColumn(
        "c_slice", F.coalesce(F.col("c_slice"), F.lit(0))
    )
    marg = dense.groupBy("bin").agg(F.sum("c_slice").alias("c_all"))
    totals = dense.groupBy("group").agg(F.sum("c_slice").alias("n_rows"))
    n_all = df.count()
    b = n_bins + 2
    scored = (
        dense.join(F.broadcast(marg), "bin")
        .join(F.broadcast(totals), "group")
        .withColumn(
            "__p",
            (F.col("c_slice") + F.lit(1.0))
            / (F.col("n_rows") + F.lit(float(b))),
        )
        .withColumn(
            "__q",
            (F.col("c_all") + F.lit(1.0)) / F.lit(float(n_all + b)),
        )
        .withColumn(
            "__contrib",
            F.floor(
                (F.col("__p") - F.col("__q"))
                * F.log(F.col("__p") / F.col("__q"))
                * F.lit(1e9)
            ).cast("long"),
        )
    )
    return (
        scored.groupBy("group")
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.sum("__contrib").alias("psi_nanos"),
        )
        .orderBy("group")
    )


def rank_normalize(
    df: DataFrame,
    specs: dict[str, tuple[float, float]],
    *,
    bins: int = 10_000,
    suffix: str = "_pctl_micros",
) -> DataFrame:
    """Percentile-rank normalization of one or more numeric signal
    columns, at BIN resolution: for each ``col: (lo, hi)`` in
    ``specs`` append ``col + suffix`` = floor(#rows in strictly lower
    bins / n · 10⁶). Comparable scales are what let heterogeneous
    quality signals (surprisal, Gopher score, PageRank, length) blend
    into one ensemble — raw units cannot be averaged.

    Exact percentile rank is a global sort; this is the engine's
    bin-ledger pattern instead (see ``splits.select_token_budget``):
    quantize into ``bins`` equal-width bins over the caller-pinned
    ``[lo, hi)`` (± under/overflow), cumsum the bins-sized ledger, and
    broadcast it back — resolution 1/bins (0.01% at the default), no
    corpus-wide single-partition window, and deterministic because
    ranks depend on the value only through its integer bin.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not specs:
        raise ValueError("specs must be non-empty")
    n = df.count()
    out = df
    for col, (lo, hi) in specs.items():
        if not lo < hi:
            raise ValueError(f"need lo < hi for {col!r}")
        v = F.col(col).cast("double")
        width = (hi - lo) / bins
        bin_id = (
            F.when(v < F.lit(lo), F.lit(-1))
            .when(v >= F.lit(hi), F.lit(bins))
            .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)))
            .cast("int")
            .alias("__bin")
        )
        counts = (
            df.select(bin_id).groupBy("__bin").agg(F.count("*").alias("__c"))
        )
        wb = Window.orderBy("__bin").rowsBetween(
            Window.unboundedPreceding, -1
        )
        ledger = counts.withColumn(
            "__below", F.coalesce(F.sum("__c").over(wb), F.lit(0))
        ).select("__bin", "__below")
        out = (
            out.withColumn("__bin", bin_id)
            .join(F.broadcast(ledger), "__bin")
            .withColumn(
                col + suffix,
                F.expr(f"(__below * 1000000) div {n}"),
            )
            .drop("__bin", "__below")
        )
    return out


def blend_signals(
    df: DataFrame,
    specs: dict[str, tuple[float, float]],
    *,
    bins: int = 10_000,
    out_col: str = "blend_micros",
) -> DataFrame:
    """Ensemble quality score: the UNWEIGHTED MEAN of the percentile
    ranks of every signal in ``specs`` (integer micros) — the
    RefinedWeb/DCLM-style move of combining heterogeneous per-doc
    signals after rank normalization, so no signal's unit dominates.
    All input columns pass through; weighting, if wanted, is a select
    away from the per-signal ``*_pctl_micros`` columns this keeps.
    """
    ranked = rank_normalize(df, specs, bins=bins)
    total = " + ".join(c + "_pctl_micros" for c in specs)
    return ranked.withColumn(
        out_col, F.expr(f"({total}) div {len(specs)}")
    )
