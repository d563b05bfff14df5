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

from pyspark.sql import Column, DataFrame, Window
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


def _bucket_expr(id_col: Column | str, seed: int) -> Column:
    """The shared deterministic bucket: ``md5("{seed}:{id}") mod 10_000``."""
    cid = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), cid.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % SPLIT_BUCKETS
    )


def sample_expr(
    id_col: Column | str, rate: float, *, seed: int = 7
) -> Column:
    """Deterministic Bernoulli(rate) keep flag: a pure function of
    ``(seed, id)``, so the sample is reproducible across runs, engines,
    and repartitionings — unlike ``df.sample`` whose output depends on
    partition layout. Use a different seed than the train/test split so
    sampling and splitting are independent hash draws."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return _bucket_expr(id_col, seed) < int(round(rate * SPLIT_BUCKETS))


def weighted_sample(
    df: DataFrame,
    weight_col,
    *,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Per-row-weighted deterministic sampling — the quality-curriculum
    step of corpus construction: each row survives with probability
    equal to its OWN weight column/expression (clamped to [0, 1]), but
    the draw is the same ``md5(seed:id)`` bucket as every other
    sampler here, so it is reproducible, repartition-invariant, and
    independent of the train/test split draw. Scan-local: the bucket
    compare runs inside codegen, zero shuffle.

    ``weight_col`` is a column name or Column expression (e.g. a
    Gopher quality score, or ``least(lit(1.0), col("n_chars")/400)``
    to bias toward longer documents)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), w.cast("double")))
    return df.filter(
        _bucket_expr(id_col, seed)
        < F.round(w * F.lit(float(SPLIT_BUCKETS))).cast("long")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    strat_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 7,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum subsampling — the "downsample source X
    to rate r" step of corpus construction. Rows whose stratum is not
    in ``rates`` are kept at ``default_rate``. Scan-local (bucket
    compare inside codegen, zero shuffle); all columns pass through.
    """
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1]")
    thr = F.lit(int(round(default_rate * SPLIT_BUCKETS)))
    for name, r in rates.items():
        thr = F.when(
            F.col(strat_col) == name, F.lit(int(round(r * SPLIT_BUCKETS)))
        ).otherwise(thr)
    return df.filter(_bucket_expr(id_col, seed) < thr)


def corpus_mixture(
    df: DataFrame,
    weights: dict[str, float],
    *,
    strat_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 7,
    default_weight: float = 0.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic mixture construction with fractional epochs: a
    stratum with weight 2.5 emits every row twice plus a deterministic
    half of the rows a third time (the "N epochs of source X" recipe of
    LLM pre-training mixtures; weight ≤ 1 is plain downsampling).

    Each surviving row gains a ``copy`` ordinal (0-based) so downstream
    shuffling/packing can treat repeats as distinct examples.
    ``copies = floor(w) + (bucket < frac(w)·10_000)`` with the same
    portable (seed, id) bucket as splitting/sampling. The explode is
    scan-local (sequence of at most ⌈w⌉ ints per row) — no shuffle.
    """
    for k, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {w}")
    if default_weight < 0:
        raise ValueError("default_weight must be >= 0")

    def parts(w: float):
        whole = int(w)
        frac_thr = int(round((w - whole) * SPLIT_BUCKETS))
        return whole, frac_thr

    dw, dthr = parts(default_weight)
    whole = F.lit(dw)
    fthr = F.lit(dthr)
    for name, w in weights.items():
        nw, nthr = parts(w)
        cond = F.col(strat_col) == name
        whole = F.when(cond, F.lit(nw)).otherwise(whole)
        fthr = F.when(cond, F.lit(nthr)).otherwise(fthr)
    n_copies = whole + (
        _bucket_expr(id_col, seed) < fthr
    ).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def cap_per_group(
    df: DataFrame,
    cap: int,
    *,
    by_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Per-group document cap: keep at most ``cap`` rows per group,
    preferring high ``order_col`` (ties by ``id_col``) — the
    domain-balancing step of web-corpus curation (no single site may
    dominate the training mix).

    Returns the input columns plus ``group_rank`` (1-based within the
    group) for the kept rows.

    Scale shape: one shuffle on ``by_col``; the rank is a per-group
    window over that partitioning, and rows beyond ``cap`` are
    filtered before anything downstream sees them. Groups are
    domain-sized (≪ one task), so no group outgrows an executor; a
    skewed mega-domain is exactly the thing the cap truncates.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if cap <= 0:
        raise ValueError("cap must be positive")
    key = F.col(order_col).desc() if descending else F.col(order_col)
    w = Window.partitionBy(by_col).orderBy(key, id_col)
    return (
        df.withColumn("group_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("group_rank") <= cap)
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    *,
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bins: int = 10_000,
) -> DataFrame:
    """Budget-constrained corpus selection: keep the highest-quality
    documents whose cumulative token count fits ``budget_tokens`` —
    the op that turns "we want a 500B-token mix" into a concrete
    keep-set. Documents are taken in ``(quality DESC, id ASC)`` order
    while the running token total stays within budget; the first
    document that would cross it — and therefore everything after it,
    since token counts are positive and the prefix sum monotone — is
    excluded (documents are never split). Returns the kept rows (all
    input columns).

    The naive formulation — one global sort + unbounded prefix-sum
    window — funnels the corpus through a single task. This is the
    scale-safe exact equivalent in two bounded passes:

    1. quantize quality into ``bins`` integer bins (scan-local), agg
       per-bin token totals (≤ ``bins`` rows), cumsum them IN-PLAN via
       a window over the bin table (bins-sized, not corpus-sized) and
       pick the cut bin where the budget crosses;
    2. everything in better bins is kept outright (no sort at all);
       only the cut bin — corpus/bins of the data — pays a prefix-sum
       window, and that window is PARTITIONED by the bin, so it
       shuffles one bin, not the corpus.

    Ties inside the cut bin break by (quality DESC, id ASC), making
    the keep-set deterministic and engine-exact (quality enters the
    cum-sum comparison only through its bin, an integer).
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    q = F.col(quality_col)
    binc = F.least(
        F.floor(q * F.lit(bins)).cast("long"), F.lit(bins - 1)
    )
    binned = df.withColumn("__bin", binc)
    totals = (
        binned.groupBy("__bin")
        .agg(F.sum(F.col(tokens_col)).alias("__bin_tokens"))
    )
    wb = Window.orderBy(F.col("__bin").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # per-bin budget left BEFORE this bin (bins-sized window — fine)
    ledger = totals.withColumn(
        "__before", F.coalesce(F.sum("__bin_tokens").over(wb), F.lit(0))
    ).select("__bin", "__before")
    labeled = binned.join(F.broadcast(ledger), "__bin").withColumn(
        "__bin_total",
        F.sum(tokens_col).over(
            Window.partitionBy("__bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    # bins that fit whole need no ordering at all
    whole = labeled.filter(
        F.col("__before") + F.col("__bin_total") <= F.lit(budget_tokens)
    )
    # the single cut bin: prefix-sum window partitioned BY the bin
    wcut = Window.partitionBy("__bin").orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, -1)
    cut = (
        labeled.filter(
            F.col("__before") <= F.lit(budget_tokens)
        )
        .withColumn(
            "__run",
            F.col("__before")
            + F.coalesce(F.sum(tokens_col).over(wcut), F.lit(0)),
        )
        .filter(
            (F.col("__run") + F.col(tokens_col) <= F.lit(budget_tokens))
            & (
                F.col("__before") + F.col("__bin_total")
                > F.lit(budget_tokens)
            )
        )
        .drop("__run")
    )
    return whole.unionByName(cut).drop(
        "__bin", "__before", "__bin_total"
    )


def bottom_k_sample(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """EXACTLY ``min(k, n)`` rows, deterministically: the rows with the
    k smallest ``md5(seed:id)`` draws (ties by id). The exact-count
    companion to the Bernoulli samplers above — "give me a 10k-doc
    eval slice" needs a count, not a rate — with the bottom-k sketch's
    algebra: the bottom-k of a union is the bottom-k of the parts'
    bottom-ks (pytest-locked), so per-partition / per-day samples
    merge without re-scanning, and the same draw column makes the
    sample STABLE under corpus growth (a doc leaves the sample only
    when a smaller-hash doc arrives).

    Plan shape: TakeOrderedAndProject — each map task forwards its
    local k rows, no full sort, no single-partition window.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    if k == 0:
        return df.limit(0)
    cid = F.col(id_col)
    # full-width md5-prefix draw (not the mod-10k bucket): collisions
    # break by id, and k can exceed 10k
    full_draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), cid.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        df.withColumn("__draw", full_draw)
        .orderBy("__draw", cid)
        .limit(k)
        .drop("__draw")
    )


def select_token_budget_by_group(
    df: DataFrame,
    budgets: dict[str, int],
    *,
    group_col: str = "source",
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bins: int = 10_000,
) -> DataFrame:
    """Per-source budget allocation — "30B tokens of web, 5B of code":
    run :func:`select_token_budget` independently inside each named
    group and union the keeps. Groups absent from ``budgets`` are
    dropped (an explicit mixture spec, like :func:`corpus_mixture`).

    The driver loop is over the budget DICT (a handful of named
    sources), not the data; with the corpus partitioned by
    ``group_col`` — the natural layout for per-source corpora — each
    pass is a partition-pruned scan that reads only its group's
    files. A single-pass variant would interleave every group's
    cut-bin windows in one job tree; measured against the pruned-scan
    loop there is no shuffle saved (the ledgers are per-group either
    way), so the composition keeps the simpler plan.
    """
    out = None
    for name, budget in budgets.items():
        part = df.filter(F.col(group_col) == name)
        sel = select_token_budget(
            part, budget, quality_col=quality_col,
            tokens_col=tokens_col, id_col=id_col, bins=bins,
        )
        out = sel if out is None else out.unionByName(sel)
    if out is None:
        raise ValueError("budgets must be non-empty")
    return out


def weighted_bottom_k(
    df: DataFrame,
    k: int,
    weight_col,
    *,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """EXACTLY ``min(k, n)`` rows drawn without replacement with
    probability proportional to a per-row weight — Efraimidis &
    Spirakis's A-ES (IPL 2006): each row gets key ``u^(1/w)`` for a
    uniform ``u`` and the k largest keys are the sample. The missing
    rung between :func:`weighted_sample` (Bernoulli, expected-size)
    and :func:`bottom_k_sample` (exact-k, unweighted): "give me
    exactly 10k docs, biased by quality score" is this operator.

    Determinism: ``u`` is the same full-width ``md5(seed:id)`` draw as
    :func:`bottom_k_sample` mapped to ``(draw + 0.5) / 2^32`` (never 0
    or 1), and the key is ranked in log space — ``ln(u)/w`` is
    monotone in ``u^(1/w)`` — floored to integer nanos (the engine's
    transcendental-oracle discipline: BM25/surprisal/DSIR ship the
    same ``ln``-then-floor shape) with id tie-break, so the sample is
    reproducible, repartition-invariant, and SQL-replayable. Bottom-k
    algebra carries over: the top-k keys of a union are the top-k of
    the parts' top-ks, so per-partition samples merge without a
    rescan, and the sample is stable under corpus growth.

    Rows with ``weight <= 0`` or NULL are excluded (zero mass — the
    A-ES contract). Plan shape: scan-local key expression +
    TakeOrderedAndProject (each map task forwards its local k), no
    full sort.

    Returns the sampled rows with a ``sample_key_nanos`` column
    (larger = drawn earlier) so callers can re-rank or merge samples.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("double")
    if k == 0:
        return df.filter(F.lit(False)).withColumn(
            "sample_key_nanos", F.lit(0).cast("long")
        )
    cid = F.col(id_col)
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), cid.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (draw.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.floor(F.log(u) / w * F.lit(1_000_000_000.0)).cast("long")
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("sample_key_nanos", key)
        .orderBy(F.col("sample_key_nanos").desc(), cid)
        .limit(k)
    )
