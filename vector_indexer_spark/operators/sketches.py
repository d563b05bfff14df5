"""Mergeable sketches — HyperLogLog distinct counts and Count-Min
frequency estimates, built deterministically so every register is
SQL-checkable.

At 100 TB, exact ``COUNT(DISTINCT)`` and exact per-key counts are the
queries that hurt: both shuffle the full key set. Sketches replace
them with a bounded-size state that (a) computes in ONE map-side
combinable aggregation over the scan and (b) MERGES across days /
partitions / clusters by element-wise max (HLL) or sum (CMS) — the
property that makes incremental corpus accounting free.

Design choice — determinism over speed-of-hash: registers derive from
``md5`` (first 15 hex chars → a 60-bit integer), not from the engine's
native hash. md5 is bit-identical across Spark, DuckDB, and any other
engine, so the *entire sketch state* (not just a final estimate) can
be oracle-verified, and sketches built by different systems merge
correctly. The hash costs more than xxhash64; at scan time it is
still cheap next to I/O, and a production deployment can swap the
hash expression in one place.

No counterpart in the reference (an ANN engine); this is the
training-data-pipeline surface: corpus-level distinct counts (unique
users / URLs / shingles) and heavy-hitter detection without a
full-cardinality shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BITS = 60  # 15 hex chars of md5 → fits a signed long exactly


def _hash60(col: F.Column) -> F.Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5(value).

    Identical in DuckDB as
    ``CAST(concat('0x', substr(md5(v), 1, 15)) AS BIGINT)``.
    """
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def _salted_bucket(col: F.Column, salt: str, width: int) -> F.Column:
    """Salted hash bucket — shared by the CMS rows and Bloom positions."""
    return _hash60(F.concat(F.lit(salt), col.cast("string"))) % F.lit(width)


def hll_register_rho(
    col: F.Column, p: int
) -> tuple[F.Column, F.Column]:
    """(register, rho) expressions for one value — shared by the batch
    and streaming register aggregations."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    rest_bits = _BITS - p
    h = _hash60(col)
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + F.lit(1)
    )
    return F.shiftright(h, rest_bits), rho.cast("int")


def hll_registers(
    df: DataFrame,
    col: str,
    *,
    p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table for one column: ``(register,
    max_rho)`` over the 2**p registers that saw at least one value.

    register = top ``p`` hash bits; rho = 1 + number of leading zeros
    in the remaining ``60-p`` bits (computed exactly via the length of
    the binary string — no float log anywhere). One map-side-combined
    MAX aggregation; output is ≤ 2**p rows regardless of input scale.

    ``group_cols`` turns this into a sketch-per-group rollup (e.g.
    distinct users per event type / per day): output grows to
    |groups| × 2**p rows max, and each group's slice is itself a
    mergeable sketch — the OLAP-cube use, where per-cell sketches
    roll up to any coarser cell by max.

    Two register tables merge by ``union → groupBy register → max`` —
    see :func:`hll_merge`; the estimate comes from
    :func:`hll_estimate`.
    """
    reg, rho = hll_register_rho(F.col(col), p)
    gcols = list(group_cols or [])
    return (
        df.filter(F.col(col).isNotNull())
        .select(*gcols, reg.alias("register"), rho.alias("rho"))
        .groupBy(*gcols, "register")
        .agg(F.max("rho").alias("max_rho"))
        .orderBy(*gcols, "register")
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge HLL register tables (same ``p``) — element-wise max.

    This is the whole point of the sketch at warehouse scale: per-day
    / per-source register tables (2**p rows each) combine without
    touching the raw data again.
    """
    if not register_tables:
        raise ValueError("need at least one register table")
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return (
        out.groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
        .orderBy("register")
    )


def hll_estimate(registers: DataFrame, *, p: int = 12) -> float:
    """Distinct-count estimate from a register table.

    Standard HLL estimator with the small-range (linear counting)
    correction. Driver-side over ≤ 2**p rows — bounded regardless of
    data scale; summed in register order so the result is
    deterministic.
    """
    m = 1 << p
    rows = registers.orderBy("register").collect()
    seen = {int(r["register"]): int(r["max_rho"]) for r in rows}
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )
    inv_sum = 0.0
    for j in range(m):
        inv_sum += math.ldexp(1.0, -seen.get(j, 0))
    estimate = alpha * m * m / inv_sum
    zeros = m - len(seen)
    if estimate <= 2.5 * m and zeros > 0:
        estimate = m * math.log(m / zeros)
    return estimate


def cms_table(
    df: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-Min sketch table for one column: ``(d, bucket, cnt)`` for
    ``depth`` salted hash rows of ``width`` buckets.

    Each value lands in one bucket per row (salt ``d:`` prefixed into
    the hash input); counts are plain map-side-combined sums, so two
    CMS tables merge by bucket-wise addition and the state is
    ``depth × width`` rows at any input scale. Lookups take the MIN
    across rows (:func:`cms_lookup`) — an upper bound on the true
    count, tight for heavy keys.

    ``group_cols`` yields a sketch per group (per day / per source),
    each slice independently mergeable by bucket-wise SUM — the
    rollup-cube use, mirroring ``hll_registers(group_cols=...)``.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2: {depth}, {width}")
    gcols = list(group_cols or [])
    rows = df.filter(F.col(col).isNotNull())
    buckets = F.array(
        *[
            _salted_bucket(F.col(col), f"{d}:", width)
            for d in range(depth)
        ]
    )
    return (
        rows.select(*gcols, F.posexplode(buckets).alias("d", "bucket"))
        .groupBy(*gcols, "d", "bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy(*gcols, "d", "bucket")
    )


def cms_trailing_merge(
    grouped_cms: DataFrame,
    *,
    bucket_col: str,
    trailing: int,
    bucket_step: int = 1,
) -> DataFrame:
    """Trailing-window Count-Min rollup: for every time bucket, the
    bucket-wise SUM of the last ``trailing`` per-bucket sketches —
    "heavy hitters over the trailing 7 days, daily" without touching
    raw data again (the twin of :func:`hll_trailing_merge`; CMS merges
    by SUM where HLL merges by MAX). Input is
    ``cms_table(group_cols=[bucket_col])`` output; each sketch row
    fans out to its ≤ ``trailing`` windows, then one map-side-combined
    SUM per (window, d, bucket). Feed any window's slice to
    :func:`cms_lookup` / :func:`heavy_hitters`.
    """
    if trailing < 1:
        raise ValueError("trailing must be >= 1")
    if bucket_step < 1:
        raise ValueError("bucket_step must be >= 1")
    offs = F.array(*[F.lit(i * bucket_step) for i in range(trailing)])
    fanned = grouped_cms.select(
        F.explode(offs).alias("__off"),
        (F.col(bucket_col) + F.col("__off")).alias(bucket_col),
        "d",
        "bucket",
        "cnt",
    )
    anchors = grouped_cms.select(bucket_col).distinct()
    return (
        fanned.join(anchors, bucket_col, "left_semi")
        .groupBy(bucket_col, "d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(bucket_col, "d", "bucket")
    )


def cms_lookup(
    cms: DataFrame,
    items: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated count per item: MIN over the sketch rows of the
    item's bucket count. ``items`` is a (small) frame of candidate
    keys; the sketch side is depth×width rows and broadcasts.
    """
    probes = items.select(
        F.col(col),
        F.posexplode(
            F.array(
                *[
                    _salted_bucket(F.col(col), f"{d}:", width)
                    for d in range(depth)
                ]
            )
        ).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
        )
        .orderBy(col)
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Exact top-k keys by count, with the CMS estimate alongside —
    the validation report a pipeline runs before trusting the sketch
    as a pre-filter at full scale.

    The exact side is one count aggregation + TakeOrdered(k); the CMS
    estimate joins from the bounded sketch. (In the 100 TB deployment
    the exact pass is what you're *replacing*; there the CMS pre-
    filters candidate keys so the exact count runs over a semi-joined
    slice only.)
    """
    exact = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col(col))
        .limit(k)
    )
    sketch = cms_table(df, col, depth=depth, width=width)
    est = cms_lookup(sketch, exact, col, depth=depth, width=width)
    return (
        exact.join(est, col)
        .select(col, "exact_count", "est_count")
        .orderBy(F.col("exact_count").desc(), F.col(col))
    )


def bloom_bits(
    df: DataFrame,
    col: str,
    *,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter bit set for one column: the DISTINCT positions set
    by ``k_hashes`` salted hashes per value — ``(bit,)`` rows, at most
    ``m_bits`` of them whatever the input size.

    Same determinism contract as the other sketches: positions derive
    from md5, so the bit set is engine-portable and merge across
    sources is a plain union-distinct. The operational use is JOIN
    PRUNING (:func:`bloom_prefilter`): build bits from the small
    side's keys, broadcast them, and drop big-side rows scan-locally
    before the shuffle join — the Bloom-join reduction every warehouse
    engine applies at scale.
    """
    if m_bits < 2 or k_hashes < 1:
        raise ValueError(
            f"need m_bits >= 2, k_hashes >= 1: {m_bits}, {k_hashes}"
        )
    rows = df.filter(F.col(col).isNotNull())
    positions = F.array(
        *[
            _salted_bucket(F.col(col), f"b{i}:", m_bits)
            for i in range(k_hashes)
        ]
    )
    return (
        rows.select(F.explode(positions).alias("bit"))
        .distinct()
        .orderBy("bit")
    )


def bloom_might_contain(
    bits: DataFrame,
    items: DataFrame,
    col: str,
    *,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Membership probe: ``(col, might_contain)`` — true iff ALL
    ``k_hashes`` positions for the value are present in ``bits``
    (no false negatives; false-positive rate ≈ (1−e^{−kn/m})^k).
    The bit set broadcasts; the probe is one small join + AND-agg.
    """
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    _salted_bucket(F.col(col), f"b{i}:", m_bits)
                    for i in range(k_hashes)
                ]
            )
        ).alias("bit"),
    )
    hit = F.broadcast(bits.withColumn("__present", F.lit(True)))
    return (
        probes.join(hit, "bit", "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("__present"), F.lit(False))).alias(
                "might_contain"
            )
        )
        .orderBy(col)
    )


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    col: str,
    *,
    small_col: str | None = None,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Bloom-join reduction: keep only ``big`` rows whose ``col``
    MIGHT appear in ``small``'s key set — a scan-local pre-filter
    (broadcast bit set, no shuffle of ``big``) that shrinks the
    shuffle the real join pays afterward. Exactness is unaffected:
    Bloom has no false negatives, and the subsequent join removes
    false positives.
    """
    bits = bloom_bits(
        small.select(F.col(small_col or col).alias(col)),
        col,
        m_bits=m_bits,
        k_hashes=k_hashes,
    )
    # positions recompute on the big side scan-locally; membership is
    # k broadcast left joins against the bit set ANDed together
    probe = big
    hit = F.broadcast(bits.withColumn("__present", F.lit(True)))
    cond = F.lit(True)
    for i in range(k_hashes):
        probe = probe.withColumn(
            f"__b{i}", _salted_bucket(F.col(col), f"b{i}:", m_bits)
        )
    joined = probe
    for i in range(k_hashes):
        joined = joined.join(
            hit.select(
                F.col("bit").alias(f"__bit{i}"),
                F.col("__present").alias(f"__p{i}"),
            ),
            F.col(f"__b{i}") == F.col(f"__bit{i}"),
            "left",
        )
        cond = cond & F.coalesce(F.col(f"__p{i}"), F.lit(False))
    drop = [f"__b{i}" for i in range(k_hashes)] + [
        f"__bit{i}" for i in range(k_hashes)
    ] + [f"__p{i}" for i in range(k_hashes)]
    return joined.filter(cond).drop(*drop)


def hdr_histogram(
    df: DataFrame,
    col: str,
    *,
    scale: int = 100,
    sub_bits: int = 5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable quantile sketch — an HDR-histogram in pure integer
    arithmetic: values quantize to units (``floor(v·scale)``, ≥ 0),
    then bucket by (binary exponent, top ``sub_bits`` mantissa bits).
    Output ``(exp, sub, cnt)`` — at most ``64·2^sub_bits`` rows at any
    input size, merging by bucket-wise sum; every quantile read from
    it (:func:`hdr_quantiles`) carries a guaranteed relative error
    ≤ 2^−sub_bits.

    The usual HDR/t-digest construction needs float logs or stateful
    centroids; exponent = ``length(bin(x))`` and shifts keep this one
    bit-reproducible and SQL-checkable like the other sketches. Zero
    maps to the dedicated (−1, 0) bucket; negative inputs are a
    contract violation the caller filters (latencies, sizes, prices).
    """
    if scale < 1 or not 1 <= sub_bits <= 16:
        raise ValueError(
            f"need scale >= 1, sub_bits in [1,16]: {scale}, {sub_bits}"
        )
    x = F.floor(F.col(col) * F.lit(scale)).cast("long")
    n = F.length(F.bin(x))  # MSB position for x >= 1
    e = (n - F.lit(1)).cast("int")
    # shift amount is data-dependent — F.shiftright only takes an int
    # literal, so call the SQL function form with a column operand
    sub = F.when(e < sub_bits, x).otherwise(
        F.call_function("shiftright", x, e - F.lit(sub_bits))
    )
    gcols = list(group_cols or [])
    out = df.filter(F.col(col).isNotNull()).select(
        *gcols,
        F.when(x <= 0, F.lit(-1)).otherwise(e).alias("exp"),
        F.when(x <= 0, F.lit(0)).otherwise(sub).cast("long").alias("sub"),
    )
    return (
        out.groupBy(*gcols, "exp", "sub")
        .agg(F.count("*").alias("cnt"))
        .orderBy(*gcols, "exp", "sub")
    )


def hdr_quantiles(
    hist: DataFrame,
    probs: list[float],
    *,
    scale: int = 100,
    sub_bits: int = 5,
) -> list[float]:
    """Quantile estimates from an HDR histogram (driver-side over the
    bounded bucket table): for each probability, the midpoint of the
    bucket holding that rank, de-quantized back through ``scale``.
    Relative error ≤ 2^−sub_bits by construction.
    """
    if any(not 0 <= p <= 1 for p in probs):
        raise ValueError("probs must be fractions in [0, 1]")
    rows = hist.orderBy("exp", "sub").collect()
    total = sum(r["cnt"] for r in rows)
    if total == 0:
        return [float("nan")] * len(probs)

    def bucket_bounds(exp, sub):
        if exp < 0:
            return 0, 0
        if exp < sub_bits:
            return sub, sub
        lo = sub << (exp - sub_bits)
        hi = (sub + 1) << (exp - sub_bits)
        return lo, hi - 1

    out = []
    for p in probs:
        rank = p * (total - 1)
        seen = 0
        val = None
        for r in rows:
            if seen + r["cnt"] > rank:
                lo, hi = bucket_bounds(r["exp"], r["sub"])
                val = (lo + hi) / 2.0 / scale
                break
            seen += r["cnt"]
        if val is None:
            lo, hi = bucket_bounds(rows[-1]["exp"], rows[-1]["sub"])
            val = (lo + hi) / 2.0 / scale
        out.append(val)
    return out


def hll_trailing_merge(
    grouped_registers: DataFrame,
    *,
    bucket_col: str,
    trailing: int,
    bucket_step: int = 1,
) -> DataFrame:
    """Trailing-window sketch rollup: for every bucket (hour/day), the
    merged HLL registers of the last ``trailing`` buckets — the
    "distinct users over the trailing 7 days, daily" report computed
    WITHOUT re-touching raw data: input is the per-bucket register
    table from :func:`hll_registers(group_cols=[bucket_col])`, i.e.
    ≤ |buckets|·2^p rows total, and each output window is one
    element-wise MAX over ``trailing`` slices.

    Physical shape: each register row fans out to the ≤ ``trailing``
    windows it participates in (bounded ×trailing expansion of an
    already-sketch-sized table), then one map-side-combined MAX per
    (window, register). Feed any window's slice to
    :func:`hll_estimate`. ``bucket_step`` is the numeric distance
    between adjacent buckets (1 for dense integer buckets; 3600·10⁹
    for epoch-ns hours).
    """
    if trailing < 1:
        raise ValueError("trailing must be >= 1")
    if bucket_step < 1:
        raise ValueError("bucket_step must be >= 1")
    offs = F.array(*[F.lit(i * bucket_step) for i in range(trailing)])
    fanned = grouped_registers.select(
        F.explode(offs).alias("__off"),
        (F.col(bucket_col) + F.col("__off")).alias(bucket_col),
        "register",
        "max_rho",
    )
    # emit only windows anchored at buckets that exist in the input —
    # offsets past the last bucket would otherwise surface phantom
    # partial windows (semi-join against the tiny bucket list)
    buckets = grouped_registers.select(bucket_col).distinct()
    return (
        fanned.join(buckets, bucket_col, "left_semi")
        .groupBy(bucket_col, "register")
        .agg(F.max("max_rho").alias("max_rho"))
        .orderBy(bucket_col, "register")
    )
