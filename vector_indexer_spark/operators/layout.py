"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning.

Partition pruning handles ONE dimension (the partition key); parquet
row-group min/max stats handle a second only if the file happens to be
sorted by it. Z-ordering interleaves the bits of several columns into
one sort key, so a range-partitioned, sorted write gives every file a
small bounding box in EVERY z-ordered dimension — min/max stats then
prune files for predicates on ANY of them (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` idea, built from plain DataFrame ops).

The z-key is a static Catalyst expression (shift/mask/add — disjoint
bits, so ``+`` is ``|``), fully inside whole-stage codegen and
expressible verbatim in DuckDB for the oracle. Layout is one
``repartitionByRange(zkey) + sortWithinPartitions(zkey)`` — a single
range shuffle, the same movement a one-column sorted write costs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(cols: list[Column | str], *, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Inputs must be non-negative integers below ``2**bits`` (pre-scale
    with :func:`scale_to_bits` otherwise); total key width
    ``bits * len(cols)`` must fit a signed long (≤ 62).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits < 1 or bits * n > 62:
        raise ValueError(
            f"bits * n_cols must be in [1, 62]: {bits} * {n}"
        )
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    terms = []
    for b in range(bits):
        for j, c in enumerate(cs):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)),
                    b * n + j,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(cols: list[str], *, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key_expr` (oracle parity)."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + j})"
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return " + ".join(terms)


def scale_to_bits(
    col: Column | str, lo: float, hi: float, *, bits: int = 16
) -> Column:
    """Map a numeric range [lo, hi] onto [0, 2**bits): clamp, shift,
    scale, floor. Deterministic (one IEEE multiply+divide per row)."""
    if hi <= lo:
        raise ValueError(f"need hi > lo: [{lo}, {hi}]")
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    clamped = F.least(F.greatest(c, F.lit(float(lo))), F.lit(float(hi)))
    frac = (clamped - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.floor(frac * F.lit(float(1 << bits))).cast("long"),
        F.lit((1 << bits) - 1),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` z-ordered on ``cols``: one range shuffle on the
    Morton key, sorted within partitions, key dropped from the output.

    Every output file then holds a compact z-range = a small bounding
    box in each dimension, so parquet min/max stats prune files for
    predicates on ANY of the z-ordered columns. At warehouse scale
    ``num_files`` comes from target file size (e.g. 1 GB), not a
    constant.
    """
    if num_files < 1:
        raise ValueError("num_files must be >= 1")
    keyed = df.withColumn("__zkey", zorder_key_expr(cols, bits=bits))
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
