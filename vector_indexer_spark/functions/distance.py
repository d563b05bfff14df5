"""Distance / similarity expressions over ``ARRAY<FLOAT>`` columns.

Two execution tiers, same semantics:

1. **Native Catalyst expressions** (this module's ``*_expr`` helpers):
   ``aggregate(zip_with(a, b, ...))`` folds stay inside whole-stage
   codegen on the JVM — no Python in the hot path, and the fold is
   sequential left-to-right, which makes the double-precision result
   bit-reproducible (and bit-identical to a DuckDB ``list_reduce`` of
   the same shape — the correctness oracle relies on this).
2. **Arrow/NumPy kernels** (``vector_indexer_spark.functions.kernels``)
   for the batched hot paths (k-means assignment, ANN scoring) where a
   (batch × centroids) matrix op beats per-row folds.

Reference parity: ``euclidean_distance_squared`` (F1) is the engine's
*only* distance — squared L2, no sqrt, exposed as-is in results
(reference src/utils.rs:28-30; SIMD variant src/kmeans.rs:375-419 is an
execution detail with identical semantics). ``sqrt`` (F3) exists only
as a test utility (reference tests/test_utils/mod.rs:90-98).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dist2_expr(a: Column | str, b: Column | str) -> Column:
    """F1 — squared Euclidean distance between two float-array columns.

    Double accumulation (elements cast to double exactly, fold-left sum)
    so the result is deterministic across engines; reference computes in
    f32 (src/utils.rs:28-30) — our declared tolerance vs the reference is
    1e-5-ish, matching its own tests (tests/shards_tests.rs:486-499).
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    # (x-y)*(x-y) rather than pow(x-y, 2): multiplication is bit-identical
    # across engines (pow differs by 1 ULP vs DuckDB), which keeps the
    # fold-left double sum exactly reproducible by the SQL oracle.
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def dist_expr(a: Column | str, b: Column | str) -> Column:
    """F3 — sqrt Euclidean distance (test utility only in the reference)."""
    return F.sqrt(dist2_expr(a, b))


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns (double accumulation)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column | str) -> Column:
    """L2 norm of a float-array column."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (extension beyond the reference's L2-only plane,
    used by the embedding near-dup / similarity-search operators)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))
