"""Distributed PCA: dimensionality reduction for embedding tables.

The standard pre-indexing transform (cf. Faiss's ``PCAR`` /
OPQ-lite): project d-dim embeddings onto the top-k principal
components before clustering/quantization — smaller vectors, denser
information per byte, cheaper distance kernels downstream.

Training is ONE distributed pass: each Arrow batch emits a single
``(count, Σx, ΣxᵀX)`` partial — the d×d Gram matrix is map-side
reduced, so the shuffle carries partitions × (d² + d) doubles and the
n×d data never moves. The driver assembles the covariance (d×d is
driver-scale for any d where eigendecomposition is sane — d=4096 is a
128 MB matrix) and runs a deterministic ``eigh``; component signs are
canonicalized (largest-|loading| entry positive) so retrains are
reproducible.

Projection is scan-local: a codegen fold per component (the
oracle-checkable path) or an Arrow GEMM per partition (the throughput
path) — zero shuffle either way.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: tuple  # d doubles
    components: tuple  # k tuples of d doubles (rows = components)
    explained_variance: tuple  # k doubles, descending

    @property
    def d(self) -> int:
        return len(self.mean)

    @property
    def k(self) -> int:
        return len(self.components)


def pca_train(
    df: DataFrame, k: int, *, vec_col: str = "values"
) -> PCAModel:
    """Fit the top-k principal components in one distributed pass."""
    if k <= 0:
        raise ValueError("k must be positive")
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("cannot fit PCA on empty input")
    d = first["d"]
    if k > d:
        raise ValueError(f"k={k} exceeds dimension {d}")
    bad = df.filter(F.size(vec_col) != d).count()  # P1 fail-fast
    if bad:
        raise ValueError(f"{bad} records have dimension != {d}")

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnt = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cnt += X.shape[0]
            s += X.sum(axis=0)
            g += X.T @ X
        if cnt:
            yield pd.DataFrame(
                {"cnt": [cnt], "s": [s], "g": [g.reshape(-1)]}
            )

    parts = df.select(vec_col).mapInPandas(
        _partials, "cnt long, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("cannot fit PCA on empty input")
    n = sum(p["cnt"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]).reshape(d, d) for p in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    # symmetrize against fp drift so eigh sees an exactly-Hermitian input
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    var = np.maximum(evals[order], 0.0)
    # canonical sign: the largest-|loading| coordinate is positive
    for j in range(comps.shape[0]):
        i = int(np.argmax(np.abs(comps[j])))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    return PCAModel(
        mean=tuple(float(x) for x in mean),
        components=tuple(tuple(float(x) for x in row) for row in comps),
        explained_variance=tuple(float(x) for x in var),
    )


def project_expr(vec: Column | str, model: PCAModel) -> Column:
    """``ARRAY<DOUBLE>`` of k projections — one deterministic fold per
    component ((x−μ)·vⱼ), pure whole-stage codegen, expressible
    verbatim in DuckDB (``list_reduce``) for the fixed-model oracle."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    mean = F.array(*[F.lit(float(m)) for m in model.mean])
    d = model.d

    def comp(row) -> Column:
        cvec = F.array(*[F.lit(float(x)) for x in row])
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(d)),
            F.lit(0.0),
            lambda acc, i: acc
            + (
                F.element_at(vec, i).cast("double") - F.element_at(mean, i)
            )
            * F.element_at(cvec, i),
        )

    return F.array(*[comp(row) for row in model.components])


def pca_project(
    df: DataFrame,
    model: PCAModel,
    *,
    id_col: str = "id",
    vec_col: str = "values",
    out_col: str = "projection",
    method: str = "native",
) -> DataFrame:
    """Project a vector table onto the model's components —
    ``(id, projection ARRAY<DOUBLE>)``, scan-local, zero shuffle.

    ``native`` = codegen folds (oracle path); ``arrow`` = per-partition
    GEMM against the broadcast component matrix (throughput path for
    large d·k). Identical results up to the float addition order inside
    the GEMM — the arrow path sums in the same left-to-right dimension
    order via a plain matmul, which NumPy evaluates with pairwise
    summation, so agreement is to ~1e-12, not bit-exact; tests bridge
    the two at that tolerance.
    """
    if method == "native":
        return df.select(
            F.col(id_col).alias("id"),
            project_expr(vec_col, model).alias(out_col),
        )
    if method != "arrow":
        raise ValueError(f"unknown method {method!r}")
    spark = df.sparkSession
    mean = np.asarray(model.mean)
    comps = np.asarray(model.components)
    bc = spark.sparkContext.broadcast((mean, comps))

    def _proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean_, comps_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            P = (X - mean_) @ comps_.T
            yield pd.DataFrame({"id": pdf[id_col], out_col: list(P)})

    return df.select(id_col, vec_col).mapInPandas(
        _proj, f"id long, {out_col} array<double>"
    )
