"""PCA: distributed one-pass training vs NumPy, projection paths."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.pca import (
    PCAModel,
    pca_project,
    pca_train,
)


def _frames(spark, n=400, d=16, seed=0):
    rng = np.random.default_rng(seed)
    # anisotropic data: a few dominant directions for PCA to find
    scales = np.linspace(3.0, 0.1, d)
    X = (rng.normal(size=(n, d)) * scales).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "id long, values array<float>",
    )
    return X.astype(np.float64), df


class TestTrain:
    def test_matches_numpy_covariance_eig(self, spark):
        X, df = _frames(spark)
        model = pca_train(df, k=4)
        mean = X.mean(axis=0)
        assert np.allclose(model.mean, mean, atol=1e-9)
        cov = (X - mean).T @ (X - mean) / X.shape[0]
        evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
        assert np.allclose(model.explained_variance, evals[:4], rtol=1e-8)
        # components: orthonormal, spanning the top eigenvectors
        C = np.asarray(model.components)
        assert np.allclose(C @ C.T, np.eye(4), atol=1e-9)
        for j, row in enumerate(C):
            # eigh eigenvector up to sign
            _, vecs = np.linalg.eigh(cov)
            ref = vecs[:, -1 - j]
            assert min(
                np.abs(row - ref).max(), np.abs(row + ref).max()
            ) < 1e-8

    def test_partition_count_invariance(self, spark):
        _, df = _frames(spark, n=200, d=8)
        a = pca_train(df.repartition(1), k=3)
        b = pca_train(df.repartition(7), k=3)
        assert np.allclose(a.components, b.components, atol=1e-9)
        assert np.allclose(a.mean, b.mean, atol=1e-12)

    def test_sign_canonical(self, spark):
        _, df = _frames(spark, n=100, d=6)
        model = pca_train(df, k=3)
        for row in np.asarray(model.components):
            assert row[int(np.argmax(np.abs(row)))] > 0

    def test_validation(self, spark):
        _, df = _frames(spark, n=10, d=4)
        with pytest.raises(ValueError):
            pca_train(df, k=0)
        with pytest.raises(ValueError):
            pca_train(df, k=5)
        empty = spark.createDataFrame([], "id long, values array<float>")
        with pytest.raises(ValueError):
            pca_train(empty, k=1)


class TestProject:
    def test_projection_matches_numpy(self, spark):
        X, df = _frames(spark, n=150, d=8)
        model = pca_train(df, k=3)
        P = (X - np.asarray(model.mean)) @ np.asarray(model.components).T
        got = {
            r.id: np.asarray(r.projection)
            for r in pca_project(df, model).collect()
        }
        for i in range(X.shape[0]):
            assert np.allclose(got[i], P[i], atol=1e-9)

    def test_arrow_matches_native(self, spark):
        _, df = _frames(spark, n=150, d=8)
        model = pca_train(df, k=3)
        a = {r.id: r.projection for r in pca_project(df, model).collect()}
        b = {
            r.id: r.projection
            for r in pca_project(df, model, method="arrow").collect()
        }
        for i in a:
            assert np.allclose(a[i], b[i], atol=1e-10)

    def test_variance_concentrates(self, spark):
        X, df = _frames(spark)
        model = pca_train(df, k=4)
        # top-4 of the linspace(3,0.1) scales carry most of the energy
        total = ((X - X.mean(axis=0)) ** 2).sum() / X.shape[0]
        explained = sum(model.explained_variance)
        assert explained / total > 0.5
        # descending variances
        ev = list(model.explained_variance)
        assert ev == sorted(ev, reverse=True)

    def test_unknown_method(self, spark):
        _, df = _frames(spark, n=10, d=4)
        model = pca_train(df, k=2)
        with pytest.raises(ValueError):
            pca_project(df, model, method="nope")


def test_pca_then_ivf_pipeline(spark, tmp_path):
    """The 'reduce then index' pipeline: PCA to 8 of 16 dims, build an
    IVF index on the projections, search projected queries — ANN in the
    reduced space must still recover most true full-space neighbors
    (the anisotropic data keeps its energy in the top components)."""
    from vector_indexer_spark.operators.index_build import build_index
    from vector_indexer_spark.operators.knn import knn_exact
    from vector_indexer_spark.operators.search import search_index

    X, df = _frames(spark, n=500, d=16)
    model = pca_train(df, k=8)
    proj = pca_project(df, model).select(
        "id", F.col("projection").cast("array<float>").alias("values")
    )
    idx = build_index(proj, str(tmp_path / "pca_idx"), nlist=8, seed=42)
    pq = pca_project(df.filter("id < 10"), model).select(
        F.col("id").alias("query_id"),
        F.col("projection").cast("array<float>").alias("query"),
    )
    got = search_index(spark, idx, pq, k=10, n_probe=8)
    exact = knn_exact(
        df,
        df.filter("id < 10").select(
            F.col("id").alias("query_id"), F.col("values").alias("query")
        ),
        k=10,
    )
    hits = got.select("query_id", "neighbor_id").intersect(
        exact.select("query_id", "neighbor_id")
    )
    recall = hits.count() / exact.count()
    assert recall >= 0.6, recall
