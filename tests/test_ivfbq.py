"""IVF-BQ: per-cluster residual-sign codes, scaled ADC/Hamming, refine."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.bq import WORD_BITS
from vector_indexer_spark.operators.ivfbq import (
    ivfbq_encode,
    ivfbq_search,
    ivfbq_search_refined,
    ivfbq_train_scales,
)
from vector_indexer_spark.operators.knn import knn_exact


def _clustered(spark, n_per=40, k_cents=4, d=40, seed=0, spread=25.0):
    """Clusters with FAR-apart centers — the regime where flat (global
    threshold) binary codes collapse and per-cluster signs don't."""
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(k_cents, d)) * spread
    X = np.concatenate(
        [cents[c] + rng.normal(size=(n_per, d)) for c in range(k_cents)]
    ).astype(np.float64)
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)
    assigned = spark.createDataFrame(
        [
            (int(i), int(cl[i]), [float(v) for v in X[i]])
            for i in range(len(X))
        ],
        "id long, cluster_id long, values array<double>",
    )
    cdf = spark.createDataFrame(
        [(int(c), [float(v) for v in cents[c]]) for c in range(k_cents)],
        "centroid_id long, cvec array<double>",
    )
    q = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(6)],
        "query_id long, query array<double>",
    )
    return X, cents, cl, assigned, cdf, q


def _np_codes(X, thr_rows):
    n, d = X.shape
    n_words = (d + WORD_BITS - 1) // WORD_BITS
    out = np.zeros((n, n_words), dtype=np.int64)
    for w in range(n_words):
        for j in range(WORD_BITS):
            dim = w * WORD_BITS + j
            bit = (
                (X[:, dim] > thr_rows[:, dim]).astype(np.int64)
                if dim < d
                else 0
            )
            out[:, w] = out[:, w] * 2 + bit
    return out


def _np_rho(X, cents, cl):
    """Replicate the integer-micros scale train exactly: per member
    ONE floored value — floor(micros · dist2) with the sequential
    fold-left dist2."""
    d = X.shape[1]
    esum, cnt = {}, {}
    for i in range(len(X)):
        c = cl[i]
        dist2 = 0.0
        for j in range(d):
            diff = X[i, j] - cents[c, j]
            dist2 = dist2 + diff * diff
        esum[c] = esum.get(c, 0) + int(math.floor(dist2 * 1_000_000.0))
        cnt[c] = cnt.get(c, 0) + 1
    return {
        c: math.sqrt(esum[c] / 1_000_000.0 / (cnt[c] * float(d)))
        for c in esum
    }


class TestEncode:
    def test_codes_match_numpy_reference(self, spark):
        X, cents, cl, assigned, cdf, _ = _clustered(spark)
        got = {
            r.id: list(r.codes) for r in ivfbq_encode(assigned, cdf).collect()
        }
        want = _np_codes(X, cents[cl])
        for i in range(len(X)):
            assert got[i] == list(want[i]), i

    def test_empty_raises(self, spark):
        empty = spark.createDataFrame(
            [], "id long, cluster_id long, values array<double>"
        )
        cdf = spark.createDataFrame(
            [(0, [0.0])], "centroid_id long, cvec array<double>"
        )
        with pytest.raises(ValueError):
            ivfbq_encode(empty, cdf)


class TestScales:
    def test_rho_matches_numpy_integer_micros(self, spark):
        X, cents, cl, assigned, cdf, _ = _clustered(spark, n_per=20)
        got = {
            r.cluster_id: r.rho
            for r in ivfbq_train_scales(assigned, cdf).collect()
        }
        want = _np_rho(X, cents, cl)
        assert set(got) == set(want)
        for c in got:
            assert got[c] == want[c], c


class TestSearch:
    def test_adc_native_matches_numpy_estimator(self, spark):
        X, cents, cl, assigned, cdf, q = _clustered(spark, n_per=15)
        codes = ivfbq_encode(assigned, cdf)
        scales = ivfbq_train_scales(assigned, cdf)
        got = ivfbq_search(
            codes, cdf, q, k=1000, n_probe=4, scales=scales
        ).collect()
        signs = np.where(X > cents[cl], 1.0, -1.0)
        rho = _np_rho(X, cents, cl)
        d = X.shape[1]
        for r in got:
            c_id = cl[r.neighbor_id]
            c = cents[c_id]
            # sequential fold-left replications of both folds
            cdist2 = 0.0
            for j in range(d):
                diff = c[j] - X[r.query_id, j]
                cdist2 = cdist2 + diff * diff
            raw = 0.0
            for j in range(d):
                raw = raw + (X[r.query_id, j] - c[j]) * signs[r.neighbor_id, j]
            want = cdist2 - 2.0 * rho[c_id] * raw + float(d) * rho[c_id] * rho[c_id]
            assert r.adist2 == want, (r.query_id, r.neighbor_id)

    def test_arrow_matches_native_ranking(self, spark):
        _, _, _, assigned, cdf, q = _clustered(spark, seed=3)
        codes = ivfbq_encode(assigned, cdf)
        scales = ivfbq_train_scales(assigned, cdf)
        nat = ivfbq_search(
            codes, cdf, q, k=10, n_probe=2, scales=scales
        ).collect()
        arr = ivfbq_search(
            codes, cdf, q, k=10, n_probe=2, scales=scales, method="arrow"
        ).collect()
        assert {(r.query_id, r.rank): r.neighbor_id for r in nat} == {
            (r.query_id, r.rank): r.neighbor_id for r in arr
        }
        nsc = {(r.query_id, r.rank): r.adist2 for r in nat}
        for r in arr:
            assert abs(nsc[(r.query_id, r.rank)] - r.adist2) < 1e-6

    def test_hamming_self_query_rank1_zero(self, spark):
        _, _, _, assigned, cdf, q = _clustered(spark)
        codes = ivfbq_encode(assigned, cdf)
        top1 = {
            r.query_id: (r.neighbor_id, r.hamming)
            for r in ivfbq_search(
                codes, cdf, q, k=1, n_probe=1, scoring="hamming"
            ).collect()
        }
        for qid, (nid, ham) in top1.items():
            assert nid == qid and ham == 0

    def test_adc_self_query_rank1(self, spark):
        _, _, _, assigned, cdf, q = _clustered(spark, seed=5)
        codes = ivfbq_encode(assigned, cdf)
        scales = ivfbq_train_scales(assigned, cdf)
        top1 = {
            r.query_id: r.neighbor_id
            for r in ivfbq_search(
                codes, cdf, q, k=1, n_probe=4, scales=scales
            ).collect()
        }
        # the estimator puts a query's own row first for a clear
        # majority of self-queries (1-bit resolution: not guaranteed
        # for every row)
        assert sum(1 for i, n in top1.items() if n == i) >= 4

    def test_probe_pruning_restricts_clusters(self, spark):
        _, _, cl, assigned, cdf, q = _clustered(spark)
        codes = ivfbq_encode(assigned, cdf)
        scales = ivfbq_train_scales(assigned, cdf)
        got = ivfbq_search(
            codes, cdf, q, k=10_000, n_probe=1, scales=scales
        ).collect()
        for r in got:
            assert cl[r.neighbor_id] == cl[r.query_id]

    def test_validation(self, spark):
        _, _, _, assigned, cdf, q = _clustered(spark, n_per=5)
        codes = ivfbq_encode(assigned, cdf)
        scales = ivfbq_train_scales(assigned, cdf)
        with pytest.raises(ValueError):
            ivfbq_search(codes, cdf, q, k=0, scales=scales)
        with pytest.raises(ValueError):
            ivfbq_search(codes, cdf, q, n_probe=0, scales=scales)
        with pytest.raises(ValueError):
            ivfbq_search(codes, cdf, q, scales=scales, scoring="nope")
        with pytest.raises(ValueError):
            ivfbq_search(codes, cdf, q, scoring="adc")  # no scales
        with pytest.raises(ValueError):
            ivfbq_search(
                codes, cdf, q, scoring="hamming", method="arrow"
            )


class TestQualityAndRefine:
    def test_per_cluster_beats_flat_bq_on_clustered_data(self, spark):
        from vector_indexer_spark.operators.bq import (
            bq_encode,
            bq_search,
            bq_train,
        )

        X, cents, cl, assigned, cdf, q = _clustered(
            spark, n_per=50, seed=9, spread=40.0
        )
        vec = assigned.select("id", "values")
        truth = {
            (r.query_id, r.neighbor_id)
            for r in knn_exact(vec, q, k=10).collect()
        }
        flat_model = bq_train(vec)
        flat = {
            (r.query_id, r.neighbor_id)
            for r in bq_search(
                bq_encode(vec, flat_model), flat_model, q, k=30
            ).collect()
        }
        codes = ivfbq_encode(assigned, cdf)
        scales = ivfbq_train_scales(assigned, cdf)
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in ivfbq_search(
                codes, cdf, q, k=30, n_probe=4, scales=scales
            ).collect()
        }
        # shortlist recall at depth 3k (the refine deployment shape):
        # global thresholds assign near-identical bits inside each
        # far-from-origin cluster; residual signs + the per-cluster
        # scale keep in-cluster resolution AND cross-cluster order
        assert len(ivf & truth) > len(flat & truth)
        assert len(ivf & truth) >= 45  # shortlist recall ≥ 0.75

    def test_full_depth_refine_equals_exact(self, spark):
        X, _, _, assigned, cdf, q = _clustered(spark, n_per=20)
        codes = ivfbq_encode(assigned, cdf)
        scales = ivfbq_train_scales(assigned, cdf)
        vec = assigned.select("id", "values")
        ref = ivfbq_search_refined(
            codes, cdf, vec, q, k=5, shortlist=len(X), n_probe=4,
            scales=scales,
        ).collect()
        exact = knn_exact(vec, q, k=5).collect()
        assert {(r.query_id, r.rank, r.neighbor_id) for r in ref} == {
            (r.query_id, r.rank, r.neighbor_id) for r in exact
        }


class TestPersistedIndex:
    def test_build_load_search_roundtrip(self, spark, tmp_path):
        import numpy as np

        from vector_indexer_spark.operators.ivfbq import (
            build_ivfbq_index,
            load_ivfbq_index,
            search_ivfbq_index,
        )

        rng = np.random.default_rng(4)
        cents = rng.normal(size=(5, 24)) * 20.0
        X = np.concatenate(
            [cents[c] + rng.normal(size=(60, 24)) for c in range(5)]
        )
        df = spark.createDataFrame(
            [(int(i), [float(v) for v in X[i]]) for i in range(len(X))],
            "id long, values array<double>",
        )
        q = spark.createDataFrame(
            [(int(i), [float(v) for v in X[i]]) for i in range(8)],
            "query_id long, query array<double>",
        )
        path = str(tmp_path / "ivfbq_idx")
        idx = build_ivfbq_index(df, path, nlist=8, seed=42)
        assert idx.n_vectors == len(X)
        assert idx.dimension == 24
        assert len(idx.rhos) == idx.nlist and all(r > 0 for r in idx.rhos)
        # layout: shard-partitioned codes + centroids + meta
        import os

        assert os.path.exists(os.path.join(path, "ivfbq_meta.json"))
        loaded = load_ivfbq_index(spark, path)
        assert loaded.nlist == idx.nlist
        assert np.allclose(loaded.centroids, idx.centroids)
        assert np.allclose(loaded.rhos, idx.rhos)
        # persisted pruned search == in-memory search over the full
        # codes table at the same n_probe (full probe: identical rows)
        full = search_ivfbq_index(
            spark, loaded, q, k=5, n_probe=idx.nlist
        ).collect()
        from vector_indexer_spark.operators.ivfbq import ivfbq_search

        mem = ivfbq_search(
            idx.codes(spark),
            idx.centroids_df(spark),
            q,
            k=5,
            n_probe=idx.nlist,
            scales=idx.scales_df(spark),
            method="arrow",
        ).collect()
        assert {(r.query_id, r.rank, r.neighbor_id) for r in full} == {
            (r.query_id, r.rank, r.neighbor_id) for r in mem
        }
        # refined self-retrieval: every query's own row lands rank 1
        # after refine over the persisted tier
        from vector_indexer_spark.operators.pq import refine_topk

        short = search_ivfbq_index(spark, loaded, q, k=30, n_probe=4)
        ref = refine_topk(
            short.select("query_id", "neighbor_id"), df, q, k=1
        ).collect()
        assert all(r.neighbor_id == r.query_id for r in ref)
        # hamming scoring works with the DEFAULT method (defaults
        # resolve by scoring — the arrow kernel is adc-only, so the
        # persisted hamming search must route to the codegen path
        # instead of raising)
        ham = search_ivfbq_index(
            spark, loaded, q, k=1, n_probe=idx.nlist, scoring="hamming"
        ).collect()
        assert all(
            r.neighbor_id == r.query_id and r.hamming == 0 for r in ham
        )

    def test_load_errors(self, spark, tmp_path):
        from vector_indexer_spark.operators.ivfbq import load_ivfbq_index

        with pytest.raises(FileNotFoundError):
            load_ivfbq_index(spark, str(tmp_path / "nope"))
        import json
        import os

        bad = str(tmp_path / "bad")
        os.makedirs(bad)
        with open(os.path.join(bad, "ivfbq_meta.json"), "w") as fh:
            json.dump({"version": 99}, fh)
        with pytest.raises(ValueError):
            load_ivfbq_index(spark, bad)
