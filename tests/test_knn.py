"""Exact kNN invariants (reference tests/ivf_index_tests.rs + test_utils).

NumPy brute force is the in-test oracle; both Spark execution paths
(native expression and Arrow kernel) must agree with it.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.functions.kernels import pairwise_dist2, topk_per_row
from vector_indexer_spark.operators.knn import knn_exact


def _queries_df(spark, embeddings, n=5):
    return (
        embeddings.filter(F.col("vec_id") < n)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
        )
    )


@pytest.mark.parametrize("method", ["native", "arrow"])
def test_knn_matches_numpy_oracle(spark, embeddings, emb_np, method):
    ids, mat = emb_np
    q = _queries_df(spark, embeddings)
    out = knn_exact(
        embeddings, q, k=10, id_col="vec_id", vec_col="embedding", method=method
    ).toPandas()

    m64 = mat.astype(np.float64)
    # exact (non-GEMM) oracle: broadcast differences
    d2 = ((m64[:5, None, :] - m64[None, :, :]) ** 2).sum(axis=-1)
    exp_d, exp_i = topk_per_row(d2, 10, ids=ids)
    for qi in range(5):
        got = out[out.query_id == qi].sort_values("rank")
        assert list(got.neighbor_id) == list(exp_i[qi])
        np.testing.assert_allclose(
            got.dist2.to_numpy(), exp_d[qi], rtol=1e-9, atol=1e-9
        )


@pytest.mark.parametrize("method", ["native", "arrow"])
def test_knn_self_is_top1(spark, embeddings, method):
    # exact-match query returns itself at rank 1 with dist 0
    # (reference tests/ivf_index_tests.rs:122-159)
    q = _queries_df(spark, embeddings, n=3)
    out = knn_exact(
        embeddings, q, k=1, id_col="vec_id", vec_col="embedding", method=method
    ).toPandas()
    assert len(out) == 3
    for _, r in out.iterrows():
        assert r.neighbor_id == r.query_id
        # arrow path computes dist2 via GEMM; self-distance is 0 up to
        # float64 round-off (native path yields exactly 0.0)
        assert r.dist2 <= 1e-9


def test_knn_k_greater_than_n(spark, embeddings):
    # k > n returns exactly n rows (tests/ivf_index_tests.rs:278-306)
    n = embeddings.count()
    q = _queries_df(spark, embeddings, n=2)
    out = knn_exact(
        embeddings, q, k=n + 100, id_col="vec_id", vec_col="embedding"
    )
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == n for r in counts)


def test_knn_sorted_and_exactly_k(spark, embeddings):
    # results ascending per query, exactly k rows
    # (tests/ivf_index_tests.rs:163-224)
    q = _queries_df(spark, embeddings, n=4)
    out = knn_exact(
        embeddings, q, k=7, id_col="vec_id", vec_col="embedding"
    ).toPandas()
    for qid, grp in out.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert len(grp) == 7
        assert (np.diff(grp.dist2.to_numpy()) >= 0).all()
        assert (grp.dist2.to_numpy() >= 0).all()


def test_knn_k_zero_raises(spark, embeddings):
    q = _queries_df(spark, embeddings, n=1)
    with pytest.raises(ValueError):
        knn_exact(embeddings, q, k=0, id_col="vec_id", vec_col="embedding")


def test_knn_include_vectors(spark, embeddings):
    q = _queries_df(spark, embeddings, n=2)
    out = knn_exact(
        embeddings,
        q,
        k=3,
        id_col="vec_id",
        vec_col="embedding",
        include_vectors=True,
    ).toPandas()
    assert "values" in out.columns
    assert all(len(v) == 64 for v in out["values"])


def test_native_and_arrow_agree(spark, embeddings):
    q = _queries_df(spark, embeddings, n=5)
    a = knn_exact(
        embeddings, q, k=10, id_col="vec_id", vec_col="embedding", method="native"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = knn_exact(
        embeddings, q, k=10, id_col="vec_id", vec_col="embedding", method="arrow"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(a.neighbor_id) == list(b.neighbor_id)
    np.testing.assert_allclose(a.dist2, b.dist2, rtol=1e-9, atol=1e-9)


def test_chunked_topk_matches_unchunked(monkeypatch):
    # chunked path (forced via a tiny cell budget) must equal one-shot
    import vector_indexer_spark.functions.kernels as K

    rng = np.random.default_rng(4)
    qmat = rng.normal(size=(7, 16))
    vmat = rng.normal(size=(533, 16))
    vids = rng.permutation(533).astype(np.int64)
    d_full, i_full = K.chunked_topk(qmat, vmat, vids, 9)
    monkeypatch.setattr(K, "MAX_SCORE_CELLS", 100)  # ~14-row chunks
    d_chunk, i_chunk = K.chunked_topk(qmat, vmat, vids, 9)
    np.testing.assert_array_equal(i_full, i_chunk)
    np.testing.assert_allclose(d_full, d_chunk)


class TestHierarchicalProbeRanking:
    """topk_per_row_hierarchical — the large-nlist probe-ranking path."""

    def _fixture(self, n_clusters=64, d=8, seed=11):
        from vector_indexer_spark.operators.kmeans import (
            build_centroid_hierarchy,
        )

        rng = np.random.default_rng(seed)
        cents = rng.normal(size=(n_clusters, d)) * 10.0
        meta, labels = build_centroid_hierarchy(cents, seed=3)
        nq = min(16, n_clusters)
        q = cents[:nq] + rng.normal(size=(nq, d), scale=0.01)
        return q, cents, meta, labels

    def test_exact_when_all_metas_shortlisted(self):
        from vector_indexer_spark.functions.kernels import (
            topk_per_row_hierarchical,
        )

        q, cents, meta, labels = self._fixture()
        flat_d, flat_i = topk_per_row(pairwise_dist2(q, cents), 5)
        hd, hi = topk_per_row_hierarchical(
            q, cents, meta, labels, 5, top_meta=meta.shape[0]
        )
        np.testing.assert_array_equal(hi, flat_i)
        np.testing.assert_allclose(hd, flat_d)

    def test_recall_parity_on_clustered_queries(self):
        # queries sit on top of centroids: the true nearest probes are
        # all inside the nearest meta clusters, so the pruned ranking
        # must recover the flat top-n_probe exactly
        from vector_indexer_spark.functions.kernels import (
            topk_per_row_hierarchical,
        )

        q, cents, meta, labels = self._fixture()
        flat_d, flat_i = topk_per_row(pairwise_dist2(q, cents), 3)
        hd, hi = topk_per_row_hierarchical(q, cents, meta, labels, 3)
        # rank-1 probe (the query's own centroid) always agrees
        np.testing.assert_array_equal(hi[:, 0], flat_i[:, 0])
        # overall probe recall >= 0.9 on this well-separated fixture
        recall = np.mean([
            len(set(hi[r]) & set(flat_i[r])) / 3 for r in range(len(q))
        ])
        assert recall >= 0.9

    def test_insufficient_members_falls_back_exact(self):
        from vector_indexer_spark.functions.kernels import (
            topk_per_row_hierarchical,
        )

        q, cents, meta, labels = self._fixture(n_clusters=8)
        # ask for more probes than any shortlist can hold -> exact path
        flat_d, flat_i = topk_per_row(pairwise_dist2(q, cents), 8)
        hd, hi = topk_per_row_hierarchical(
            q, cents, meta, labels, 8, top_meta=1
        )
        np.testing.assert_array_equal(hi, flat_i)
        np.testing.assert_allclose(hd, flat_d)

    def test_k_clamped_to_nlist(self):
        from vector_indexer_spark.functions.kernels import (
            topk_per_row_hierarchical,
        )

        q, cents, meta, labels = self._fixture(n_clusters=8)
        hd, hi = topk_per_row_hierarchical(q, cents, meta, labels, 50)
        assert hi.shape == (len(q), 8)
        flat_d, flat_i = topk_per_row(pairwise_dist2(q, cents), 8)
        np.testing.assert_array_equal(hi, flat_i)


def test_rowwise_dist2_foldexact_matches_sequential_fold():
    import numpy as np

    from vector_indexer_spark.functions.kernels import (
        rowwise_dist2_foldexact,
    )

    rng = np.random.default_rng(4)
    # float32 inputs with wildly mixed magnitudes so summation ORDER
    # matters: any reassociation (GEMM blocking, numpy pairwise sum)
    # would flip low bits somewhere in 500 rows
    a = (rng.normal(0, 1, (500, 33)) * 10.0 ** rng.integers(
        -6, 6, (500, 33))).astype(np.float32)
    b = (rng.normal(0, 1, (500, 33)) * 10.0 ** rng.integers(
        -6, 6, (500, 33))).astype(np.float32)
    got = rowwise_dist2_foldexact(a, b)
    for i in range(500):
        acc = 0.0
        for j in range(33):
            d = float(a[i, j]) - float(b[i, j])
            acc += d * d
        assert got[i] == acc  # bit-identical, not approx


def test_pairwise_dist2_inplace_matches_naive_expression():
    """The allocation-lean form (one buffer + in-place updates) must be
    BIT-identical to the naive `p2 - 2*(p@cT) + c2` it replaced —
    -(2g) == -2g exactly and IEEE addition commutes, so any drift here
    is a real bug, not tolerance."""
    import numpy as np

    rng = np.random.default_rng(123)
    for n, k, d in ((37, 11, 3), (256, 100, 64), (1000, 7, 128)):
        p = rng.normal(size=(n, d)) * rng.uniform(0.1, 50)
        c = rng.normal(size=(k, d)) * rng.uniform(0.1, 50)
        got = pairwise_dist2(p, c)
        p2 = np.einsum("ij,ij->i", p, p)[:, None]
        c2 = np.einsum("ij,ij->i", c, c)[None, :]
        want = p2 - 2.0 * (p @ c.T) + c2
        np.maximum(want, 0.0, out=want)
        assert np.array_equal(got, want)
