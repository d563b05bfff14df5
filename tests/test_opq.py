"""OPQ invariants: orthogonality, exact distance preservation,
balanced eigenvalue allocation, no-worse-than-PQ quantization error on
anisotropic data, save/load, and search agreement with brute force.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.opq import (
    OPQModel,
    eigenvalue_allocation,
    opq_encode,
    opq_search,
    opq_train,
)
from vector_indexer_spark.operators.pq import (
    pq_encode,
    pq_reconstruct,
    pq_train,
)

SF = "/root/testdata/sf0.001"


def _aniso_df(spark, n=400, d=32, seed=7):
    """Correlated, anisotropic vectors — the case OPQ exists for:
    variance concentrated in a few directions that straddle the
    naive dimension slices."""
    rng = np.random.default_rng(seed)
    scales = np.exp(-np.arange(d) / 4.0)  # sharp spectrum
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = (rng.standard_normal((n, d)) * scales) @ q.T
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id long, values array<double>"),
        x,
    )


@pytest.fixture(scope="module")
def aniso(spark):
    df, x = _aniso_df(spark)
    return df.cache(), x


@pytest.fixture(scope="module")
def model(aniso):
    df, _ = aniso
    return opq_train(df, vec_col="values", m=4, ksub=16, seed=42)


def test_rotation_is_orthogonal(model):
    r = model.rotation
    assert np.allclose(r @ r.T, np.eye(r.shape[0]), atol=1e-8)


def test_rotation_preserves_distances(model, aniso):
    _, x = aniso
    a, b = x[:50], x[50:100]
    ra, rb = model.rotate(a), model.rotate(b)
    orig = np.sum((a - b) ** 2, axis=1)
    rot = np.sum((ra - rb) ** 2, axis=1)
    assert np.allclose(orig, rot, rtol=1e-10)


def test_eigenvalue_allocation_balanced():
    var = np.exp(-np.arange(16) / 2.0)
    order = eigenvalue_allocation(var, 4)
    # a permutation of all dims, 4 per bucket
    assert sorted(order.tolist()) == list(range(16))
    sums = [np.sum(np.log(var[order[i * 4:(i + 1) * 4]])) for i in range(4)]
    # balanced products: spread far below the naive contiguous split
    naive = [np.sum(np.log(var[i * 4:(i + 1) * 4])) for i in range(4)]
    assert max(sums) - min(sums) < (max(naive) - min(naive)) / 2


def test_eigenvalue_allocation_rejects_indivisible():
    with pytest.raises(ValueError):
        eigenvalue_allocation(np.ones(10), 4)


def test_opq_no_worse_than_pq(spark, aniso, model):
    df, x = aniso
    pq = pq_train(df, vec_col="values", m=4, ksub=16, seed=42)
    pq_codes = np.asarray(
        [
            r["codes"]
            for r in pq_encode(df, pq, id_col="id", vec_col="values")
            .orderBy("id")
            .collect()
        ]
    )
    pq_err = np.sum((pq_reconstruct(pq_codes, pq) - x) ** 2)

    opq_codes_rows = (
        opq_encode(df, model, id_col="id", vec_col="values")
        .orderBy("id")
        .collect()
    )
    opq_codes = np.asarray([r["codes"] for r in opq_codes_rows])
    # reconstruction error measured in rotated space == original space
    rx = model.rotate(x)
    opq_err = np.sum((pq_reconstruct(opq_codes, model.pq) - rx) ** 2)
    # allocation must help on this spectrum, not just tie
    assert opq_err < pq_err * 0.95


def test_opq_search_matches_exact_on_easy_fixture(spark, aniso, model):
    df, x = aniso
    codes = opq_encode(df, model, id_col="id", vec_col="values")
    q = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(5)],
        "query_id long, query array<double>",
    )
    got = opq_search(codes, q, model, k=5).collect()
    # self-match: each query IS a corpus point; its reconstruction is
    # the closest possible, so rank-1 must be itself on 16 codewords
    # per subspace over 400 well-spread points
    rank1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert sum(rank1[i] == i for i in range(5)) >= 4


def test_opq_save_load_roundtrip(spark, model, tmp_path):
    path = str(tmp_path / "opq_model")
    model.save(spark, path)
    loaded = OPQModel.load(spark, path)
    assert np.allclose(loaded.rotation, model.rotation)
    assert np.allclose(loaded.mean, model.mean)
    assert np.allclose(loaded.pq.codebooks, model.pq.codebooks)


def test_opq_load_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        OPQModel.load(spark, str(tmp_path / "nope"))


def test_opq_dimension_mismatch_raises(spark, model):
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0])], "id long, values array<double>"
    )
    with pytest.raises(Exception, match="dimension"):
        opq_encode(bad, model, id_col="id", vec_col="values").collect()


def test_ivfopq_build_search_roundtrip(spark, tmp_path):
    import numpy as np

    from vector_indexer_spark.operators.opq import (
        build_ivfopq_index,
        load_ivfopq_index,
        search_ivfopq,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 16)) * 5
    pts = np.concatenate(
        [c + rng.standard_normal((100, 16)) for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in pts[i]]) for i in range(len(pts))],
        "id long, values array<double>",
    )
    path = str(tmp_path / "ivfopq")
    idx = build_ivfopq_index(
        df, path, nlist=6, m=4, ksub=16, seed=7
    )
    q = spark.createDataFrame(
        [(int(i), [float(v) for v in pts[i]]) for i in range(10)],
        "query_id long, query array<double>",
    )
    got = search_ivfopq(spark, idx, q, k=5, n_probe=6)
    rank1 = {
        r["query_id"]: r["neighbor_id"]
        for r in got.collect()
        if r["rank"] == 1
    }
    # full-probe self-queries on well-separated clusters: the PQ
    # reconstruction of a point is its own nearest code
    assert sum(rank1[i] == i for i in range(10)) >= 8

    loaded = load_ivfopq_index(spark, path)
    got2 = search_ivfopq(spark, loaded, q, k=5, n_probe=6)
    # centroids persist as float32 (the index layout contract shared
    # with the flat IVF), so ADC distances differ in the last ulps
    # after a load — ranks and neighbors must match exactly
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in df.collect()
    )
    assert key(got2) == key(got)


def test_ivfopq_load_missing_raises(spark, tmp_path):
    from vector_indexer_spark.operators.opq import load_ivfopq_index

    with pytest.raises(FileNotFoundError):
        load_ivfopq_index(spark, str(tmp_path / "nope"))
