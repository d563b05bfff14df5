"""API parity contract (reference tests/api_tests.rs + bindings)."""

from __future__ import annotations

import numpy as np
import pytest

from vector_indexer_spark import api


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = np.random.default_rng(42)
    xb = rng.normal(size=(300, 16)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("api") / "idx")
    vi = api.build(xb, path, spark=spark, seed=42)
    return vi, xb, path


def test_build_and_padded_search(built):
    vi, xb, _ = built
    D, I = vi.search(xb[:7], k=5, n_probe=vi.nlist)
    assert D.shape == (7, 5) and I.shape == (7, 5)
    assert D.dtype == np.float32 and I.dtype == np.int64
    # top-1 = self (api_tests.rs:40-92)
    assert (I[:, 0] == np.arange(7)).all()
    assert (D[:, 0] <= 1e-6).all()
    # no padding when enough hits
    assert (I >= 0).all() and np.isfinite(D).all()


def test_padding_contract(built, spark, tmp_path_factory):
    # fewer than k hits → inf / -1 fill (bindings lib.rs:179-202)
    rng = np.random.default_rng(1)
    xb = rng.normal(size=(5, 8)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("api") / "small")
    vi = api.build(xb, path, spark=spark)
    D, I = vi.search(xb[:2], k=10, n_probe=100)
    assert D.shape == (2, 10)
    assert (I[:, 5:] == -1).all()
    assert np.isinf(D[:, 5:]).all()
    assert (I[:, :5] >= 0).all()


def test_search_sync_alias(built):
    vi, xb, _ = built
    D1, I1 = vi.search(xb[:3], k=4, n_probe=vi.nlist)
    D2, I2 = vi.search_sync(xb[:3], k=4, n_probe=vi.nlist)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)


def test_load_roundtrip(built, spark):
    vi, xb, path = built
    vi2 = api.load(path, spark=spark)
    D1, I1 = vi.search(xb[:4], k=3, n_probe=vi.nlist)
    D2, I2 = vi2.search(xb[:4], k=3, n_probe=vi2.nlist)
    np.testing.assert_array_equal(I1, I2)


def test_load_dimension_mismatch(built, spark):
    _, _, path = built
    with pytest.raises(ValueError):
        api.load(path, spark=spark, dimension=99)


def test_query_dim_mismatch(built):
    vi, _, _ = built
    with pytest.raises(ValueError):
        vi.search(np.zeros((2, 7), dtype=np.float32), k=3)


def test_empty_build_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        api.build(np.zeros((0, 8), dtype=np.float32), str(tmp_path / "x"), spark=spark)


def test_suggest_nlist_reexport():
    assert api.suggest_nlist(60_000) == 490


def test_api_add_extends_index_and_search_finds(spark, tmp_path):
    """Faiss-style api.add: ordinal ids continue from n_vectors, added
    rows are immediately searchable, and full-probe results stay exact."""
    import numpy as np

    from vector_indexer_spark.api import add, build

    rng = np.random.default_rng(7)
    xb = rng.standard_normal((200, 16)).astype(np.float32)
    xa = rng.standard_normal((50, 16)).astype(np.float32)
    idx = build(xb, str(tmp_path / "apiadd"), spark=spark, nlist=8)
    assert add(idx, xa) == 250
    # self-query on an added row at full probe → itself at rank 1
    D, I = idx.search_sync(xa[:3], k=1, n_probe=idx.nlist)
    assert list(I[:, 0]) == [200, 201, 202]
    assert np.allclose(D[:, 0], 0.0, atol=1e-5)
    with pytest.raises(ValueError, match="dimension"):
        add(idx, np.zeros((2, 8), dtype=np.float32))
    with pytest.raises(ValueError, match="one id per row"):
        add(idx, xa[:2], ids=np.array([900], dtype=np.int64))
