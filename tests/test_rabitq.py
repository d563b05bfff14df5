"""RaBitQ rotated binary quantization: rotation properties, encode
factors vs NumPy, estimator quality vs plain sign-bit ADC, native≡arrow,
refine-equals-exact, and error contracts."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.bq import BQModel, bq_adc_search, bq_encode
from vector_indexer_spark.operators.knn import knn_exact
from vector_indexer_spark.operators.rabitq import (
    RaBitQModel,
    hadamard_rotation,
    rabitq_encode,
    rabitq_search,
    rabitq_search_refined,
    rabitq_train,
    random_rotation,
)


def _model(d=64, seed=7, cent=None):
    mat = hadamard_rotation(d, seed)
    if cent is None:
        cent = (0.0,) * d
    return RaBitQModel(
        centroid=tuple(cent),
        rotation=tuple(tuple(float(v) for v in r) for r in mat),
        seed=seed,
    )


def _vec_frames(embeddings):
    vec = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    q = embeddings.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    return vec, q


# --- rotation constructions -------------------------------------------------


@pytest.mark.parametrize("builder", [hadamard_rotation, random_rotation])
def test_rotation_orthogonal_and_deterministic(builder):
    p1 = builder(64, seed=3)
    p2 = builder(64, seed=3)
    p3 = builder(64, seed=4)
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
    np.testing.assert_allclose(p1 @ p1.T, np.eye(64), atol=1e-12)


def test_hadamard_entries_exact():
    p = hadamard_rotation(64, seed=0)
    assert set(np.unique(np.abs(p))) == {1.0 / 8.0}


def test_hadamard_requires_power_of_two():
    with pytest.raises(ValueError, match="power of 2"):
        hadamard_rotation(48)


# --- encode -----------------------------------------------------------------


def test_encode_matches_numpy(spark, embeddings, emb_np):
    ids, mat = emb_np
    model = _model(cent=tuple(float(j % 3) * 0.1 for j in range(64)))
    vec, _ = _vec_frames(embeddings)
    enc = {
        r.id: r
        for r in rabitq_encode(vec, model, method="native").collect()
    }
    p = model.rotation_matrix()
    c = np.asarray(model.centroid)
    r = (mat.astype(np.float64) - c[None, :]) @ p.T
    norm = np.sqrt((r * r).sum(axis=1))
    dot_o = np.abs(r).sum(axis=1) / (math.sqrt(64) * norm)
    for i, vid in enumerate(ids):
        row = enc[int(vid)]
        assert row.norm == pytest.approx(norm[i], rel=1e-9)
        assert row.dot_o == pytest.approx(dot_o[i], rel=1e-9)
        # codes decode back to the sign pattern of the rotated residual
        bits = []
        for w in row.codes:
            bits.extend((w >> (31 - j)) & 1 for j in range(32))
        np.testing.assert_array_equal(
            np.array(bits[:64]), (r[i] > 0).astype(int)
        )


def test_encode_native_equals_arrow(spark, embeddings):
    model = _model()
    vec, _ = _vec_frames(embeddings)
    nat = {
        r.id: r for r in rabitq_encode(vec, model, method="native").collect()
    }
    arr = {
        r.id: r for r in rabitq_encode(vec, model, method="arrow").collect()
    }
    assert nat.keys() == arr.keys()
    for vid, n in nat.items():
        a = arr[vid]
        assert list(n.codes) == list(a.codes)
        assert n.norm == pytest.approx(a.norm, rel=1e-9)
        assert n.dot_o == pytest.approx(a.dot_o, rel=1e-9)


def test_encode_dim_mismatch_raises_arrow(spark, embeddings):
    model = _model(d=32, seed=1)
    model = RaBitQModel(
        centroid=(0.0,) * 32,
        rotation=tuple(
            tuple(float(v) for v in r) for r in hadamard_rotation(32, 1)
        ),
    )
    vec, _ = _vec_frames(embeddings)
    with pytest.raises(Exception, match="dimension"):
        rabitq_encode(vec, model, method="arrow").collect()


def test_train_centroid_is_mean_and_validates(spark, embeddings):
    vec, _ = _vec_frames(embeddings)
    model = rabitq_train(vec, seed=5)
    means = (
        vec.agg(
            *[
                F.avg(F.element_at("values", j + 1)).alias(f"m{j}")
                for j in range(64)
            ]
        ).first()
    )
    for j in range(64):
        assert model.centroid[j] == pytest.approx(means[f"m{j}"], rel=1e-12)
    ragged = vec.limit(4).union(
        vec.limit(1).select("id", F.slice("values", 1, 10).alias("values"))
    )
    with pytest.raises(ValueError, match="dimension"):
        rabitq_train(ragged)


# --- search -----------------------------------------------------------------


def test_search_native_equals_arrow(spark, embeddings):
    model = _model()
    vec, q = _vec_frames(embeddings)
    codes = rabitq_encode(vec, model).cache()
    nat = rabitq_search(codes, model, q, k=10, method="native").collect()
    arr = rabitq_search(codes, model, q, k=10, method="arrow").collect()
    nkey = {(r.query_id, r.rank): (r.neighbor_id, r.est_dist2) for r in nat}
    akey = {(r.query_id, r.rank): (r.neighbor_id, r.est_dist2) for r in arr}
    assert nkey.keys() == akey.keys()
    for kk, (nid, nd) in nkey.items():
        aid, ad = akey[kk]
        assert nid == aid
        assert nd == pytest.approx(ad, rel=1e-9, abs=1e-9)


def test_estimator_beats_plain_sign_adc(spark):
    """The round-trip claim: at identical storage bits the centered,
    rotated, factor-corrected estimator recalls more of the true top-10
    than the uncentered sign-bit ADC ranking. Anisotropic off-center
    data (seeded, deterministic): a shifted mean makes raw sign bits
    nearly constant in the offset dimensions, and varying residual
    norms are invisible to ADC but carried by RaBitQ's factors."""
    rng = np.random.default_rng(23)
    d, n = 64, 400
    scales = np.linspace(0.2, 3.0, d)
    mean = np.full(d, 2.0)
    mat = rng.standard_normal((n, d)) * scales[None, :] + mean[None, :]
    mat *= rng.uniform(0.5, 2.0, size=(n, 1))  # varying residual norms
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(n)]
    vec = spark.createDataFrame(rows, "id long, values array<float>")
    q = vec.filter(F.col("id") < 8).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    model = rabitq_train(vec, seed=7)
    codes = rabitq_encode(vec, model).cache()
    ra = rabitq_search(codes, model, q, k=10, method="native").collect()

    bqm = BQModel(thresholds=(0.0,) * 64)
    bcodes = bq_encode(vec, bqm)
    adc = bq_adc_search(bcodes, bqm, q, k=10, method="native").collect()

    truth = knn_exact(vec, q, k=10, method="native").collect()
    t = {}
    for r in truth:
        t.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(rows):
        hit = tot = 0
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        for qid, want in t.items():
            hit += len(want & got.get(qid, set()))
            tot += len(want)
        return hit / tot

    r_ra, r_adc = recall(ra), recall(adc)
    assert r_ra > r_adc, (r_ra, r_adc)
    assert r_ra >= 0.5  # sane absolute floor at d=64, 1 bit/dim


def test_estimator_unbiased_on_gaussian(spark):
    """<ō,u>/<ō,o> is an unbiased estimator of <o,u> (RaBitQ thm 3.2):
    the mean signed error over many seeded pairs is ~0, and the RMS
    error is O(1/√d)."""
    rng = np.random.default_rng(11)
    d = 64
    p = hadamard_rotation(d, seed=2)
    x = rng.standard_normal((400, d))
    qv = rng.standard_normal(d)
    r = x @ p.T
    rq = p @ qv
    u = rq / np.linalg.norm(rq)
    o = r / np.linalg.norm(r, axis=1, keepdims=True)
    true_ip = o @ u
    sign = np.where(r > 0, 1.0, -1.0) / math.sqrt(d)
    dot_o = np.einsum("ij,ij->i", sign, o)
    est = (sign @ u) / dot_o
    err = est - true_ip
    assert abs(err.mean()) < 0.01
    assert np.sqrt((err**2).mean()) < 2.5 / math.sqrt(d)


def test_refined_full_shortlist_equals_exact(spark, embeddings):
    vec, q = _vec_frames(embeddings)
    model = _model()
    codes = rabitq_encode(vec, model)
    n = vec.count()
    ref = rabitq_search_refined(
        codes, model, vec, q, k=5, shortlist=n
    ).collect()
    exact = knn_exact(vec, q, k=5, method="native").collect()
    rkey = {(r.query_id, r.rank): r.neighbor_id for r in ref}
    ekey = {(r.query_id, r.rank): r.neighbor_id for r in exact}
    assert rkey == ekey


def test_search_contracts(spark, embeddings):
    vec, q = _vec_frames(embeddings)
    model = _model()
    codes = rabitq_encode(vec, model)
    with pytest.raises(ValueError, match="positive"):
        rabitq_search(codes, model, q, k=0)
    # k > n returns n rows per query (reference k>n contract)
    n = vec.count()
    out = rabitq_search(codes, model, q.limit(2), k=n + 50)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == n for r in counts)


# --- IVF-RaBitQ ---------------------------------------------------------


def _clustered(spark, n_per=40, k_cents=4, d=32, seed=0, spread=25.0):
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


def _rot(d=32, seed=3):
    return tuple(
        tuple(float(v) for v in r) for r in hadamard_rotation(d, seed)
    )


def test_ivf_encode_matches_numpy(spark):
    from vector_indexer_spark.operators.rabitq import ivf_rabitq_encode

    X, cents, cl, assigned, cdf, _ = _clustered(spark)
    rot = _rot()
    p = np.asarray(rot)
    enc = {
        r.id: r for r in ivf_rabitq_encode(assigned, cdf, rot).collect()
    }
    r_np = np.einsum("ij,nj->ni", p, X - cents[cl])
    norm = np.sqrt((r_np * r_np).sum(axis=1))
    dot_o = np.abs(r_np).sum(axis=1) / (math.sqrt(32) * norm)
    for i in range(len(X)):
        row = enc[i]
        assert row.cluster_id == cl[i]
        assert row.norm == pytest.approx(norm[i], rel=1e-9)
        assert row.dot_o == pytest.approx(dot_o[i], rel=1e-9)
        bits = [(row.codes[0] >> (31 - j)) & 1 for j in range(32)]
        np.testing.assert_array_equal(
            np.array(bits), (r_np[i] > 0).astype(int)
        )


def test_ivf_encode_native_equals_arrow(spark):
    from vector_indexer_spark.operators.rabitq import ivf_rabitq_encode

    _, _, _, assigned, cdf, _ = _clustered(spark)
    rot = _rot()
    nat = {
        r.id: r
        for r in ivf_rabitq_encode(
            assigned, cdf, rot, method="native"
        ).collect()
    }
    arr = {
        r.id: r
        for r in ivf_rabitq_encode(
            assigned, cdf, rot, method="arrow"
        ).collect()
    }
    assert nat.keys() == arr.keys()
    for vid, n in nat.items():
        a = arr[vid]
        assert n.cluster_id == a.cluster_id
        assert list(n.codes) == list(a.codes)
        assert n.norm == pytest.approx(a.norm, rel=1e-9)
        assert n.dot_o == pytest.approx(a.dot_o, rel=1e-9)


def test_ivf_search_native_equals_arrow(spark):
    from vector_indexer_spark.operators.rabitq import (
        ivf_rabitq_encode,
        ivf_rabitq_search,
    )

    _, _, _, assigned, cdf, q = _clustered(spark)
    rot = _rot()
    codes = ivf_rabitq_encode(assigned, cdf, rot).cache()
    nat = ivf_rabitq_search(
        codes, cdf, q, rot, k=8, n_probe=2, method="native"
    ).collect()
    arr = ivf_rabitq_search(
        codes, cdf, q, rot, k=8, n_probe=2, method="arrow"
    ).collect()
    nkey = {(r.query_id, r.rank): (r.neighbor_id, r.est_dist2) for r in nat}
    akey = {(r.query_id, r.rank): (r.neighbor_id, r.est_dist2) for r in arr}
    assert nkey.keys() == akey.keys()
    for kk, (nid, nd) in nkey.items():
        aid, ad = akey[kk]
        assert nid == aid
        assert nd == pytest.approx(ad, rel=1e-9, abs=1e-9)


def test_ivf_full_probe_refined_equals_exact(spark):
    from vector_indexer_spark.operators.rabitq import (
        ivf_rabitq_encode,
        ivf_rabitq_search_refined,
    )

    X, _, _, assigned, cdf, q = _clustered(spark)
    rot = _rot()
    codes = ivf_rabitq_encode(assigned, cdf, rot)
    ref = ivf_rabitq_search_refined(
        codes, cdf, assigned, q, rot, k=5, shortlist=len(X), n_probe=4
    ).collect()
    exact = knn_exact(assigned, q, k=5, method="native").collect()
    rkey = {(r.query_id, r.rank): r.neighbor_id for r in ref}
    ekey = {(r.query_id, r.rank): r.neighbor_id for r in exact}
    assert rkey == ekey


def test_ivf_search_prunes_to_probed_clusters(spark):
    from vector_indexer_spark.operators.rabitq import (
        ivf_rabitq_encode,
        ivf_rabitq_search,
    )

    X, cents, cl, assigned, cdf, q = _clustered(spark)
    rot = _rot()
    codes = ivf_rabitq_encode(assigned, cdf, rot)
    out = ivf_rabitq_search(
        codes, cdf, q, rot, k=len(X), n_probe=1, method="native"
    ).collect()
    # every query sits inside its own cluster (spread >> noise): with
    # n_probe=1 all candidates come from that single probed cluster
    for r in out:
        assert cl[r.neighbor_id] == cl[r.query_id]
    # and the candidate count is exactly the probed cluster's size
    sizes = {c: int((cl == c).sum()) for c in range(4)}
    per_q = {}
    for r in out:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    for qid, n in per_q.items():
        assert n == sizes[cl[qid]]


def test_ivf_raw_recall_floor(spark):
    from vector_indexer_spark.operators.rabitq import (
        ivf_rabitq_encode,
        ivf_rabitq_search,
    )

    X, _, _, assigned, cdf, q = _clustered(spark)
    rot = _rot()
    codes = ivf_rabitq_encode(assigned, cdf, rot)
    got = ivf_rabitq_search(
        codes, cdf, q, rot, k=10, n_probe=4, method="native"
    ).collect()
    truth = knn_exact(assigned, q, k=10, method="native").collect()
    t, g = {}, {}
    for r in truth:
        t.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in got:
        g.setdefault(r.query_id, set()).add(r.neighbor_id)
    hit = sum(len(t[qid] & g.get(qid, set())) for qid in t)
    assert hit / (10 * len(t)) >= 0.5  # 1-bit raw shortlist floor


def test_ivf_search_contracts(spark):
    from vector_indexer_spark.operators.rabitq import (
        ivf_rabitq_encode,
        ivf_rabitq_search,
    )

    _, _, _, assigned, cdf, q = _clustered(spark)
    rot = _rot()
    codes = ivf_rabitq_encode(assigned, cdf, rot)
    with pytest.raises(ValueError, match="positive"):
        ivf_rabitq_search(codes, cdf, q, rot, k=0)
    with pytest.raises(ValueError, match="positive"):
        ivf_rabitq_search(codes, cdf, q, rot, k=5, n_probe=0)
    with pytest.raises(ValueError, match="unknown method"):
        ivf_rabitq_search(codes, cdf, q, rot, k=5, method="zig")


def test_ivf_search_plan_no_codes_shuffle(spark):
    """Scale shape: every join in the pruned search broadcasts the
    small side — the codes table never sort-merge-shuffles."""
    from vector_indexer_spark.operators.rabitq import (
        ivf_rabitq_encode,
        ivf_rabitq_search,
    )

    _, _, _, assigned, cdf, q = _clustered(spark)
    rot = _rot()
    codes = ivf_rabitq_encode(assigned, cdf, rot)
    plan = (
        ivf_rabitq_search(codes, cdf, q, rot, k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --- persisted IVF-RaBitQ index ------------------------------------------


def test_index_build_load_search_roundtrip(spark, tmp_path):
    from vector_indexer_spark.operators.rabitq import (
        build_ivf_rabitq_index,
        load_ivf_rabitq_index,
        search_ivf_rabitq_index,
    )

    X, _, _, assigned, _, q = _clustered(spark)
    vec = assigned.select("id", "values")
    path = str(tmp_path / "irbq")
    idx = build_ivf_rabitq_index(vec, path, nlist=4, seed=5)
    assert idx.dimension == 32
    assert idx.rotation_kind == "hadamard"
    loaded = load_ivf_rabitq_index(spark, path)
    assert loaded.nlist == idx.nlist
    assert loaded.rotation == idx.rotation
    np.testing.assert_allclose(loaded.centroids, idx.centroids)

    got = search_ivf_rabitq_index(
        spark, loaded, q, k=5, n_probe=4, method="native"
    ).collect()
    # full probe + the estimator = the composable path over the same
    # codes/centroids — and refine-free top-5 has >=1 self-hit per query
    assert {r.query_id for r in got} == {0, 1, 2, 3, 4, 5}
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    arr = search_ivf_rabitq_index(
        spark, loaded, q, k=5, n_probe=4, method="arrow"
    ).collect()
    akey = {(r.query_id, r.rank): r.neighbor_id for r in arr}
    nkey = {(r.query_id, r.rank): r.neighbor_id for r in got}
    assert akey == nkey


def test_index_load_errors(spark, tmp_path):
    import json

    from vector_indexer_spark.operators.rabitq import (
        load_ivf_rabitq_index,
    )

    with pytest.raises(FileNotFoundError, match="no IVF-RaBitQ index"):
        load_ivf_rabitq_index(spark, str(tmp_path / "nope"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "ivf_rabitq_meta.json").write_text(json.dumps({"version": 99}))
    with pytest.raises(ValueError, match="unsupported"):
        load_ivf_rabitq_index(spark, str(bad))


def test_index_search_prunes_scan(spark, tmp_path):
    from vector_indexer_spark.operators.rabitq import (
        build_ivf_rabitq_index,
        search_ivf_rabitq_index,
    )

    _, _, _, assigned, _, q = _clustered(spark)
    vec = assigned.select("id", "values")
    path = str(tmp_path / "irbq2")
    idx = build_ivf_rabitq_index(vec, path, nlist=4, seed=5)
    plan = (
        search_ivf_rabitq_index(
            spark, idx, q.limit(2), k=5, n_probe=1, method="native"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "shard_id" in plan  # partition predicate reached the scan
    assert "SortMergeJoin" not in plan


def test_search_plan_codes_only_and_broadcast(spark, embeddings):
    """Scale shape: the search plan scans the codes frame only (never
    the raw vector table) and the query side is broadcast."""
    vec, q = _vec_frames(embeddings)
    model = _model()
    codes = rabitq_encode(vec, model)
    plan = rabitq_search(
        codes, model, q, k=5, method="native"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
