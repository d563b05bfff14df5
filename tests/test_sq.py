"""Scalar-quantization (SQ8) tests: training statistics, encode range /
reconstruction-error contract, search quality vs exact kNN, and model
persistence."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.knn import knn_exact
from vector_indexer_spark.operators.search import calculate_recall
from vector_indexer_spark.operators.sq import (
    SQModel,
    sq_encode,
    sq_search,
    sq_train,
)


@pytest.fixture(scope="module")
def vec_df(spark, embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    ).cache()


@pytest.fixture(scope="module")
def model(vec_df):
    return sq_train(vec_df)


def test_train_matches_numpy_minmax(vec_df, model):
    mat = np.array(
        [r["values"] for r in vec_df.select("values").collect()],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(
        np.asarray(model.dmin), mat.min(axis=0).astype(np.float64)
    )
    np.testing.assert_array_equal(
        np.asarray(model.dmax), mat.max(axis=0).astype(np.float64)
    )
    assert model.dimension == mat.shape[1]


def test_train_empty_raises(spark):
    empty = spark.createDataFrame([], "id long, values array<float>")
    with pytest.raises(ValueError, match="empty"):
        sq_train(empty)


def test_encode_range_and_determinism(vec_df, model):
    codes = sq_encode(vec_df, model)
    stats = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("dlo"),
        F.max(F.size("codes")).alias("dhi"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] <= 255
    assert stats["dlo"] == stats["dhi"] == model.dimension
    # extremes of each dimension land on the end codes
    assert stats["lo"] == 0 and stats["hi"] == 255
    a = codes.orderBy("id").collect()
    b = sq_encode(vec_df, model).orderBy("id").collect()
    assert a == b


def test_constant_dimension_encodes_zero(spark):
    df = spark.createDataFrame(
        [(0, [1.5, 2.0]), (1, [1.5, 3.0])], "id long, values array<float>"
    )
    m = sq_train(df)
    rows = {r["id"]: r["codes"] for r in sq_encode(df, m).collect()}
    assert rows[0][0] == 0 and rows[1][0] == 0  # constant dim -> code 0
    assert rows[0][1] == 0 and rows[1][1] == 255


def test_reconstruction_error_bounded(vec_df, model):
    """|x_j − recon_j| ≤ scale_j/2 (+1 ULP slack) for every element."""
    from vector_indexer_spark.operators.sq import reconstruct_expr

    codes = sq_encode(vec_df, model)
    joined = codes.join(vec_df, "id").select(
        "id",
        F.zip_with(
            reconstruct_expr("codes", model),
            F.col("values"),
            lambda r, x: F.abs(r - x.cast("double")),
        ).alias("err"),
    )
    max_err = joined.select(
        F.max(F.array_max("err")).alias("e")
    ).first()["e"]
    max_half_scale = max(s / 2 for s in model.scale)
    assert max_err <= max_half_scale * (1 + 1e-9)


def test_search_recall_vs_exact(spark, vec_df, model):
    """Decode-and-score search finds nearly the same neighbors as exact
    kNN — SQ8 error is tiny relative to inter-point distances."""
    q = vec_df.limit(10).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    codes = sq_encode(vec_df, model)
    approx = sq_search(codes, model, q, k=10)
    exact = knn_exact(vec_df, q, k=10)
    assert calculate_recall(approx, exact, 10) >= 0.9
    # top-1 self-match survives quantization
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in approx.filter(F.col("rank") == 1).collect()
    }
    assert all(qid == nid for qid, nid in top1.items())


def test_adist_close_to_exact_dist(vec_df, model):
    """sqrt(adist2) within ||recon err|| of sqrt(dist2) (triangle
    inequality with the per-dim half-scale bound)."""
    q = vec_df.limit(3).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    codes = sq_encode(vec_df, model)
    approx = sq_search(codes, model, q, k=5)
    exact = knn_exact(vec_df, q, k=5, method="native")
    err_norm = math.sqrt(sum((s / 2) ** 2 for s in model.scale))
    ex = {
        (r["query_id"], r["neighbor_id"]): r["dist2"]
        for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in ex:
            assert abs(math.sqrt(r["adist2"]) - math.sqrt(ex[key])) <= (
                err_norm * (1 + 1e-9)
            )


def test_k_validation(vec_df, model):
    codes = sq_encode(vec_df, model)
    q = vec_df.limit(1).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    with pytest.raises(ValueError, match="positive"):
        sq_search(codes, model, q, k=0)


def test_model_roundtrip(tmp_path, model):
    model.save(str(tmp_path))
    again = SQModel.load(str(tmp_path))
    assert again == model
    with pytest.raises(ValueError, match="version"):
        import json
        import os

        bad = tmp_path / "bad"
        os.makedirs(bad, exist_ok=True)
        with open(bad / "sq_model.json", "w") as fh:
            json.dump({"version": 99, "dmin": [], "dmax": []}, fh)
        SQModel.load(str(bad))


# --- IVF-SQ: residual SQ8 over coarse clusters ---


@pytest.fixture(scope="module")
def ivfsq_parts(spark, vec_df):
    import numpy as np

    from vector_indexer_spark.operators.kmeans import assign_clusters
    from vector_indexer_spark.operators.sq import ivfsq_encode, ivfsq_train

    cent_rows = vec_df.orderBy("id").limit(16).collect()
    cents_np = np.asarray([r["values"] for r in cent_rows], dtype=np.float64)
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in cents_np[i]]) for i in range(16)],
        "centroid_id long, cvec array<float>",
    )
    assigned = assign_clusters(vec_df, cents_np)
    model = ivfsq_train(assigned, cents_df)
    codes = ivfsq_encode(assigned, cents_df, model).cache()
    return cents_df, model, codes


def test_ivfsq_full_probe_recall_near_exact(spark, vec_df, ivfsq_parts):
    """With every cluster probed, IVF-SQ ~= plain SQ on residuals —
    residual ranges are tighter than raw ranges, so recall vs exact is
    at least as good as flat SQ8 (which is already ~1 here)."""
    from vector_indexer_spark.operators.sq import ivfsq_search

    cents_df, model, codes = ivfsq_parts
    q = vec_df.limit(10).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    exact = knn_exact(vec_df, q, k=10)
    got = ivfsq_search(codes, cents_df, model, q, k=10, n_probe=16)
    assert calculate_recall(got, exact, 10) >= 0.9
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in got.filter(F.col("rank") == 1).collect()
    }
    assert all(qid == nid for qid, nid in top1.items())


def test_ivfsq_recall_monotone_in_nprobe(spark, vec_df, ivfsq_parts):
    from vector_indexer_spark.operators.sq import ivfsq_search

    cents_df, model, codes = ivfsq_parts
    q = vec_df.limit(10).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    exact = knn_exact(vec_df, q, k=10)
    rs = [
        calculate_recall(
            ivfsq_search(codes, cents_df, model, q, k=10, n_probe=p),
            exact,
            10,
        )
        for p in (1, 4, 16)
    ]
    assert rs[0] <= rs[1] <= rs[2]
    assert rs[2] >= 0.9


def test_ivfsq_validation(spark, vec_df, ivfsq_parts):
    from vector_indexer_spark.operators.sq import ivfsq_search

    cents_df, model, codes = ivfsq_parts
    q = vec_df.limit(1).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    with pytest.raises(ValueError, match="positive"):
        ivfsq_search(codes, cents_df, model, q, k=0, n_probe=4)
    with pytest.raises(ValueError, match="positive"):
        ivfsq_search(codes, cents_df, model, q, k=5, n_probe=0)


def test_sq_search_arrow_native_bridge(spark, vec_df, model):
    """The GEMM arrow path and the codegen fold path return the same
    neighbors (dist values may differ in the last ULP — compare ids and
    values to 1e-9, the knn-suite bridge contract)."""
    q = vec_df.limit(8).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    codes = sq_encode(vec_df, model)
    a = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.adist2)
        for r in sq_search(codes, model, q, k=10, method="arrow").collect()
    )
    n = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.adist2)
        for r in sq_search(codes, model, q, k=10, method="native").collect()
    )
    assert [t[:3] for t in a] == [t[:3] for t in n]
    for (qa, ra, ia, da), (qn, rn, im, dn) in zip(a, n):
        assert abs(da - dn) <= 1e-9 * max(1.0, abs(dn))
    with pytest.raises(ValueError, match="unknown method"):
        sq_search(codes, model, q, k=1, method="nope")


def test_ivfsq_index_build_search_roundtrip(spark, vec_df, tmp_path_factory):
    from vector_indexer_spark.operators.sq import (
        build_ivfsq_index,
        load_ivfsq_index,
        search_ivfsq_index,
    )

    path = str(tmp_path_factory.mktemp("ivfsq") / "index")
    idx = build_ivfsq_index(vec_df, path, nlist=8, seed=42)
    # conservation: every vector encoded exactly once
    codes = idx.codes(spark)
    assert codes.count() == vec_df.count()
    assert codes.select(F.count_distinct("id")).first()[0] == vec_df.count()
    # layout: partitioned by shard, codes column int array of dim d
    assert "shard_id" in codes.columns
    r = codes.select(F.size("codes").alias("s")).first()
    assert r["s"] == idx.dimension

    again = load_ivfsq_index(spark, path)
    assert again.nlist == idx.nlist and again.sq == idx.sq

    q = vec_df.limit(10).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    exact = knn_exact(vec_df, q, k=10)
    got = search_ivfsq_index(spark, again, q, k=10, n_probe=idx.nlist)
    assert calculate_recall(got, exact, 10) >= 0.85
    pruned = search_ivfsq_index(spark, again, q, k=10, n_probe=2)
    assert pruned.count() > 0  # thin probes still answer

    with pytest.raises(FileNotFoundError):
        load_ivfsq_index(spark, str(tmp_path_factory.mktemp("x")))
    with pytest.raises(ValueError, match="positive"):
        search_ivfsq_index(spark, again, q, k=0)


def test_ivfsq_index_scan_prunes(spark, vec_df, tmp_path_factory):
    """The persisted codes scan must show Hive PartitionFilters on
    shard_id and pushed filters on cluster_id."""
    from vector_indexer_spark.operators.sq import build_ivfsq_index
    from vector_indexer_spark.plans import audit

    path = str(tmp_path_factory.mktemp("ivfsq_plan") / "index")
    idx = build_ivfsq_index(vec_df, path, nlist=8, seed=1)
    pruned = idx.codes(spark).where(
        F.col("shard_id").isin([0]) & F.col("cluster_id").isin([0, 1])
    )
    s = audit.plan_summary(pruned)
    assert any("shard_id" in f for f in s["partition_filters"])
    assert any("cluster_id" in f for f in s["pushed_filters"])


def test_ivfsq_search_arrow_native_bridge(spark, vec_df, ivfsq_parts):
    """Arrow (masked GEMM) and native (codegen fold) IVF-SQ search
    agree on neighbors; distances to 1e-9."""
    from vector_indexer_spark.operators.sq import ivfsq_search

    cents_df, model, codes = ivfsq_parts
    q = vec_df.limit(8).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    a = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.adist2)
        for r in ivfsq_search(
            codes, cents_df, model, q, k=7, n_probe=3, method="arrow"
        ).collect()
    )
    n = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.adist2)
        for r in ivfsq_search(
            codes, cents_df, model, q, k=7, n_probe=3, method="native"
        ).collect()
    )
    assert [t[:3] for t in a] == [t[:3] for t in n]
    for (_, _, _, da), (_, _, _, dn) in zip(a, n):
        assert abs(da - dn) <= 1e-9 * max(1.0, abs(dn))
    with pytest.raises(ValueError, match="unknown method"):
        ivfsq_search(codes, cents_df, model, q, k=1, n_probe=1,
                     method="nope")


def test_ivfsq_arrow_tiebreak_across_chunks(spark):
    """Duplicate vectors spread across the 8192-candidate chunk
    boundary: the per-batch merge must keep the LOWEST ids among
    equal distances (the engine-wide tie rule), same as native."""
    from vector_indexer_spark.operators.sq import (
        ivfsq_encode,
        ivfsq_search,
        ivfsq_train,
    )

    n, d = 9000, 4
    rows = [
        (i, [float(i % 50), 0.0, 0.0, 0.0], 0) for i in range(n)
    ]  # 180 exact copies of each of 50 distinct vectors, one cluster
    df = spark.createDataFrame(
        rows, "id long, values array<float>, cluster_id long"
    ).coalesce(1)
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0])], "centroid_id long, cvec array<float>"
    )
    model = ivfsq_train(df, cents)
    codes = ivfsq_encode(df, cents, model).coalesce(1)
    q = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0])], "query_id long, query array<float>"
    )
    a = ivfsq_search(codes, cents, model, q, k=5, n_probe=1,
                     method="arrow").collect()
    nv = ivfsq_search(codes, cents, model, q, k=5, n_probe=1,
                      method="native").collect()
    ids_a = [r.neighbor_id for r in sorted(a, key=lambda r: r.rank)]
    ids_n = [r.neighbor_id for r in sorted(nv, key=lambda r: r.rank)]
    assert ids_a == ids_n
    # nearest distinct value is 0 -> copies at ids 0,50,100,...; ties
    # break to the LOWEST ids regardless of chunk position
    assert ids_a == [0, 50, 100, 150, 200]


def test_ivfsq_hierarchical_probe_ranking_full_probe_identical(
    spark, vec_df, tmp_path_factory, monkeypatch
):
    import vector_indexer_spark.operators.search as S
    from vector_indexer_spark.operators.sq import (
        build_ivfsq_index,
        search_ivfsq_index,
    )

    path = str(tmp_path_factory.mktemp("ivfsq_hier") / "index")
    idx = build_ivfsq_index(vec_df, path, nlist=8, seed=42)
    q = vec_df.limit(5).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    flat = search_ivfsq_index(
        spark, idx, q, k=5, n_probe=idx.nlist
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    monkeypatch.setattr(S, "_HIER_PROBE_NLIST", 1)
    hier = search_ivfsq_index(
        spark, idx, q, k=5, n_probe=idx.nlist
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(hier.neighbor_id) == list(flat.neighbor_id)


def test_ivfsq_add_vectors_roundtrip(spark, embeddings, tmp_path):
    """Incremental IVF-SQ add: appended codes equal a direct frozen
    encode, meta count bumps, and the added rows are searchable."""
    import json
    import os

    import numpy as np

    from vector_indexer_spark.operators.kmeans import assign_clusters
    from vector_indexer_spark.operators.sq import (
        add_vectors_ivfsq,
        build_ivfsq_index,
        ivfsq_encode,
        search_ivfsq_index,
    )

    base = embeddings.filter(F.col("vec_id") < 400).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    rest = embeddings.filter(F.col("vec_id") >= 400).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    idx = build_ivfsq_index(base, str(tmp_path / "sqadd"), nlist=8, seed=42)
    stats = add_vectors_ivfsq(spark, idx, rest)
    assert stats == {"n_added": 100, "n_vectors": 500}
    assert json.load(open(os.path.join(idx.path, "ivfsq_meta.json")))[
        "n_vectors"
    ] == 500
    codes_tbl = idx.codes(spark)
    assert codes_tbl.count() == 500

    assigned = assign_clusters(
        rest, idx.centroids, vec_col="values", out_col="cluster_id",
        seed=idx.seed,
    ).select("id", F.col("values").alias("__vec"), "cluster_id")
    want = {
        r.id: (r.cluster_id, tuple(r.codes))
        for r in ivfsq_encode(
            assigned, idx.centroids_df(spark), idx.sq,
            id_col="id", vec_col="__vec",
        ).collect()
    }
    got = {
        r.id: (r.cluster_id, tuple(r.codes))
        for r in codes_tbl.filter(F.col("id") >= 400).collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="already present"):
        add_vectors_ivfsq(spark, idx, rest)

    q = embeddings.filter(F.col("vec_id").isin(420, 499)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    out = search_ivfsq_index(
        spark, idx, q, k=5, n_probe=idx.nlist
    ).toPandas()
    for qid in (420, 499):
        assert qid in set(out[out.query_id == qid].neighbor_id)
