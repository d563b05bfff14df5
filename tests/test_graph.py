"""BFS/k-NN-graph invariants (values pinned by the recursive-CTE
oracle `graph_knn_bfs_hops`; here: hand-built graphs + contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.graph import (
    bfs_hops,
    knn_graph,
    symmetrize,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bfs_hand_graph(spark):
    # 0→1→2→3 chain plus shortcut 0→2; node 9 unreachable
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (9, 9)])
    src = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, src, max_hops=5).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_depth_bound_and_multi_source(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (10, 2)])
    src = spark.createDataFrame([(0,), (10,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, src, max_hops=1).collect()}
    # depth 1 stops before node 3; node 2 is 1 hop from source 10
    assert got == {0: 0, 10: 0, 1: 1, 2: 1}


def test_bfs_zero_hops_and_contract(spark):
    e = _edges(spark, [(0, 1)])
    src = spark.createDataFrame([(0,)], "node long")
    got = bfs_hops(e, src, max_hops=0).collect()
    assert [(r["node"], r["hops"]) for r in got] == [(0, 0)]
    with pytest.raises(ValueError, match="max_hops"):
        bfs_hops(e, src, max_hops=-1)


def test_symmetrize_both_directions(spark):
    p = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = sorted(map(tuple, symmetrize(p).collect()))
    assert got == [(1, 2), (2, 1)]


def test_knn_graph_degree_and_no_self(spark):
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 50)
    )
    edges = knn_graph(
        emb, k=3, id_col="vec_id", vec_col="embedding", symmetric=False
    )
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    deg = edges.groupBy("src").count().agg(F.max("count")).first()[0]
    assert deg == 3
    assert edges.select("src").distinct().count() == 50
    with pytest.raises(ValueError, match="k must be"):
        knn_graph(emb, k=0, id_col="vec_id", vec_col="embedding")


def test_pagerank_hand_computed_and_float_proximity(spark):
    from vector_indexer_spark.operators.graph import pagerank

    # 3-node cycle + one dangling receiver: 0->1->2->0, 0->3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3)], "src long, dst long"
    )
    got = {
        r.node: r.rank_micros
        for r in pagerank(edges, iterations=2).collect()
    }
    # hand-run the exact integer recurrence
    import collections
    deg = {0: 2, 1: 1, 2: 1}
    r = {n: 1_000_000 for n in range(4)}
    for _ in range(2):
        cin = collections.defaultdict(int)
        for s, d in [(0, 1), (1, 2), (2, 0), (0, 3)]:
            cin[d] += r[s] // deg[s]
        r = {n: 150_000 + (85 * cin[n]) // 100 for n in range(4)}
    assert got == r
    # and it tracks float PageRank (same damping, dropped dangling mass)
    rf = {n: 1.0 for n in range(4)}
    for _ in range(2):
        cf = collections.defaultdict(float)
        for s, d in [(0, 1), (1, 2), (2, 0), (0, 3)]:
            cf[d] += rf[s] / deg[s]
        rf = {n: 0.15 + 0.85 * cf[n] for n in range(4)}
    for n in range(4):
        assert abs(got[n] / 1e6 - rf[n]) < 1e-4


def test_pagerank_zero_iterations_and_validation(spark):
    import pytest as _pytest

    from vector_indexer_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r.node: r.rank_micros for r in pagerank(edges, iterations=0).collect()}
    assert got == {0: 1_000_000, 1: 1_000_000}
    with _pytest.raises(ValueError):
        pagerank(edges, iterations=-1)
    with _pytest.raises(ValueError):
        pagerank(edges, damping_pct=101)


def test_connected_components_islands(spark):
    from vector_indexer_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    got = {
        r.node: r.component
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_distributed_path_matches_driver(spark):
    from vector_indexer_spark.operators.graph import connected_components

    # a chain forces multi-round label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    driver = {
        (r.node, r.component)
        for r in connected_components(edges).collect()
    }
    distributed = {
        (r.node, r.component)
        for r in connected_components(edges, max_pairs_driver=5).collect()
    }
    assert driver == distributed == {(i, 0) for i in range(61)}


# ---------------------------------------------------------------------------
# Graph-based ANN beam search
# ---------------------------------------------------------------------------


def _clustered_vectors(spark, n_clusters=6, per=30, d=8, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (n_clusters, d))
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, (per, d)) for c in centers]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "id long, values array<float>",
    )


def test_graph_ann_beam_recall_and_invariants(spark):
    from vector_indexer_spark.operators.graph import (
        graph_ann_search,
        knn_graph,
    )
    from vector_indexer_spark.operators.knn import knn_exact

    vecs = _clustered_vectors(spark)
    edges = knn_graph(vecs, 6, symmetric=True)
    q = vecs.filter(F.col("id") % 37 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    # one entry per cluster — the coarse seeding HNSW's upper layers
    # provide; a flat k-NN graph of well-separated clusters is
    # legitimately disconnected, so navigability needs seeded entries
    entries = [0, 30, 60, 90, 120, 150]
    got = graph_ann_search(
        vecs, edges, q, k=5, beam=12, max_hops=8, entry_ids=entries
    ).collect()
    truth = knn_exact(vecs, q, k=5, method="native").collect()

    # contract: contiguous ranks 1..5 per query, dist2 non-decreasing
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, 6))
        d = [r.dist2 for r in rows]
        assert d == sorted(d)
        # self is reachable from anywhere on a connected knn graph
        assert rows[0].neighbor_id == qid and rows[0].dist2 == 0.0

    # recall vs exact ground truth: generous hops on a 6-NN graph
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(want[qid] & {r.neighbor_id for r in rows})
        for qid, rows in by_q.items()
    )
    recall = hits / sum(len(s) for s in want.values())
    assert recall >= 0.8, recall

    # more hops can only improve (visited set grows monotonically)
    got2 = graph_ann_search(
        vecs, edges, q, k=5, beam=12, max_hops=2, entry_ids=entries
    ).collect()
    d_sum_8 = sum(r.dist2 for r in got)
    d_sum_2 = sum(r.dist2 for r in got2)
    assert d_sum_8 <= d_sum_2 + 1e-9

    # zero hops: results come only from the default (hash-spread)
    # entry set — bottom-`beam` ids under the multiplicative hash
    n_nodes = vecs.count()
    hashes = sorted(
        range(n_nodes), key=lambda i: ((i % 1000003) * 40503 + 7) % 1000003
    )
    got0 = graph_ann_search(vecs, edges, q, k=3, beam=4, max_hops=0).collect()
    assert {r.neighbor_id for r in got0} <= set(hashes[:4])

    # explicit entry points are respected
    gote = graph_ann_search(
        vecs, edges, q, k=1, beam=2, max_hops=0, entry_ids=[11, 12]
    ).collect()
    assert {r.neighbor_id for r in gote} <= {11, 12}

    with pytest.raises(ValueError):
        graph_ann_search(vecs, edges, q, k=0)
    with pytest.raises(ValueError):
        graph_ann_search(vecs, edges, q, max_hops=-1)


# ---------------------------------------------------------------------------
# NN-Descent k-NN graph construction
# ---------------------------------------------------------------------------


def test_nn_descent_converges_to_near_exact_graph(spark):
    from vector_indexer_spark.operators.graph import (
        knn_graph,
        nn_descent_knn_graph,
    )

    vecs = _clustered_vectors(spark, n_clusters=5, per=40, d=8, seed=11)
    exact = {
        (r.src, r.dst)
        for r in knn_graph(vecs, 5, symmetric=False).collect()
    }
    approx_rows = nn_descent_knn_graph(
        vecs, 5, iterations=3, symmetric=False, return_distances=True,
        early_stop=False,
    ).collect()
    approx = {(r.src, r.dst) for r in approx_rows}

    # invariants: <=k out-edges per node, contiguous ranks, no self-loops
    by_src = {}
    for r in approx_rows:
        by_src.setdefault(r.src, []).append(r)
        assert r.src != r.dst
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        d = [r.dist2 for r in rows]
        assert d == sorted(d)

    # measured curve on this fixture: 0.11 init -> 0.92 at 3 rounds;
    # determinism across engines is locked by the oracle query
    # (graph_nn_descent_fixed replays the recurrence in DuckDB)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, recall


def test_nn_descent_iterations_improve_distance_mass(spark):
    from vector_indexer_spark.operators.graph import nn_descent_knn_graph

    vecs = _clustered_vectors(spark, n_clusters=4, per=30, d=6, seed=7)

    def mass(iters):
        rows = nn_descent_knn_graph(
            vecs, 4, iterations=iters, symmetric=False,
            return_distances=True, early_stop=False,
        ).collect()
        return sum(r.dist2 for r in rows), len(rows)

    m0, n0 = mass(0)
    m2, n2 = mass(2)
    # rounds only add/replace-with-closer edges: count grows to n*k,
    # per-edge distances shrink — with full coverage, total mass at 2
    # rounds is far below the hash-bucket init even with more edges
    assert n2 >= n0
    assert n2 == 120 * 4
    assert m2 <= m0


def test_nn_descent_feeds_graph_ann_search(spark):
    from vector_indexer_spark.operators.graph import (
        graph_ann_search,
        nn_descent_knn_graph,
    )
    from vector_indexer_spark.operators.knn import knn_exact

    vecs = _clustered_vectors(spark, n_clusters=4, per=30, d=6, seed=5)
    edges = nn_descent_knn_graph(
        vecs, 5, iterations=2, symmetric=True, early_stop=False
    )
    q = vecs.filter(F.col("id") % 29 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    entries = [0, 30, 60, 90]
    got = graph_ann_search(
        vecs, edges, q, k=3, beam=10, max_hops=4, entry_ids=entries
    ).collect()
    truth = knn_exact(vecs, q, k=3, method="native").collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for r in got if r.neighbor_id in want.get(r.query_id, set())
    )
    assert hits / sum(len(s) for s in want.values()) >= 0.8


def test_nn_descent_error_contracts(spark):
    from vector_indexer_spark.operators.graph import nn_descent_knn_graph

    vecs = _clustered_vectors(spark, n_clusters=2, per=5, d=4)
    with pytest.raises(ValueError):
        nn_descent_knn_graph(vecs, 0)
    with pytest.raises(ValueError):
        nn_descent_knn_graph(vecs, 3, iterations=-1)


def test_nn_descent_arrow_native_bitexact(spark):
    from vector_indexer_spark.operators.graph import nn_descent_knn_graph

    vecs = _clustered_vectors(spark, n_clusters=3, per=20, d=6, seed=9)
    kwargs = dict(
        iterations=1, symmetric=False, return_distances=True,
        early_stop=False,
    )
    nat = {
        (r.src, r.dst, r.rank, r.dist2)
        for r in nn_descent_knn_graph(vecs, 4, method="native", **kwargs)
        .collect()
    }
    arr = {
        (r.src, r.dst, r.rank, r.dist2)
        for r in nn_descent_knn_graph(vecs, 4, method="arrow", **kwargs)
        .collect()
    }
    # bit-identical doubles: same fold-left IEEE sequence per pair
    assert nat == arr

    with pytest.raises(ValueError):
        nn_descent_knn_graph(vecs, 4, method="simd")


def test_nn_descent_reverse_degree_cap(spark):
    """ρ-sampling guard: a planted hub (every point near one medoid
    direction) still yields full-k, deterministic output with the cap
    on, and quality stays close to the uncapped run."""
    import numpy as np

    from vector_indexer_spark.operators.graph import nn_descent_knn_graph

    rng = np.random.default_rng(17)
    # hub topology: all points within a thin cone — nearest-neighbor
    # lists concentrate on the same few central points
    base = rng.normal(0, 0.05, (80, 6)) + np.linspace(0, 1, 80)[:, None]
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(base)],
        "id long, values array<float>",
    )
    kwargs = dict(
        iterations=2, symmetric=False, return_distances=True,
        early_stop=False,
    )
    capped_rows = nn_descent_knn_graph(
        vecs, 4, max_reverse_degree=8, **kwargs
    ).collect()
    uncapped = {
        (r.src, r.dst)
        for r in nn_descent_knn_graph(
            vecs, 4, max_reverse_degree=None, **kwargs
        ).collect()
    }
    capped = {(r.src, r.dst) for r in capped_rows}
    # contract holds under the cap: k edges per node, ranks contiguous
    by_src = {}
    for r in capped_rows:
        by_src.setdefault(r.src, []).append(r.rank)
    assert len(by_src) == 80
    assert all(sorted(v) == list(range(1, 5)) for v in by_src.values())
    # the cap trades a bounded amount of candidate coverage
    assert len(capped & uncapped) / len(uncapped) >= 0.7
    # determinism under the cap
    again = {
        (r.src, r.dst)
        for r in nn_descent_knn_graph(
            vecs, 4, max_reverse_degree=8, **kwargs
        ).collect()
    }
    assert again == capped


def test_nn_descent_hub_guard_on_by_default(spark):
    """The ρ-sampling guard defaults to 'auto' = 4·k: the default run
    must equal an explicit 4·k run bit-for-bit, a binding cap must
    change the candidate flow on a hub fixture, and bad values raise.
    On a deduped-web corpus hubs are the norm — an unreachable guard
    (round-5 ADVICE/VERDICT item) meant every index build risked a
    degree-squared candidate blowup from one join key."""
    import numpy as np

    from vector_indexer_spark.operators.graph import nn_descent_knn_graph

    rng = np.random.default_rng(23)
    # star-ish hub: half the points huddle around one medoid, so the
    # medoid's in-degree far exceeds k and the cap binds
    hub = rng.normal(0, 0.01, (40, 6))
    spread = rng.normal(0, 1.0, (40, 6)) + 5.0
    base = np.vstack([hub, spread])
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(base)],
        "id long, values array<float>",
    )
    kwargs = dict(
        iterations=2, symmetric=False, return_distances=True,
        early_stop=False,
    )
    default_rows = {
        (r.src, r.dst, r.rank, r.dist2)
        for r in nn_descent_knn_graph(vecs, 4, **kwargs).collect()
    }
    explicit = {
        (r.src, r.dst, r.rank, r.dist2)
        for r in nn_descent_knn_graph(
            vecs, 4, max_reverse_degree=16, **kwargs
        ).collect()
    }
    assert default_rows == explicit  # 'auto' resolves to 4*k
    # the guard's contract survives under a hard-binding cap: full-k
    # output, ranks contiguous — the hub cannot starve other nodes
    tight = nn_descent_knn_graph(
        vecs, 4, max_reverse_degree=1, **kwargs
    ).collect()
    by_src = {}
    for r in tight:
        by_src.setdefault(r.src, []).append(r.rank)
    assert len(by_src) == 80
    assert all(sorted(v) == list(range(1, 5)) for v in by_src.values())

    with pytest.raises(ValueError, match="max_reverse_degree"):
        nn_descent_knn_graph(vecs, 4, max_reverse_degree=0, **kwargs)
    with pytest.raises(ValueError, match="max_reverse_degree"):
        nn_descent_knn_graph(vecs, 4, max_reverse_degree="always", **kwargs)


def test_graph_index_build_passes_hub_guard_through(spark, tmp_path):
    """build_graph_index records the RESOLVED guard in meta.json and
    inserts reuse it; None round-trips too (oracle fixtures)."""
    import numpy as np

    from vector_indexer_spark.operators.graph_index import (
        build_graph_index,
        load_graph_index,
    )

    rng = np.random.default_rng(31)
    base = rng.normal(0, 1, (60, 4))
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(base)],
        "id long, values array<float>",
    )
    idx = build_graph_index(
        vecs, str(tmp_path / "g_auto"), k=4, iterations=1
    )
    assert idx.max_reverse_degree == 16  # auto = 4*k
    assert load_graph_index(idx.path).max_reverse_degree == 16

    idx_off = build_graph_index(
        vecs, str(tmp_path / "g_off"), k=4, iterations=1,
        max_reverse_degree=None,
    )
    assert idx_off.max_reverse_degree is None
    assert load_graph_index(idx_off.path).max_reverse_degree is None

    idx_mc = build_graph_index(
        vecs, str(tmp_path / "g_mc"), k=4, iterations=1,
        max_reverse_degree=8, max_candidates=32,
    )
    loaded = load_graph_index(idx_mc.path)
    assert loaded.max_reverse_degree == 8
    assert loaded.max_candidates == 32
