"""Two-layer graph index: build/load parity contract + end-to-end
recall with NO manual entry seeding (the point of the coarse layer)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.graph_index import (
    GRAPH_FORMAT_VERSION,
    build_graph_index,
    load_graph_index,
    search_graph_index,
)


def _clustered_vectors(spark, n_clusters=6, per=30, d=8, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (n_clusters, d))
    pts = np.concatenate([c + rng.normal(0, 0.5, (per, d)) for c in centers])
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "id long, values array<float>",
    )


@pytest.fixture(scope="module")
def gidx(spark, tmp_path_factory):
    vecs = _clustered_vectors(spark, n_clusters=6, per=30, d=8, seed=3)
    path = str(tmp_path_factory.mktemp("gidx") / "graph_index")
    idx = build_graph_index(
        vecs, path, k=6, iterations=2, coarse_size=24
    )
    return idx, vecs


def test_build_meta_and_layout(gidx, spark):
    idx, vecs = gidx
    assert idx.dimension == 8
    assert idx.n_vectors == 180
    assert idx.coarse_size == 24
    assert os.path.exists(os.path.join(idx.path, "meta.json"))
    # layer-0: symmetrized, no self-loops, every node has out-edges
    e = idx.edges(spark)
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    assert e.select("src").distinct().count() == 180
    # coarse layer: a plain node-id sample of the corpus
    cn = {r.node for r in idx.coarse_nodes(spark).collect()}
    assert len(cn) == 24
    assert cn <= {r.id for r in vecs.select("id").collect()}


def test_load_roundtrip_and_error_contract(gidx, tmp_path):
    idx, _ = gidx
    loaded = load_graph_index(idx.path)
    assert loaded == idx
    with pytest.raises(FileNotFoundError, match="meta.json missing"):
        load_graph_index(str(tmp_path / "nope"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "meta.json").write_text(json.dumps({"version": 99}))
    with pytest.raises(ValueError, match="version"):
        load_graph_index(str(bad))


def test_two_layer_search_recall_without_seeding(gidx, spark):
    from vector_indexer_spark.operators.knn import knn_exact

    idx, vecs = gidx
    # queries spread across all 6 clusters; NO entry_ids anywhere —
    # the coarse layer must route each query to its neighborhood
    q = vecs.filter(F.col("id") % 13 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    got = search_graph_index(
        spark, idx, vecs, q, k=5, beam=12, max_hops=4,
        entry_fanout=6
    ).collect()
    truth = knn_exact(vecs, q, k=5, method="native").collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    # contract: contiguous ranks, sorted dist2, self found at rank 1
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert rows[0].neighbor_id == qid and rows[0].dist2 == 0.0
    hits = sum(
        len(want[qid] & {r.neighbor_id for r in rows})
        for qid, rows in by_q.items()
    )
    recall = hits / sum(len(s) for s in want.values())
    assert recall >= 0.85, recall


def test_build_error_contracts(spark, tmp_path):
    vecs = _clustered_vectors(spark, n_clusters=2, per=4, d=4)
    with pytest.raises(ValueError, match="k must be"):
        build_graph_index(vecs, str(tmp_path / "x"), k=0)
    empty = vecs.filter(F.col("id") < 0)
    with pytest.raises(ValueError, match="zero vectors"):
        build_graph_index(empty, str(tmp_path / "y"))


def test_add_and_compact_roundtrip(spark, tmp_path):
    from vector_indexer_spark.operators.graph_index import (
        add_to_graph_index,
        compact_graph_index,
        load_graph_index,
    )
    from vector_indexer_spark.operators.knn import knn_exact

    base = _clustered_vectors(spark, n_clusters=4, per=25, d=6, seed=21)
    # the insert batch: a shifted copy of cluster members with new ids
    newv = base.filter(F.col("id") % 10 == 0).select(
        (F.col("id") + 1000).alias("id"),
        F.transform("values", lambda x: x + F.lit(0.25)).alias("values"),
    )
    path = str(tmp_path / "gidx")
    idx = build_graph_index(
        base, path, k=5, iterations=2, coarse_size=20
    )
    n0 = idx.n_vectors
    added = add_to_graph_index(spark, idx, base, newv)
    assert added == 10
    assert load_graph_index(path).n_vectors == n0 + 10

    combined = base.unionByName(newv)
    e = idx.edges(spark)
    new_ids = {r.id for r in newv.select("id").collect()}
    # appended in both directions + batch-internal connectivity
    srcs = {r.src for r in e.collect()}
    assert new_ids <= srcs
    fwd = e.filter(F.col("src").isin(*new_ids) & ~F.col("dst").isin(*new_ids))
    rev = e.filter(F.col("dst").isin(*new_ids) & ~F.col("src").isin(*new_ids))
    assert fwd.count() > 0 and rev.count() > 0

    # inserted points are now findable through the live index
    q = newv.select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    got = search_graph_index(
        spark, idx, combined, q, k=3, beam=10, max_hops=4,
        entry_fanout=6
    ).collect()
    truth = knn_exact(combined, q, k=3, method="native").collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for r in got if r.neighbor_id in want[r.query_id])
    assert hits / sum(len(s) for s in want.values()) >= 0.8
    # every inserted point finds itself at rank 1
    self_hits = {r.query_id for r in got if r.rank == 1 and r.neighbor_id == r.query_id}
    assert self_hits == new_ids

    # compaction: degree bounded, search quality preserved
    n_before, n_after = compact_graph_index(
        spark, idx, combined, max_degree=6
    )
    assert n_after <= n_before
    deg = (
        idx.edges(spark).groupBy("src").count()
        .agg(F.max("count")).first()[0]
    )
    assert deg <= 6
    got2 = search_graph_index(
        spark, idx, combined, q, k=3, beam=10, max_hops=4,
        entry_fanout=6
    ).collect()
    hits2 = sum(1 for r in got2 if r.neighbor_id in want[r.query_id])
    assert hits2 / sum(len(s) for s in want.values()) >= 0.8

    with pytest.raises(ValueError, match="max_degree"):
        compact_graph_index(spark, idx, combined, max_degree=0)


def test_add_empty_batch_is_noop(spark, tmp_path):
    from vector_indexer_spark.operators.graph_index import (
        add_to_graph_index,
    )

    base = _clustered_vectors(spark, n_clusters=2, per=10, d=4, seed=5)
    idx = build_graph_index(
        base, str(tmp_path / "g2"), k=3, iterations=1,
        coarse_size=8,
    )
    n_edges = idx.edges(spark).count()
    assert add_to_graph_index(spark, idx, base, base.filter("id < 0")) == 0
    assert idx.edges(spark).count() == n_edges
    assert idx.n_vectors == 20


def test_delete_tombstones_then_compact(spark, tmp_path):
    from vector_indexer_spark.operators.graph_index import (
        compact_graph_index,
        delete_from_graph_index,
        load_graph_index,
    )

    base = _clustered_vectors(spark, n_clusters=3, per=20, d=6, seed=13)
    path = str(tmp_path / "gdel")
    idx = build_graph_index(
        base, path, k=4, iterations=2, coarse_size=12
    )
    doomed_ids = {0, 5, 21}
    doomed = base.filter(F.col("id").isin(*doomed_ids)).select("id")
    assert delete_from_graph_index(spark, idx, doomed) == 3
    assert idx.n_vectors == 57
    assert load_graph_index(path).n_vectors == 57
    # re-deleting is a no-op
    assert delete_from_graph_index(spark, idx, doomed) == 0
    assert idx.n_vectors == 57

    # soft state: edges untouched, but deleted never appear in results
    q = base.filter(F.col("id").isin(1, 6, 22)).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    got = search_graph_index(
        spark, idx, base, q, k=5, beam=10, max_hops=4,
        entry_fanout=4
    ).collect()
    assert {r.neighbor_id for r in got} & doomed_ids == set()
    # live neighbors still found (self at rank 1)
    assert {r.query_id for r in got if r.rank == 1 and r.neighbor_id == r.query_id} == {1, 6, 22}

    # compaction physically removes tombstoned nodes everywhere
    live = base.filter(~F.col("id").isin(*doomed_ids))
    compact_graph_index(spark, idx, live, max_degree=8)
    e = idx.edges(spark)
    nodes_in_edges = {r.src for r in e.collect()} | {r.dst for r in e.collect()}
    assert nodes_in_edges & doomed_ids == set()
    assert {r.node for r in idx.coarse_nodes(spark).collect()} & doomed_ids == set()
    assert not os.path.exists(os.path.join(path, "deleted"))
    # post-compaction search over the live table still works
    got2 = search_graph_index(
        spark, idx, live, q, k=5, beam=10, max_hops=4,
        entry_fanout=4
    ).collect()
    assert {r.neighbor_id for r in got2} & doomed_ids == set()
    assert len({r.query_id for r in got2}) == 3


def test_streaming_ingest_matches_sequential_batch_adds(spark, tmp_path):
    """Stream twin ≡ batch twin: two micro-batches through the stream
    produce the identical edge table as two sequential
    add_to_graph_index calls (everything is deterministic)."""
    from vector_indexer_spark.operators.graph_index import (
        add_to_graph_index,
    )
    from vector_indexer_spark.streaming.graph import (
        start_graph_index_ingest,
    )

    base = _clustered_vectors(spark, n_clusters=3, per=20, d=6, seed=31)
    b1 = base.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + 500).alias("id"),
        F.transform("values", lambda x: x + F.lit(0.1))
        .cast("array<float>")
        .alias("values"),
    )
    b2 = base.filter(F.col("id") % 11 == 3).select(
        (F.col("id") + 900).alias("id"),
        F.transform("values", lambda x: x - F.lit(0.1))
        .cast("array<float>")
        .alias("values"),
    )
    kwargs = dict(
        beam=8, max_hops=3, entry_fanout=4, batch_iterations=1,
    )

    # --- batch twin: two sequential adds ---
    bpath = str(tmp_path / "batch_gidx")
    bidx = build_graph_index(
        base, bpath, k=4, iterations=1, coarse_size=12
    )
    v1 = base
    add_to_graph_index(spark, bidx, v1, b1, **kwargs)
    v2 = v1.unionByName(b1)
    add_to_graph_index(spark, bidx, v2, b2, **kwargs)
    want = {(r.src, r.dst) for r in bidx.edges(spark).collect()}

    # --- streaming twin: same batches as two availableNow runs ---
    spath = str(tmp_path / "stream_gidx")
    sidx = build_graph_index(
        base, spath, k=4, iterations=1, coarse_size=12
    )
    vecs_dir = str(tmp_path / "vectors")
    src = str(tmp_path / "stream_in")
    ckpt = str(tmp_path / "ckpt")
    base.write.parquet(vecs_dir)

    def run(batch_df):
        batch_df.write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "id long, values array<float>"
        ).parquet(src)
        q = start_graph_index_ingest(
            sidx, stream, vecs_dir, ckpt,
            trigger_available_now=True, **kwargs,
        )
        q.awaitTermination(180)

    run(b1)
    run(b2)
    got = {(r.src, r.dst) for r in sidx.edges(spark).collect()}
    assert got == want
    # the canonical vector table grew with both batches
    assert spark.read.parquet(vecs_dir).count() == 60 + b1.count() + b2.count()
    assert sidx.n_vectors == 60 + b1.count() + b2.count()


def test_streaming_ingest_upsert_updates_vector(spark, tmp_path):
    """on_update="upsert": a redelivered id carrying a CHANGED vector
    is re-linked at its new position and its canonical row replaced —
    the updated vector is searchable post-batch (its own exact query
    finds it at rank 1, dist2 0). Row count and n_vectors are
    unchanged by the update; an unchanged redelivery stays a no-op;
    on_update="ignore" keeps the drop semantic."""
    from vector_indexer_spark.operators.graph_index import (
        search_graph_index,
    )
    from vector_indexer_spark.streaming.graph import (
        start_graph_index_ingest,
    )

    base = _clustered_vectors(spark, n_clusters=3, per=20, d=6, seed=47)
    path = str(tmp_path / "up_gidx")
    idx = build_graph_index(base, path, k=4, iterations=1, coarse_size=12)
    vecs_dir = str(tmp_path / "up_vectors")
    base.write.parquet(vecs_dir)
    kwargs = dict(beam=8, max_hops=3, entry_fanout=4, batch_iterations=1)

    moved = base.filter(F.col("id") == 5).select(
        "id",
        F.transform("values", lambda x: x + F.lit(25.0))
        .cast("array<float>")
        .alias("values"),
    )
    new_row = base.filter(F.col("id") == 7).select(
        (F.col("id") + 700).alias("id"), "values"
    )
    unchanged = base.filter(F.col("id") == 9)
    batch = moved.unionByName(new_row).unionByName(unchanged)

    def run(batch_df, src, ckpt, **kw):
        batch_df.write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "id long, values array<float>"
        ).parquet(src)
        q = start_graph_index_ingest(
            idx, stream, vecs_dir, str(ckpt), trigger_available_now=True,
            **kwargs, **kw,
        )
        q.awaitTermination(180)

    run(batch, str(tmp_path / "in1"), tmp_path / "ck1", on_update="upsert")

    after = spark.read.parquet(vecs_dir)
    assert after.count() == 61  # +1 new row, update added nothing
    assert idx.n_vectors == 61
    got = after.filter(F.col("id") == 5).first()["values"]
    want = moved.first()["values"]
    assert list(got) == list(want)  # canonical row replaced, once

    q5 = moved.select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    hit = (
        search_graph_index(spark, idx, after, q5, k=1, beam=8, max_hops=3)
        .filter(F.col("rank") == 1)
        .first()
    )
    assert hit["neighbor_id"] == 5 and hit["dist2"] == 0.0

    # ignore mode: a further vector change on id 5 is dropped
    moved2 = base.filter(F.col("id") == 5).select(
        "id",
        F.transform("values", lambda x: x - F.lit(50.0))
        .cast("array<float>")
        .alias("values"),
    )
    run(moved2, str(tmp_path / "in2"), tmp_path / "ck2", on_update="ignore")
    got2 = spark.read.parquet(vecs_dir).filter(F.col("id") == 5).first()[
        "values"
    ]
    assert list(got2) == list(want)  # still the UPSERTED vector

    with pytest.raises(ValueError):
        start_graph_index_ingest(
            idx,
            spark.readStream.schema("id long, values array<float>").parquet(
                str(tmp_path / "in1")
            ),
            vecs_dir,
            str(tmp_path / "ck3"),
            on_update="bogus",
        )


def test_graph_index_stats_report(gidx, spark):
    from vector_indexer_spark.operators.graph_index import (
        graph_index_stats,
    )

    idx, _ = gidx
    rep = {
        (r.section, r.key): r.value
        for r in graph_index_stats(spark, idx).collect()
    }
    assert rep[("edges", "n_edges")] == idx.edges(spark).count()
    # symmetric build: every edge's reverse exists
    assert rep[("edges", "reciprocity_milli")] == 1000
    assert rep[("edges", "n_nodes_with_out")] == 180
    assert rep[("edges", "min_out_degree")] >= 1
    assert (
        rep[("edges", "min_out_degree")]
        <= rep[("edges", "avg_out_degree_milli")] // 1000 + 1
    )
    assert rep[("coarse", "n_coarse_nodes")] == 24
    assert rep[("meta", "n_vectors")] == 180
    assert rep[("deleted", "n_tombstones")] == 0


def test_cosine_metric_index(spark, tmp_path):
    """Cosine metric: same direction at different magnitudes are
    near-duplicates under cosine but far under L2 — the cosine index
    must find them; an L2 index on the same data must not."""
    import numpy as np

    from vector_indexer_spark.operators.graph_index import (
        load_graph_index,
    )
    from vector_indexer_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(23)
    dirs = rng.normal(0, 1, (12, 6))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    i = 0
    for d in dirs:  # 10 points per ray at magnitudes 1..10
        for mag in range(1, 11):
            rows.append(
                (i, [float(x) for x in d * mag + rng.normal(0, 0.01, 6)])
            )
            i += 1
    vecs = spark.createDataFrame(rows, "id long, values array<float>")

    path = str(tmp_path / "gcos")
    # 12 near-identical cliques: the coarse layer must cover every
    # ray or its queries cannot route (disconnected-clique data is the
    # worst case for sampled entry layers) — use a generous sample
    idx = build_graph_index(
        vecs, path, k=6, iterations=3, coarse_size=60,
        metric="cosine",
    )
    assert load_graph_index(path).metric == "cosine"

    q = vecs.filter(F.col("id") % 10 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    got = search_graph_index(
        spark, idx, vecs, q, k=5, beam=12, max_hops=5,
        entry_fanout=6
    ).collect()
    truth = cosine_topk(
        vecs, q, 5, id_col="id", vec_col="values",
        query_id_col="query_id", query_col="query",
    ).collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for r in got if r.neighbor_id in want[r.query_id])
    recall = hits / sum(len(s) for s in want.values())
    assert recall >= 0.8, recall
    # each query's cosine neighborhood is its own ray (ids i..i+9):
    # the cosine index returns ray-mates, not magnitude-mates
    same_ray = sum(
        1 for r in got if r.neighbor_id // 10 == r.query_id // 10
    )
    assert same_ray / len(got) >= 0.8

    with pytest.raises(ValueError, match="metric"):
        build_graph_index(vecs, str(tmp_path / "bad"), metric="dot")


def test_filtered_search_restricts_results_not_traversal(gidx, spark):
    idx, vecs = gidx
    q = vecs.filter(F.col("id") % 31 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    allowed = vecs.filter(F.col("id") % 3 == 0).select("id")
    got = search_graph_index(
        spark, idx, vecs, q, k=5, beam=12, max_hops=4,
        entry_fanout=6, filter_ids=allowed,
    ).collect()
    assert got, "filtered search returned nothing"
    assert all(r.neighbor_id % 3 == 0 for r in got)
    # ranks stay contiguous after the filter (applied BEFORE top-k)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    # unfiltered search on the same queries finds disallowed ids too
    full = search_graph_index(
        spark, idx, vecs, q, k=5, beam=12, max_hops=4, entry_fanout=6
    ).collect()
    assert any(r.neighbor_id % 3 != 0 for r in full)


def _region_vectors(spark, lo, n, offset, d=6, seed=41):
    """n points in a ball around `offset` with ids starting at `lo`."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.5, (n, d)) + offset
    return spark.createDataFrame(
        [(lo + i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "id long, values array<float>",
    )


def test_compaction_refreshes_coarse_sample_after_appends(spark, tmp_path):
    """Round-5 VERDICT item #3: inserts never grow the coarse routing
    layer, so after heavy append traffic into a NEW region the entry
    points all sit in the original region and recall decays invisibly.
    Compaction must recompute the hash-spread sample over the LIVE id
    set — restoring recall parity with a fresh build on the same data
    — and the health stats must flag the staleness beforehand."""
    from vector_indexer_spark.operators.graph_index import (
        add_to_graph_index,
        compact_graph_index,
        graph_index_stats,
    )
    from vector_indexer_spark.operators.knn import knn_exact

    base = _region_vectors(spark, 0, 100, 0.0, seed=41)
    newv = _region_vectors(spark, 1000, 100, 25.0, seed=43)
    combined = base.unionByName(newv)
    path = str(tmp_path / "g_stale")
    idx = build_graph_index(base, path, k=5, iterations=2)
    assert idx.coarse_refreshed_at_n == 100
    add_to_graph_index(spark, idx, base, newv)

    # pre-compaction: routing is stranded in the original region and
    # the ANALYZE surface says so
    pre_coarse = {r.node for r in idx.coarse_nodes(spark).collect()}
    assert all(n < 100 for n in pre_coarse)
    stats = {
        (r.section, r.key): r.value
        for r in graph_index_stats(spark, idx).collect()
    }
    assert stats[("health", "appends_since_coarse_refresh")] == 100
    assert stats[("health", "coarse_stale_milli")] == 500
    assert stats[("health", "needs_compaction")] == 1

    compact_graph_index(spark, idx, combined)
    post_coarse = {r.node for r in idx.coarse_nodes(spark).collect()}
    assert any(n >= 1000 for n in post_coarse)  # new region now routed
    assert idx.coarse_refreshed_at_n == 200
    assert load_graph_index(path).coarse_refreshed_at_n == 200
    stats2 = {
        (r.section, r.key): r.value
        for r in graph_index_stats(spark, idx).collect()
    }
    assert stats2[("health", "appends_since_coarse_refresh")] == 0
    assert stats2[("health", "needs_compaction")] == 0
    assert stats2[("edges", "n_duplicate_edge_rows")] == 0

    # recall parity with a fresh build over the same 200 vectors,
    # queried from the appended region
    q = newv.filter(F.col("id") % 10 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    truth = knn_exact(combined, q, k=5, method="native").collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(index):
        got = search_graph_index(
            spark, index, combined, q, k=5, beam=12, max_hops=4,
            entry_fanout=6,
        ).collect()
        hits = sum(1 for r in got if r.neighbor_id in want[r.query_id])
        return hits / sum(len(s) for s in want.values())

    fresh = build_graph_index(
        combined, str(tmp_path / "g_fresh"), k=5, iterations=2
    )
    r_compacted, r_fresh = recall(idx), recall(fresh)
    assert r_compacted >= r_fresh - 0.05, (r_compacted, r_fresh)
    assert r_compacted >= 0.8, r_compacted


def test_health_flags_trip_on_tombstones_and_dup_edges(spark, tmp_path):
    from vector_indexer_spark.operators.graph_index import (
        delete_from_graph_index,
        graph_index_stats,
    )

    base = _region_vectors(spark, 0, 50, 0.0, seed=47)
    idx = build_graph_index(base, str(tmp_path / "g_h"), k=4, iterations=1)
    # duplicate edge rows: re-append the edge table onto itself
    e = idx.edges(spark)
    e.write.mode("append").parquet(os.path.join(idx.path, "edges"))
    doomed = base.filter(F.col("id") < 10).select("id")
    assert delete_from_graph_index(spark, idx, doomed) == 10
    stats = {
        (r.section, r.key): r.value
        for r in graph_index_stats(spark, idx).collect()
    }
    n_edges = stats[("edges", "n_edges")]
    assert stats[("edges", "n_duplicate_edge_rows")] == n_edges
    assert stats[("health", "duplicate_edge_milli")] == 1000
    assert stats[("health", "tombstone_milli")] == (10 * 1000) // 40
    assert stats[("health", "needs_compaction")] == 1


def test_meta_writes_are_atomic_and_crash_safe(spark, tmp_path):
    """ADVICE r5: meta.json rewrites must go through tmp + os.rename —
    a stale/garbage .tmp from a crashed prior write must never poison
    the live meta, and every maintenance op must leave meta loadable."""
    from vector_indexer_spark.operators.graph_index import (
        add_to_graph_index,
        compact_graph_index,
        delete_from_graph_index,
    )

    base = _region_vectors(spark, 0, 40, 0.0, seed=53)
    newv = _region_vectors(spark, 100, 10, 1.0, seed=59)
    path = str(tmp_path / "g_atomic")
    idx = build_graph_index(base, path, k=4, iterations=1)
    # simulate a crashed mid-write from a prior process
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        f.write('{"version": 99, "garb')
    add_to_graph_index(spark, idx, base, newv)
    assert not os.path.exists(tmp)  # rename consumed a FRESH tmp
    assert load_graph_index(path).n_vectors == 50

    delete_from_graph_index(spark, idx, newv.select("id"))
    assert load_graph_index(path).n_vectors == 40
    combined = base.unionByName(newv)
    compact_graph_index(spark, idx, combined)
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert meta["n_vectors"] == 40
    assert meta["coarse_refreshed_at_n"] == 40
    assert not os.path.exists(tmp)


def test_streaming_ingest_replay_is_idempotent(spark, tmp_path):
    """ADVICE r5: foreachBatch is at-least-once — a replayed
    micro-batch must NOT re-append its vectors (duplicate vector rows
    previously produced duplicate scored rows, letting one neighbor
    consume two of a query's k result ranks). The sink now anti-joins
    the batch against already-landed ids; re-delivering an ingested
    batch is a provable no-op, and search ranks stay duplicate-free."""
    from vector_indexer_spark.streaming.graph import (
        start_graph_index_ingest,
    )

    base = _clustered_vectors(spark, n_clusters=3, per=20, d=6, seed=61)
    batch = base.filter(F.col("id") % 6 == 0).select(
        (F.col("id") + 700).alias("id"),
        F.transform("values", lambda x: x + F.lit(0.2))
        .cast("array<float>")
        .alias("values"),
    )
    path = str(tmp_path / "g_replay")
    idx = build_graph_index(base, path, k=4, iterations=1, coarse_size=12)
    vecs_dir = str(tmp_path / "vectors")
    src = str(tmp_path / "stream_in")
    base.write.parquet(vecs_dir)
    batch.write.mode("append").parquet(src)

    def run(ckpt):
        stream = spark.readStream.schema(
            "id long, values array<float>"
        ).parquet(src)
        q = start_graph_index_ingest(
            idx, stream, vecs_dir, ckpt,
            beam=8, max_hops=3, entry_fanout=4, batch_iterations=1,
            trigger_available_now=True,
        )
        q.awaitTermination(180)

    run(str(tmp_path / "ckpt1"))
    n_vec = spark.read.parquet(vecs_dir).count()
    n_edges = idx.edges(spark).count()
    n_meta = idx.n_vectors
    # re-deliver the identical batch (fresh checkpoint = the sink sees
    # it again, exactly the at-least-once replay shape)
    run(str(tmp_path / "ckpt2"))
    assert spark.read.parquet(vecs_dir).count() == n_vec
    assert idx.edges(spark).count() == n_edges
    assert idx.n_vectors == n_meta

    # and the search surface: one result row per (query, rank), no
    # neighbor repeated within a query
    q = batch.select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    got = search_graph_index(
        spark, idx, spark.read.parquet(vecs_dir), q,
        k=5, beam=10, max_hops=3, entry_fanout=4,
    ).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert all(len(v) == len(set(v)) for v in per_q.values())


def test_auto_iterations_and_coarse_scale_with_n(spark, tmp_path):
    """The NN-Descent round budget and coarse-layer size must grow
    with corpus size: a fixed iterations=3 converges at 20k but leaves
    the 1M graph at recall 0.23 (measured — see
    suggest_graph_iterations), and a sqrt(n) coarse sample over ~sqrt(n)
    natural clusters leaves ~1/e of them unroutable."""
    from vector_indexer_spark.operators.graph_index import (
        suggest_graph_iterations,
    )

    assert suggest_graph_iterations(1_000) == 3
    assert suggest_graph_iterations(20_000) == 4
    assert suggest_graph_iterations(100_000) == 4
    assert suggest_graph_iterations(250_000) == 5
    assert suggest_graph_iterations(1_000_000) == 5
    assert suggest_graph_iterations(100_000_000) == 7

    base = _region_vectors(spark, 0, 120, 0.0, seed=67)
    idx = build_graph_index(base, str(tmp_path / "g_auto_it"), k=4)
    assert idx.iterations == 3  # auto at n=120
    assert load_graph_index(idx.path).iterations == 3
    assert idx.coarse_size == 64  # max(64, suggest_nlist(120)=10)

    with pytest.raises(ValueError, match="iterations"):
        build_graph_index(
            base, str(tmp_path / "g_bad"), k=4, iterations="forever"
        )


def test_sq_traversal_with_exact_refine(spark, tmp_path):
    """DiskANN-shaped quantized search: beam-walk on SQ8
    reconstructions (1/4 the traversal bytes), exact refine of the
    shortlist. Refined recall must track the full-precision search
    closely and beat the unrefined quantized ranking; refined
    distances must be TRUE distances."""
    from vector_indexer_spark.operators.graph_index import (
        search_graph_index_sq,
    )
    from vector_indexer_spark.operators.knn import knn_exact
    from vector_indexer_spark.operators.sq import sq_encode, sq_train

    vecs = _clustered_vectors(spark, n_clusters=5, per=40, d=8, seed=71)
    idx = build_graph_index(
        vecs, str(tmp_path / "g_sq"), k=5, iterations=2
    )
    model = sq_train(vecs, vec_col="values")
    codes = sq_encode(vecs, model, id_col="id", vec_col="values")

    q = vecs.filter(F.col("id") % 17 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    truth = knn_exact(vecs, q, k=5, method="native").collect()
    want = {}
    true_d = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
        true_d[(r.query_id, r.neighbor_id)] = r.dist2

    kwargs = dict(k=5, beam=12, max_hops=4, entry_fanout=6)
    refined = search_graph_index_sq(
        spark, idx, codes, q, model, vectors=vecs, refine_factor=4,
        **kwargs,
    ).collect()
    quant_only = search_graph_index_sq(
        spark, idx, codes, q, model, **kwargs
    ).collect()
    full = search_graph_index(spark, idx, vecs, q, **kwargs).collect()

    def recall(rows):
        hits = sum(1 for r in rows if r.neighbor_id in want[r.query_id])
        return hits / sum(len(s) for s in want.values())

    r_ref, r_q, r_full = recall(refined), recall(quant_only), recall(full)
    assert r_ref >= r_full - 0.05, (r_ref, r_full)
    assert r_ref >= r_q, (r_ref, r_q)
    assert r_ref >= 0.85, r_ref
    # refined dist2 is the TRUE fold-exact distance, not the
    # quantized approximation
    for r in refined:
        key = (r.query_id, r.neighbor_id)
        if key in true_d:
            assert r.dist2 == true_d[key]

    with pytest.raises(ValueError, match="refine_factor"):
        search_graph_index_sq(
            spark, idx, codes, q, model, refine_factor=0, **kwargs
        )


def test_pq_traversal_trained_codebooks_beat_flat_sq(spark, tmp_path):
    """PQ codebooks are trained on the value distribution, so they keep
    resolution inside natural clusters where flat SQ8's global grid
    goes coarse: on a WIDE-RANGE clustered fixture the PQ traversal's
    recall must beat the SQ traversal's and land near full precision."""
    import numpy as np

    from vector_indexer_spark.operators.graph_index import (
        search_graph_index_pq,
        search_graph_index_sq,
    )
    from vector_indexer_spark.operators.knn import knn_exact
    from vector_indexer_spark.operators.pq import pq_encode, pq_train
    from vector_indexer_spark.operators.sq import sq_encode, sq_train

    rng = np.random.default_rng(83)
    # tight clusters, wide global range — the flat-SQ worst case
    centers = rng.normal(0, 300, (10, 8))
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, (30, 8)) for c in centers]
    )
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(pts)],
        "id long, values array<float>",
    )
    idx = build_graph_index(
        vecs, str(tmp_path / "g_pq"), k=5, iterations=2
    )
    q = vecs.filter(F.col("id") % 23 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    truth = knn_exact(vecs, q, k=5, method="native").collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(rows):
        hits = sum(1 for r in rows if r.neighbor_id in want[r.query_id])
        return hits / sum(len(s) for s in want.values())

    kwargs = dict(
        k=5, beam=12, max_hops=4, entry_fanout=6, refine_factor=4,
        vectors=vecs,
    )
    pqm = pq_train(vecs, m=4, ksub=32, seed=11)
    pq_codes = pq_encode(vecs, pqm)
    r_pq = recall(
        search_graph_index_pq(spark, idx, pq_codes, q, pqm, **kwargs)
        .collect()
    )
    sqm = sq_train(vecs, vec_col="values")
    sq_codes = sq_encode(vecs, sqm)
    r_sq = recall(
        search_graph_index_sq(spark, idx, sq_codes, q, sqm, **kwargs)
        .collect()
    )
    assert r_pq >= 0.9, (r_pq, r_sq)
    assert r_pq > r_sq, (r_pq, r_sq)

    with pytest.raises(ValueError, match="dimension"):
        bad = pq_train(
            vecs.select("id", F.slice("values", 1, 4).alias("values")),
            m=2, ksub=8, seed=1,
        )
        bad_codes = pq_encode(
            vecs.select("id", F.slice("values", 1, 4).alias("values")), bad
        )
        search_graph_index_pq(spark, idx, bad_codes, q, bad, **kwargs)


def test_local_search_matches_distributed_row_for_row(spark, tmp_path):
    """search_graph_index_local is the fits-one-box execution of the
    SAME two-layer recurrence — one broadcast + one mapInPandas job
    instead of a Spark job per hop. Results must match the
    distributed path row-for-row (same tie-breaks, same fold-left
    accumulation), including tombstone exclusion and the
    attribute-filter post-filter."""
    from vector_indexer_spark.operators.graph_index import (
        delete_from_graph_index,
        search_graph_index_local,
    )

    vecs = _clustered_vectors(spark, n_clusters=6, per=40, d=8, seed=41)
    idx = build_graph_index(
        vecs, str(tmp_path / "g_local"), k=5, iterations=2
    )
    q = vecs.filter(F.col("id") % 13 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    kwargs = dict(k=7, beam=10, max_hops=3, entry_fanout=5)

    def rows(df):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.dist2)
            for r in df.collect()
        )

    assert rows(
        search_graph_index_local(spark, idx, vecs, q, **kwargs)
    ) == rows(search_graph_index(spark, idx, vecs, q, **kwargs))

    # tombstones: excluded from results, still traversable
    delete_from_graph_index(
        spark, idx, vecs.filter(F.col("id") % 7 == 0).select("id")
    )
    assert rows(
        search_graph_index_local(spark, idx, vecs, q, **kwargs)
    ) == rows(search_graph_index(spark, idx, vecs, q, **kwargs))

    # attribute filter
    allowed = vecs.filter(F.col("id") % 2 == 0).select("id")
    assert rows(
        search_graph_index_local(
            spark, idx, vecs, q, filter_ids=allowed, **kwargs
        )
    ) == rows(
        search_graph_index(
            spark, idx, vecs, q, filter_ids=allowed, **kwargs
        )
    )

    # cosine metric: both paths normalize through the same Spark
    # expressions, so parity must hold there too
    cidx = build_graph_index(
        vecs, str(tmp_path / "g_local_cos"), k=5, iterations=2,
        metric="cosine",
    )
    assert rows(
        search_graph_index_local(spark, cidx, vecs, q, **kwargs)
    ) == rows(search_graph_index(spark, cidx, vecs, q, **kwargs))


def test_rsq_traversal_residual_codes_beat_flat_sq(spark, tmp_path):
    """Residual-SQ (codes = SQ8 over residuals from the nearest
    coarse-sample anchor) is the DEFAULT quantized graph tier: on the
    wide-range clustered fixture where flat SQ8's global grid goes
    coarse, the rsq traversal must land near full precision and beat
    flat SQ — with no trained codebook, just the coarse sample the
    index already has. Encode is deterministic (assign ties break by
    anchor id), and the model dimension guard must fire."""
    import numpy as np

    from vector_indexer_spark.operators.graph_index import (
        rsq_encode_graph,
        search_graph_index_rsq,
        search_graph_index_sq,
    )
    from vector_indexer_spark.operators.knn import knn_exact
    from vector_indexer_spark.operators.sq import SQModel, sq_encode, sq_train

    rng = np.random.default_rng(97)
    centers = rng.normal(0, 300, (10, 8))
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, (30, 8)) for c in centers]
    )
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(pts)],
        "id long, values array<float>",
    )
    idx = build_graph_index(
        vecs, str(tmp_path / "g_rsq"), k=5, iterations=2
    )
    q = vecs.filter(F.col("id") % 23 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    truth = knn_exact(vecs, q, k=5, method="native").collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(rows):
        hits = sum(1 for r in rows if r.neighbor_id in want[r.query_id])
        return hits / sum(len(s) for s in want.values())

    kwargs = dict(
        k=5, beam=12, max_hops=4, entry_fanout=6, refine_factor=4,
        vectors=vecs,
    )
    codes, anchors, model = rsq_encode_graph(spark, idx, vecs)
    r_rsq = recall(
        search_graph_index_rsq(
            spark, idx, codes, anchors, q, model, **kwargs
        ).collect()
    )
    sqm = sq_train(vecs, vec_col="values")
    r_sq = recall(
        search_graph_index_sq(
            spark, idx, sq_encode(vecs, sqm), q, sqm, **kwargs
        ).collect()
    )
    assert r_rsq >= 0.9, (r_rsq, r_sq)
    assert r_rsq > r_sq, (r_rsq, r_sq)

    # deterministic encode: same input -> identical model and codes
    codes2, _, model2 = rsq_encode_graph(spark, idx, vecs)
    assert model2.dmin == model.dmin and model2.dmax == model.dmax
    a = {r.id: (r.anchor, r.codes) for r in codes.collect()}
    b = {r.id: (r.anchor, r.codes) for r in codes2.collect()}
    assert a == b

    with pytest.raises(ValueError, match="dimension"):
        search_graph_index_rsq(
            spark, idx, codes, anchors, q,
            SQModel(dmin=(0.0,) * 4, dmax=(1.0,) * 4), **kwargs
        )


def test_merge_graph_indexes_stitches_partition_builds(spark, tmp_path):
    """Distributed-build story: two per-partition indexes built in
    parallel merge into one searchable index — src edges reused
    verbatim, coarse routing recomputed over the union, cross-links
    bridging the subgraphs, tombstones carried. Mixed-region recall
    must track a fresh build over the combined corpus."""
    from vector_indexer_spark.operators.graph_index import (
        delete_from_graph_index,
        merge_graph_indexes,
    )
    from vector_indexer_spark.operators.knn import knn_exact

    a = _region_vectors(spark, 0, 120, 0.0, seed=91)
    b = _region_vectors(spark, 5000, 120, 12.0, seed=97)
    combined = a.unionByName(b)
    ia = build_graph_index(a, str(tmp_path / "ga"), k=5, iterations=2)
    ib = build_graph_index(b, str(tmp_path / "gb"), k=5, iterations=2)
    # a tombstone on the src side must survive the merge
    delete_from_graph_index(spark, ib, b.filter(F.col("id") == 5003).select("id"))

    out = merge_graph_indexes(spark, ia, ib, a, b)
    assert out["n_added"] == 119  # src n_vectors post-delete
    assert out["n_vectors"] == 239
    assert out["n_cross_links"] > 0
    assert load_graph_index(ia.path).n_vectors == 239
    coarse = {r.node for r in ia.coarse_nodes(spark).collect()}
    assert any(n >= 5000 for n in coarse) and any(n < 120 for n in coarse)

    q = combined.filter(F.col("id") % 37 == 1).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    truth = knn_exact(combined, q, k=5, method="native").collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(index):
        got = search_graph_index(
            spark, index, combined, q, k=5, beam=12, max_hops=4,
            entry_fanout=6,
        ).collect()
        assert all(r.neighbor_id != 5003 for r in got)  # tombstone holds
        return (
            sum(1 for r in got if r.neighbor_id in want[r.query_id])
            / sum(len(s) for s in want.values())
        )

    fresh = build_graph_index(
        combined.filter(F.col("id") != 5003).unionByName(
            combined.filter(F.col("id") == 5003)
        ),
        str(tmp_path / "g_fresh_m"), k=5, iterations=2,
    )
    delete_from_graph_index(
        spark, fresh, combined.filter(F.col("id") == 5003).select("id")
    )
    r_merged, r_fresh = recall(ia), recall(fresh)
    assert r_merged >= r_fresh - 0.1, (r_merged, r_fresh)
    assert r_merged >= 0.8, r_merged

    # contracts: disjoint ids, matching dimension/metric
    with pytest.raises(ValueError, match="disjoint"):
        merge_graph_indexes(spark, ia, ib, combined, b)
    bad_dim = build_graph_index(
        a.select("id", F.slice("values", 1, 4).alias("values")),
        str(tmp_path / "g_dim"), k=3, iterations=1,
    )
    with pytest.raises(ValueError, match="dimension"):
        merge_graph_indexes(spark, ia, bad_dim, a, a)


def test_opq_traversal_decodes_to_original_space(spark, tmp_path):
    """OPQ adapter: decode lifts reconstructions back through the
    orthogonal rotation, so traversal scores in the corpus' own
    coordinates — recall must land near full precision and at or above
    the plain-PQ adapter at the same code budget."""
    import numpy as np

    from vector_indexer_spark.operators.graph_index import (
        search_graph_index_opq,
        search_graph_index_pq,
    )
    from vector_indexer_spark.operators.knn import knn_exact
    from vector_indexer_spark.operators.opq import opq_encode, opq_train
    from vector_indexer_spark.operators.pq import pq_encode, pq_train

    rng = np.random.default_rng(101)
    centers = rng.normal(0, 300, (10, 8))
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, (30, 8)) for c in centers]
    )
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(pts)],
        "id long, values array<float>",
    )
    idx = build_graph_index(
        vecs, str(tmp_path / "g_opq"), k=5, iterations=2
    )
    q = vecs.filter(F.col("id") % 23 == 0).select(
        F.col("id").alias("query_id"), F.col("values").alias("query")
    )
    truth = knn_exact(vecs, q, k=5, method="native").collect()
    want = {}
    for r in truth:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(rows):
        hits = sum(1 for r in rows if r.neighbor_id in want[r.query_id])
        return hits / sum(len(s) for s in want.values())

    kwargs = dict(
        k=5, beam=12, max_hops=4, entry_fanout=6, refine_factor=4,
        vectors=vecs,
    )
    om = opq_train(vecs, m=4, ksub=32, seed=11)
    ocodes = opq_encode(vecs, om)
    r_opq = recall(
        search_graph_index_opq(spark, idx, ocodes, q, om, **kwargs)
        .collect()
    )
    pm = pq_train(vecs, m=4, ksub=32, seed=11)
    pcodes = pq_encode(vecs, pm)
    r_pq = recall(
        search_graph_index_pq(spark, idx, pcodes, q, pm, **kwargs)
        .collect()
    )
    assert r_opq >= 0.9, (r_opq, r_pq)
    assert r_opq >= r_pq - 0.05, (r_opq, r_pq)


def test_refresh_graph_meta_count_repairs_crash_drift(spark, tmp_path):
    """The streaming crash window (edges+meta land, vector append
    doesn't, replay re-runs the insert) double-counts meta n_vectors;
    refresh_graph_meta_count re-derives it from the canonical table
    minus tombstones — the graph twin of IVF refresh_meta_count."""
    from vector_indexer_spark.operators.graph_index import (
        delete_from_graph_index,
        refresh_graph_meta_count,
    )

    base = _region_vectors(spark, 0, 40, 0.0, seed=103)
    idx = build_graph_index(base, str(tmp_path / "g_drift"), k=4,
                            iterations=1)
    # simulate drift: meta says more than the table holds
    idx.n_vectors = 55
    out = refresh_graph_meta_count(spark, idx, base)
    assert out == {"n_vectors": 40, "drift": -15}
    assert load_graph_index(idx.path).n_vectors == 40
    # tombstones excluded from the live count
    delete_from_graph_index(spark, idx, base.filter(F.col("id") < 5).select("id"))
    out2 = refresh_graph_meta_count(spark, idx, base)
    assert out2["n_vectors"] == 35


def test_streaming_ingest_dedups_within_batch(spark, tmp_path):
    """An at-least-once source can fold a redelivery into ONE
    micro-batch; the landed-ids guard can't see that, so the sink must
    also dedup within the batch."""
    from vector_indexer_spark.streaming.graph import (
        start_graph_index_ingest,
    )

    base = _clustered_vectors(spark, n_clusters=2, per=15, d=4, seed=107)
    batch = base.filter(F.col("id") < 5).select(
        (F.col("id") + 300).alias("id"), "values"
    )
    doubled = batch.unionByName(batch)  # same ids twice in one batch
    idx = build_graph_index(base, str(tmp_path / "g_wb"), k=3,
                            iterations=1, coarse_size=8)
    vecs_dir = str(tmp_path / "vectors")
    src = str(tmp_path / "in")
    base.write.parquet(vecs_dir)
    doubled.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("id long, values array<float>").parquet(src)
    q = start_graph_index_ingest(
        idx, stream, vecs_dir, str(tmp_path / "ck"),
        beam=6, max_hops=2, entry_fanout=3, batch_iterations=1,
        trigger_available_now=True,
    )
    q.awaitTermination(180)
    got = spark.read.parquet(vecs_dir)
    assert got.count() == 35  # 30 base + 5 unique new, not 40
    assert got.select("id").distinct().count() == 35
    assert idx.n_vectors == 35
