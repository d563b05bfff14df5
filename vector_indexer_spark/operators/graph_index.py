"""Persisted two-layer navigable-graph ANN index (HNSW-shaped).

The third ANN family's INDEX surface, mirroring the IVF index's
build/load/search contract (operators/index_build.py — the reference's
save/load shape, src/ivf_index.rs:36-41 / api.rs): a graph index is
one Parquet edge table, one coarse node-id table, and a small JSON
meta sidecar.

- **Layer 0** — a symmetrized NN-Descent k-NN graph over every vector
  (graph.nn_descent_knn_graph: O(n·k²) candidates per round, never the
  O(n²) exact build).
- **Layer 1 (coarse)** — a deterministic hash-spread sample of
  ~``coarse_size`` node IDS (bottom-m under the engine's
  multiplicative hash). Search ranks the sample EXACTLY per query —
  the same cost discipline IVF pays for probe ranking at equal nlist —
  and each query's coarse top-``entry_fanout`` becomes its PER-QUERY
  entry set into layer 0: no manual ``entry_ids`` seeding, no coarse
  graph to maintain, and routing that cannot fragment on
  disconnected-clique corpora (a walked coarse layer can — measured;
  see search_graph_index).

Scale shape: build is one NN-Descent run plus a TakeOrdered sample;
search is one exact √n-sized ranking plus a hop-synchronous layer-0
beam — every hop one node-key shuffle of (beam × degree) candidate
rows per query, the query batch broadcast, state
localCheckpoint-truncated per hop (constant logical-plan size; see
graph.py). Vectors stay wherever the caller keeps them — the index
holds edges only (k·n ids), ~1/16th the bytes of the vector table at
d=128, so the edge table can be co-partitioned with the corpus
(bucket both by the node key) without touching the vector layout.

Everything is deterministic (tri-hash NN-Descent init, (dist2, node)
tie rules, hash-spread sampling) — two builds over the same input are
byte-identical, and the component recurrences are each locked by their
own DuckDB oracles (graph_nn_descent_fixed, graph_ann_beam_fixed).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRAPH_FORMAT_VERSION = 2

_HASH_P = 1_000_003
_HASH_A = 40_503
_HASH_B = 7


def suggest_graph_iterations(n: int) -> int:
    """NN-Descent round budget that grows with corpus size:
    ``max(3, ceil(log10(n)) - 1)`` — 3 rounds to 10k, 4 to 100k, 5 to
    1M, 7 at 100M. The rounds-to-converge requirement grows slowly but
    REALLY with n (each round closes one more neighbor-of-neighbor hop
    from the hash-bucket init toward the true k-NN graph): measured at
    k=8/d=32 clustered data, 3 rounds give search recall@10 0.99 at
    20k but only 0.74 at 250k and 0.23 at 1M; the 4th round lifts 250k
    to 0.94 and the 5th lifts 1M to ~0.9+. A fixed small default is a
    silent scale bug — this is the graph twin of the reference's own
    size-staged heuristics (suggest_nlist, calculate_max_iterations,
    src/utils.rs:9-26)."""
    import math  # noqa: PLC0415

    return max(3, math.ceil(math.log10(max(n, 10))) - 1)


def _spread_hash(col):
    return ((col % F.lit(_HASH_P)) * F.lit(_HASH_A) + F.lit(_HASH_B)) % F.lit(
        _HASH_P
    )


@dataclass
class GraphIndex:
    path: str
    dimension: int
    k: int
    n_vectors: int
    coarse_size: int
    iterations: int
    id_col: str
    vec_col: str
    metric: str = "l2"
    # resolved NN-Descent guards, recorded at build time so inserts
    # reuse the same discipline (None = guard off, e.g. oracle fixtures)
    max_reverse_degree: int | None = None
    max_candidates: int | None = None
    # n_vectors when the coarse routing sample was last (re)computed —
    # build and compact refresh it; appends don't (HNSW's upper layers
    # also gain nodes only on rebuild). Stats derive staleness from it.
    coarse_refreshed_at_n: int | None = None

    def edges(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "edges"))

    def coarse_nodes(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "coarse_nodes"))

    def _meta_dict(self) -> dict:
        return {
            "version": GRAPH_FORMAT_VERSION,
            "kind": "two_layer_graph",
            "dimension": self.dimension,
            "k": self.k,
            "n_vectors": self.n_vectors,
            "coarse_size": self.coarse_size,
            "iterations": self.iterations,
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "metric": self.metric,
            "max_reverse_degree": self.max_reverse_degree,
            "max_candidates": self.max_candidates,
            "coarse_refreshed_at_n": self.coarse_refreshed_at_n,
        }


def _write_meta(path: str, meta: dict) -> None:
    """Atomic meta.json write — delegates to the engine-wide
    tmp+fsync+rename helper (a crash mid-write must never truncate
    meta.json: load_graph_index would raise on json.load and the
    whole index would be unloadable)."""
    from vector_indexer_spark.ioutil import atomic_write_json  # noqa: PLC0415

    atomic_write_json(os.path.join(path, "meta.json"), meta)


def _swap_dir(new_df_writer, live_dir: str, tag: str) -> None:
    """Staged directory swap with crash recovery: write the new table
    to ``<live>__<tag>__staging``, rename live→backup, staging→live,
    drop backup. On entry, a backup left by a CRASHED prior swap is
    recovered (renamed back when the live dir is missing) — the same
    discipline as compact_graph_index's edge swap; without it a crash
    between the two renames left the index with no directory at all
    and the next attempt destroyed the only old copy."""
    import shutil  # noqa: PLC0415

    staging = f"{live_dir}__{tag}__staging"
    backup = f"{live_dir}__{tag}__backup"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(backup):
        if not os.path.exists(live_dir):
            os.rename(backup, live_dir)  # recover a crashed prior swap
        else:
            shutil.rmtree(backup)
    new_df_writer(staging)
    os.rename(live_dir, backup)
    os.rename(staging, live_dir)
    shutil.rmtree(backup)


def _refresh_coarse(
    spark: SparkSession,
    index: GraphIndex,
    live: DataFrame,
    coarse_size: int | None,
    tag: str,
) -> tuple[int, int]:
    """Recompute the hash-spread coarse routing sample over ``live``
    (a ``node`` frame of live ids) and swap it in atomically; returns
    ``(n_live, coarse_size)``. Shared by compaction and merge — the
    two maintenance ops that must restore routing coverage."""
    n_live = live.count()
    if coarse_size is None:
        # same staging as the build default (suggest_nlist-shaped)
        from vector_indexer_spark.config import suggest_nlist  # noqa: PLC0415

        coarse_size = max(64, suggest_nlist(n_live))
    coarse_size = min(coarse_size, n_live)
    coarse = (
        live.select("node", _spread_hash(F.col("node")).alias("__h"))
        .orderBy("__h", "node")
        .limit(coarse_size)
        .select("node")
    )
    _swap_dir(
        lambda stg: coarse.write.mode("overwrite").parquet(stg),
        os.path.join(index.path, "coarse_nodes"),
        tag,
    )
    return n_live, coarse_size


def build_graph_index(
    vectors: DataFrame,
    path: str,
    *,
    k: int = 8,
    iterations: int | str = "auto",
    coarse_size: int | None = None,
    id_col: str = "id",
    vec_col: str = "values",
    method: str = "arrow",
    metric: str = "l2",
    max_reverse_degree: int | None | str = "auto",
    max_candidates: int | None = None,
) -> GraphIndex:
    """Build and persist the two-layer graph index.

    ``metric='cosine'`` L2-normalizes the vectors before every build
    and search step (on unit vectors dist2 = 2 - 2·cos, monotone in
    cosine, so top-k by dist2 IS cosine top-k); ``dist2`` outputs are
    then on the normalized vectors. The raw vector table is passed
    unchanged everywhere — normalization is internal and idempotent
    per call, never persisted.

    ``iterations`` defaults to ``"auto"`` = :func:`suggest_graph_
    iterations` — the NN-Descent round budget must GROW with n (3
    rounds converge at 20k but leave the 1M graph at recall 0.23;
    see the heuristic's docstring for the measured curve). Explicit
    ints behave exactly as before (the oracle fixtures pin them).

    ``coarse_size`` defaults to ``max(64, suggest_nlist(n))`` — the
    same size staging the IVF tier uses for nlist (√n up to 4√n at
    n ≥ 100k), because search ranks the coarse sample exactly per
    query, the identical cost IVF pays for probe ranking. The coarse
    sample is the
    bottom-``coarse_size`` nodes under the multiplicative hash: a
    deterministic spread sample, stable under appends that keep ids
    (a node enters/leaves the sample only if the id set changes).
    The sample is a plain node-id table — search ranks it EXACTLY per
    query (see :func:`search_graph_index`), so the index stores no
    coarse graph at all.

    ``max_reverse_degree`` / ``max_candidates`` are NN-Descent's hub
    guards (graph.nn_descent_knn_graph): ``"auto"`` resolves to
    ``4·k`` — without it a medoid/boilerplate hub with in-degree D
    emits D² candidate rows from one join key in the descent's
    middle-node self-join, exactly the skew a deduped-web corpus
    produces. The RESOLVED values are recorded in meta.json so
    :func:`add_to_graph_index` applies the same discipline to batch-
    internal graphs; pass ``None`` to disable (oracle fixtures do).
    """
    from vector_indexer_spark.operators.graph import (  # noqa: PLC0415
        nn_descent_knn_graph,
    )

    if k < 1:
        raise ValueError("k must be >= 1")
    if metric not in ("l2", "cosine"):
        raise ValueError("metric must be 'l2' or 'cosine'")
    if max_reverse_degree == "auto":
        max_reverse_degree = 4 * k
    elif isinstance(max_reverse_degree, str):
        raise ValueError(
            "max_reverse_degree must be an int, None, or 'auto'"
        )
    if isinstance(iterations, str) and iterations != "auto":
        # validate BEFORE the first()/count() jobs below — a typo'd
        # argument must not cost two full corpus scans to surface
        raise ValueError("iterations must be an int or 'auto'")
    if metric == "cosine":
        from vector_indexer_spark.operators.similarity import (  # noqa: PLC0415
            normalize_vectors,
        )

        vectors = normalize_vectors(vectors, vec_col=vec_col)
    v = vectors.select(
        F.col(id_col).alias("node"), F.col(vec_col).alias("vec")
    )
    first = v.select(F.size("vec").alias("d")).first()
    if first is None:
        raise ValueError("cannot build a graph index over zero vectors")
    dimension = int(first["d"])
    n = v.count()
    if iterations == "auto":
        iterations = suggest_graph_iterations(n)
    if coarse_size is None:
        # size the routing layer like the IVF tier sizes nlist
        # (config.suggest_nlist: sqrt(n) staged up to 4*sqrt(n) at
        # n >= 100k): search ranks the coarse sample EXACTLY per
        # query, so this is the identical cost discipline IVF pays
        # for probe ranking at equal n — and the larger sample keeps
        # every corpus cluster covered on many-clique corpora (a
        # sqrt(n) sample over ~sqrt(n) natural clusters leaves ~1/e
        # of them unroutable; measured +0.04 recall@10 at 250k)
        from vector_indexer_spark.config import suggest_nlist  # noqa: PLC0415

        coarse_size = max(64, suggest_nlist(n))
    coarse_size = min(coarse_size, n)

    edges = nn_descent_knn_graph(
        vectors, k, iterations=iterations, symmetric=True,
        id_col=id_col, vec_col=vec_col, method=method, early_stop=False,
        max_reverse_degree=max_reverse_degree,
        max_candidates=max_candidates,
    )

    coarse = (
        v.select("node", _spread_hash(F.col("node")).alias("__h"))
        .orderBy("__h", "node")
        .limit(coarse_size)
        .select("node")
    )
    edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    coarse.write.mode("overwrite").parquet(
        os.path.join(path, "coarse_nodes")
    )
    index = GraphIndex(
        path=path,
        dimension=dimension,
        k=k,
        n_vectors=n,
        coarse_size=coarse_size,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        metric=metric,
        max_reverse_degree=max_reverse_degree,
        max_candidates=max_candidates,
        coarse_refreshed_at_n=n,
    )
    _write_meta(path, index._meta_dict())
    return index


def load_graph_index(path: str) -> GraphIndex:
    """Reopen a persisted graph index (S6-shaped error contract:
    missing path / wrong version raise with actionable messages)."""
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"no graph index at {path!r} (meta.json missing)")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != GRAPH_FORMAT_VERSION:
        raise ValueError(
            f"unsupported graph index version {meta.get('version')!r}"
        )
    mrd = meta.get("max_reverse_degree")
    mc = meta.get("max_candidates")
    crn = meta.get("coarse_refreshed_at_n")
    return GraphIndex(
        path=path,
        dimension=int(meta["dimension"]),
        k=int(meta["k"]),
        n_vectors=int(meta["n_vectors"]),
        coarse_size=int(meta["coarse_size"]),
        iterations=int(meta["iterations"]),
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
        metric=meta.get("metric", "l2"),
        max_reverse_degree=None if mrd is None else int(mrd),
        max_candidates=None if mc is None else int(mc),
        coarse_refreshed_at_n=None if crn is None else int(crn),
    )


def search_graph_index(
    spark: SparkSession,
    index: GraphIndex,
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    coarse_method: str = "native",
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Two-layer batched ANN search: ``(query_id, rank, neighbor_id,
    dist2)`` top-k per query, no entry seeding required.

    ``filter_ids`` (a one-column frame of allowed ids) is the
    attribute-filtered-ANN surface — the graph twin of
    ``search_index``'s ``filter_expr``: results are restricted to the
    allowed set while TRAVERSAL stays unrestricted (walking only the
    filtered subgraph would fragment it; raise ``k``/``beam`` for very
    selective filters). Materialize the predicate to a key list
    upstream (pushed-down scan of the attribute table).

    The coarse layer is ranked EXACTLY per query (one brute-force pass
    over the √n-sized sample — the identical cost discipline IVF pays
    for probe ranking at the same nlist): each query's coarse
    top-``entry_fanout`` seeds its PRIVATE layer-0 beam via
    ``entry_df``. Exact routing is the robustness lesson a coarse BEAM
    search failed: on disconnected-clique corpora (many near-identical
    groups) the coarse graph fragments like the base graph, and a
    walked layer 1 strands every query whose group its few global
    entries miss — measured recall 0.5 on a 12-ray fixture, 0.92 with
    exact routing (only genuinely-uncovered groups remain dark). The
    layer-0 walk then starts next to the answer — ``max_hops`` stays
    small and per-hop candidate counts stay (beam × degree)-bounded
    regardless of corpus size. ``coarse_method='arrow'`` routes the
    coarse ranking through the GEMM kernel for very large samples
    (last-ulp tie caveat, kernels.pairwise_dist2).
    """
    from vector_indexer_spark.operators.graph import (  # noqa: PLC0415
        graph_ann_search,
    )
    from vector_indexer_spark.operators.knn import knn_exact  # noqa: PLC0415

    if k < 1:
        raise ValueError("k must be >= 1")
    if index.metric == "cosine":
        from vector_indexer_spark.operators.similarity import (  # noqa: PLC0415
            normalize_vectors,
        )

        vectors = normalize_vectors(vectors, vec_col=index.vec_col)
        queries = normalize_vectors(queries, vec_col="query")
    v = vectors.select(
        F.col(index.id_col).alias("node"), F.col(index.vec_col).alias("vec")
    )
    coarse_vec = v.join(
        F.broadcast(index.coarse_nodes(spark)), "node"
    ).select(
        F.col("node").alias(index.id_col), F.col("vec").alias(index.vec_col)
    )
    coarse_hits = knn_exact(
        coarse_vec,
        queries,
        k=entry_fanout,
        id_col=index.id_col,
        vec_col=index.vec_col,
        method=coarse_method,
    )
    entry_df = coarse_hits.select(
        "query_id", F.col("neighbor_id").alias("node")
    )
    include_df = None
    if filter_ids is not None:
        col0 = (
            index.id_col
            if index.id_col in filter_ids.columns
            else filter_ids.columns[0]
        )
        include_df = filter_ids.select(F.col(col0).alias("node"))
    return graph_ann_search(
        vectors,
        index.edges(spark),
        queries,
        k=k,
        beam=beam,
        max_hops=max_hops,
        entry_df=entry_df,
        exclude_ids=_tombstones(spark, index),
        include_ids=include_df,
        id_col=index.id_col,
        vec_col=index.vec_col,
    )


def search_graph_index_sq(
    spark: SparkSession,
    index: GraphIndex,
    codes: DataFrame,
    queries: DataFrame,
    model,
    *,
    k: int = 10,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    refine_factor: int = 4,
    vectors: DataFrame | None = None,
    code_col: str = "codes",
    coarse_method: str = "native",
    filter_ids: DataFrame | None = None,
    materialize_recon: bool = True,
) -> DataFrame:
    """Quantized graph traversal with exact refine — the DiskANN shape
    (Subramanya et al., NeurIPS 2019: walk the graph on compressed
    vectors held in memory, re-rank the shortlist against full
    precision): the two-layer beam search runs entirely on SQ8
    RECONSTRUCTIONS (``model`` is an :class:`~...sq.SQModel`;
    ``codes`` is ``(id_col, code_col ARRAY<INT>)`` from ``sq_encode``
    — 1/4 the vector bytes at float32, so a 100 TB corpus' traversal
    working set drops to ~25 TB), producing a per-query shortlist of
    ``refine_factor·k`` candidates; when ``vectors`` (the raw table)
    is given, the shortlist is exact-rescored by ``refine_topk`` — a
    broadcast of the tiny candidate set against the big table, which
    never shuffles — and the top-``k`` by TRUE distance returned.
    With ``vectors=None`` the quantized top-``k`` is returned as-is
    (``dist2`` is then the approximate distance).

    Composition, not new machinery: reconstruction is the SQ tier's
    affine expression (scan-local Catalyst, no UDF), traversal is
    :func:`search_graph_index` unchanged (tombstones and
    ``filter_ids`` apply to the shortlist, hence to the refined
    result), refine is the shared Faiss-``RFlat``-shaped stage every
    compressed tier here uses. Deterministic end to end, so the whole
    chain is locked by one SQL replay (graph_index_sq_search_fixed).

    Fidelity caveat (measured, BASELINE round-6): recall tracks the
    QUANTIZER, not the traversal. Flat SQ8 spends its 8 bits on the
    corpus' GLOBAL per-dim range; when natural clusters are tight
    relative to that range the quantization noise floor swamps
    within-cluster distance differences — brute-force SQ8 itself drops
    to ~0.3 recall@10 on the wide-range synthetic, and this operator
    then BEATS its own quantizer's ceiling (~0.66: the shortlist +
    exact refine recover ordering brute quantized scoring cannot).
    Raise ``refine_factor`` toward the expected cluster size when the
    quantizer is coarse, or — the DEFAULT recommendation — use
    :func:`search_graph_index_rsq`, which encodes residuals after
    nearest-coarse-anchor subtraction (range = local spread, the same
    residual trick that holds ``search_ivfsq_index`` at 0.98+ on data
    where flat SQ8 drops to ~0.3). Flat SQ8 remains the opt-in for
    corpora without cluster structure, where the two coincide.

    ``materialize_recon`` (here and on the rsq/pq/opq adapters) is
    forwarded to the quantizer-generic core: the default True
    localCheckpoints the decoded corpus once so the per-hop joins
    don't re-execute the decode plan (measured 14.3 s -> 4.9 s at 1M),
    but it materializes n*d doubles — pass False on corpora whose
    DECODED matrix exceeds cluster memory to keep the codes-sized
    working set that motivates compressed traversal.
    """
    from vector_indexer_spark.operators.sq import (  # noqa: PLC0415
        reconstruct_expr,
    )

    if model.dimension != index.dimension:
        raise ValueError(
            f"SQ dimension {model.dimension} != index dimension "
            f"{index.dimension}"
        )
    # sq_encode normalizes its id column to "id"; accept either that
    # or the index's own id column name
    code_id = index.id_col if index.id_col in codes.columns else "id"
    recon = codes.select(
        F.col(code_id).alias(index.id_col),
        reconstruct_expr(code_col, model).alias(index.vec_col),
    )
    return search_graph_index_compressed(
        spark, index, recon, queries,
        k=k, beam=beam, max_hops=max_hops, entry_fanout=entry_fanout,
        refine_factor=refine_factor, vectors=vectors,
        coarse_method=coarse_method, filter_ids=filter_ids,
        materialize_recon=materialize_recon,
    )


def rsq_encode_graph(
    spark: SparkSession,
    index: GraphIndex,
    vectors: DataFrame,
    *,
    code_col: str = "codes",
    assign_method: str = "auto",
):
    """Residual SQ8 encode anchored at the index's COARSE ROUTING
    SAMPLE — the quantized tier that should actually be used with the
    graph index (flat ``sq_encode`` is the opt-in fallback).

    Why residual: flat SQ8 spends its 8 bits on the corpus' GLOBAL
    per-dim range, so on clustered data the quantization noise floor
    swamps within-cluster distance differences (measured recall 0.41
    at the 20k bench point — BASELINE round-6 "fidelity honesty").
    Subtracting each vector's nearest coarse-sample node first shrinks
    the coded range to the local spread around that anchor — the same
    residual trick that takes IVF-SQ to 0.99 — while reusing a
    structure the graph index already has: the √n hash-spread coarse
    sample doubles as the anchor codebook, no extra k-means.

    One pass: nearest-anchor assign (broadcast exact argmin over the
    √n sample — the identical cost discipline coarse routing pays per
    query), residual = v − anchor in doubles, per-dim min/max train
    over ALL residuals, affine encode. Returns
    ``(codes_df, anchors_df, model)`` where ``codes_df`` is
    ``(id_col, anchor, code_col ARRAY<INT>)``, ``anchors_df`` is the
    broadcastable ``(anchor, anchor_vec)`` side table (√n rows — at
    1B vectors and d=128 a few MB), and ``model`` is the residual
    :class:`~vector_indexer_spark.operators.sq.SQModel`. Fully
    deterministic (assign ties break by anchor id), so the whole
    encode+search chain is SQL-replayable
    (graph_index_rsq_search_fixed).

    ``assign_method``: ``"native"`` scores the anchor assignment with
    the fold-exact Catalyst expression (bit-parity with the oracle —
    but it is a queries x anchors cross score, O(n·m·d) JVM-side:
    right for fixture scales, hopeless at 1M x 4000). ``"arrow"``
    routes through :func:`~...kmeans.assign_clusters` (broadcast
    anchor matrix, GEMM argmin per Arrow batch, hierarchical shortlist
    above 100 anchors — the engine's J1/J2 assignment, the 100-TB
    shape). GEMM carries the documented last-ulp tie caveat: an
    exact-duplicate-distance tie may assign to a different anchor than
    the fold order would — residuals stay valid either way, recall is
    unaffected. ``"auto"`` (default) picks native below 64 anchors
    (every oracle fixture), arrow above.
    """
    from vector_indexer_spark.operators.knn import knn_exact  # noqa: PLC0415
    from vector_indexer_spark.operators.sq import (  # noqa: PLC0415
        encode_expr,
        sq_train,
    )

    idc, vcc = index.id_col, index.vec_col
    anchors = vectors.join(
        F.broadcast(index.coarse_nodes(spark).withColumnRenamed("node", idc)),
        idc,
    ).select(F.col(idc).alias("anchor"), F.col(vcc).alias("anchor_vec"))
    if assign_method == "auto":
        n_anchors = anchors.count()
        assign_method = "native" if n_anchors <= 64 else "arrow"
    if assign_method == "arrow":
        import numpy as np  # noqa: PLC0415

        from vector_indexer_spark.operators.kmeans import (  # noqa: PLC0415
            assign_clusters,
        )

        rows = anchors.orderBy("anchor").collect()
        aid = np.asarray([r["anchor"] for r in rows], dtype=np.int64)
        amat = np.asarray(
            [np.asarray(r["anchor_vec"], dtype=np.float64) for r in rows]
        )
        assigned = assign_clusters(
            vectors.select(idc, vcc), amat, vec_col=vcc, out_col="__a"
        )
        aid_df = spark.createDataFrame(
            [(int(i), int(a)) for i, a in enumerate(aid)],
            "__a long, anchor long",
        )
        assign = assigned.join(F.broadcast(aid_df), "__a").select(
            idc, "anchor"
        )
    elif assign_method == "native":
        assign = knn_exact(
            anchors.select(
                F.col("anchor").alias(idc), F.col("anchor_vec").alias(vcc)
            ),
            vectors.select(
                F.col(idc).alias("query_id"), F.col(vcc).alias("query")
            ),
            k=1,
            id_col=idc,
            vec_col=vcc,
            method="native",
        ).select(
            F.col("query_id").alias(idc), F.col("neighbor_id").alias("anchor")
        )
    else:
        raise ValueError(
            "assign_method must be 'auto', 'native', or 'arrow'"
        )
    res = (
        vectors.join(assign, idc)
        .join(F.broadcast(anchors), "anchor")
        .select(
            idc,
            "anchor",
            F.zip_with(
                vcc,
                "anchor_vec",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("res"),
        )
    )
    model = sq_train(res, vec_col="res")
    codes = res.select(
        idc, "anchor", encode_expr("res", model).alias(code_col)
    )
    return codes, anchors, model


def search_graph_index_rsq(
    spark: SparkSession,
    index: GraphIndex,
    codes: DataFrame,
    anchors: DataFrame,
    queries: DataFrame,
    model,
    *,
    k: int = 10,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    refine_factor: int = 4,
    vectors: DataFrame | None = None,
    code_col: str = "codes",
    coarse_method: str = "native",
    filter_ids: DataFrame | None = None,
    materialize_recon: bool = True,
) -> DataFrame:
    """Residual-SQ8 quantized traversal — the DEFAULT quantized graph
    tier (see :func:`rsq_encode_graph` for why it replaces flat SQ8).
    Reconstruction is ``anchor_vec + (dmin + code·scale)`` — one
    broadcast join against the √n anchor table plus the SQ tier's
    scan-local affine expression, no UDF — then the quantizer-generic
    compressed core (traversal on reconstructions, shortlist, exact
    refine when ``vectors`` is given) runs unchanged."""
    from vector_indexer_spark.operators.sq import (  # noqa: PLC0415
        reconstruct_expr,
    )

    if model.dimension != index.dimension:
        raise ValueError(
            f"residual-SQ dimension {model.dimension} != index dimension "
            f"{index.dimension}"
        )
    code_id = index.id_col if index.id_col in codes.columns else "id"
    recon = codes.join(F.broadcast(anchors), "anchor").select(
        F.col(code_id).alias(index.id_col),
        F.zip_with(
            "anchor_vec",
            reconstruct_expr(code_col, model),
            lambda a, r: a.cast("double") + r,
        ).alias(index.vec_col),
    )
    return search_graph_index_compressed(
        spark, index, recon, queries,
        k=k, beam=beam, max_hops=max_hops, entry_fanout=entry_fanout,
        refine_factor=refine_factor, vectors=vectors,
        coarse_method=coarse_method, filter_ids=filter_ids,
        materialize_recon=materialize_recon,
    )


def search_graph_index_pq(
    spark: SparkSession,
    index: GraphIndex,
    codes: DataFrame,
    queries: DataFrame,
    model,
    *,
    k: int = 10,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    refine_factor: int = 4,
    vectors: DataFrame | None = None,
    code_col: str = "codes",
    coarse_method: str = "native",
    filter_ids: DataFrame | None = None,
    materialize_recon: bool = True,
) -> DataFrame:
    """PQ-codes graph traversal with exact refine — the same DiskANN
    shape as :func:`search_graph_index_sq` with the quantizer DiskANN
    itself uses: ``model`` is a trained :class:`~...pq.PQModel`,
    ``codes`` is ``(id, codes ARRAY<INT>)`` from ``pq_encode``
    (m bytes per vector — at m=8, d=128 that is 1/64 the raw float32
    bytes). PQ's per-subspace codebooks are TRAINED on the value
    distribution, so they keep resolution inside natural clusters
    where flat SQ8's global affine grid goes coarse (the fidelity
    caveat on the SQ variant) — the trained twin of that oracle-locked
    path (k-means codebooks are RNG-trained, so this one is checked by
    pytest recall bounds rather than a SQL replay, the engine-wide
    trained/fixed split).

    Decode is ``mapInPandas`` with the codebooks broadcast (a
    codebook-literal Catalyst expression would put m·ksub·dsub doubles
    in the plan); everything downstream is
    :func:`search_graph_index_compressed`.
    """
    if model.dimension != index.dimension:
        raise ValueError(
            f"PQ dimension {model.dimension} != index dimension "
            f"{index.dimension}"
        )
    recon = _codebook_decode_df(
        spark, index, codes, code_col, model.codebooks
    )
    return search_graph_index_compressed(
        spark, index, recon, queries,
        k=k, beam=beam, max_hops=max_hops, entry_fanout=entry_fanout,
        refine_factor=refine_factor, vectors=vectors,
        coarse_method=coarse_method, filter_ids=filter_ids,
        materialize_recon=materialize_recon,
    )


def _codebook_decode_df(
    spark: SparkSession,
    index: GraphIndex,
    codes: DataFrame,
    code_col: str,
    codebooks,
    rotation=None,
    mean=None,
) -> DataFrame:
    """Shared PQ/OPQ decoder: ``(id, codes)`` → ``(id_col, vec_col)``
    reconstructions via mapInPandas with the codebooks (and optional
    inverse rotation) broadcast — a codebook-literal Catalyst
    expression would put m·ksub·dsub doubles in the plan."""
    from vector_indexer_spark.functions.kernels import (  # noqa: PLC0415
        stack_arrays,
    )

    # encoders normalize their id column to "id"; accept either that
    # or the index's own id column name
    code_id = index.id_col if index.id_col in codes.columns else "id"
    bstate = spark.sparkContext.broadcast((codebooks, rotation, mean))
    idc, vcc = index.id_col, index.vec_col

    def _decode(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        cb, rot, mu = bstate.value
        m, _, dsub = cb.shape
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = stack_arrays(pdf[code_col]).astype(np.int64)
            out = np.empty((cmat.shape[0], m * dsub), dtype=np.float64)
            for j in range(m):
                out[:, j * dsub : (j + 1) * dsub] = cb[j][cmat[:, j]]
            if rot is not None:
                # exact inverse of (x - mean) @ rot.T (orthogonal R)
                out = out @ rot + mu
            yield pd.DataFrame(
                {idc: pdf[code_id].to_numpy(), vcc: list(out)}
            )

    return codes.select(code_id, code_col).mapInPandas(
        _decode, f"{idc} long, {vcc} array<double>"
    )


def search_graph_index_opq(
    spark: SparkSession,
    index: GraphIndex,
    codes: DataFrame,
    queries: DataFrame,
    model,
    *,
    k: int = 10,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    refine_factor: int = 4,
    vectors: DataFrame | None = None,
    code_col: str = "codes",
    coarse_method: str = "native",
    filter_ids: DataFrame | None = None,
    materialize_recon: bool = True,
) -> DataFrame:
    """OPQ-codes graph traversal with exact refine: ``model`` is an
    :class:`~...opq.OPQModel` (learned orthogonal rotation + PQ in the
    rotated space); decode lifts each reconstruction BACK to the
    original space (``pq_recon @ R + μ`` — exact inverse because R is
    orthogonal), so queries stay raw and the traversal scores in the
    corpus' own coordinates. The rotation's balanced per-subspace
    variance is what OPQ buys over plain PQ at the same code budget;
    everything downstream is :func:`search_graph_index_compressed`.
    """
    if model.dimension != index.dimension:
        raise ValueError(
            f"OPQ dimension {model.dimension} != index dimension "
            f"{index.dimension}"
        )
    recon = _codebook_decode_df(
        spark, index, codes, code_col, model.pq.codebooks,
        rotation=model.rotation, mean=model.mean,
    )
    return search_graph_index_compressed(
        spark, index, recon, queries,
        k=k, beam=beam, max_hops=max_hops, entry_fanout=entry_fanout,
        refine_factor=refine_factor, vectors=vectors,
        coarse_method=coarse_method, filter_ids=filter_ids,
        materialize_recon=materialize_recon,
    )


def search_graph_index_local(
    spark: SparkSession,
    index: GraphIndex,
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Partition-LOCAL two-layer beam search — the fits-one-box regime
    of :func:`search_graph_index`, bit-identical results.

    The distributed path pays one Spark job per hop (beam window +
    edge join + vector join), so at memory-resident scales the fixed
    per-job latency dominates: at the committed 1M x 32 bench point,
    64 queries cost 16-25 s while the exact GEMM scan over the same
    corpus takes 0.8 s — the graph index had no measured winning
    regime (VERDICT r6). This operator collapses the walk into ONE
    job: the edge table (CSR) + vector matrix + coarse sample
    broadcast once (~edges*16B + n*d*4B — 1M x 32 is ~380 MB), then
    ``mapInPandas`` over query partitions runs the whole
    hop-synchronous recurrence in NumPy per query. Per-query work is
    O(hops * beam * degree * d) — thousands of flops against the exact
    scan's n*d — so compute-wise the graph wins everywhere; this
    operator removes the per-hop job overhead that hid that win.

    Same recurrence, same tie-breaks ((dist2, node) everywhere), same
    fold-left double accumulation (`kernels.rowwise_dist2_foldexact`
    order), tombstones excluded from results but traversable,
    ``filter_ids`` post-filter before top-k — so results match
    :func:`search_graph_index` row-for-row (pytest-locked) and the
    same DuckDB replay covers both. Use the distributed path when
    corpus + edges exceed executor memory; this one when they fit
    (every executor holds the full index — the HNSW deployment shape —
    and queries scale out embarrassingly).

    ``filter_ids`` (and tombstones) are collected to the driver and
    ride the broadcast — they must be driver-collectable in this
    regime (guarded: >max(10M, 4n) rows raises pre-collect). That is
    never the binding constraint here, since the local regime already
    requires the full vector matrix on the driver; a corpus-scale
    allow-set belongs on :func:`search_graph_index`, whose filter is a
    broadcast semi-join.
    """
    import numpy as np  # noqa: PLC0415

    if k < 1 or beam < 1:
        raise ValueError("k and beam must be >= 1")
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    idc, vcc = index.id_col, index.vec_col
    if index.metric == "cosine":
        # normalize in SPARK expressions — the identical arithmetic the
        # distributed path applies, so bit-parity holds for cosine too
        from vector_indexer_spark.operators.similarity import (  # noqa: PLC0415
            normalize_vectors,
        )

        vectors = normalize_vectors(vectors, vec_col=vcc)
        queries = normalize_vectors(queries, vec_col="query")

    # Arrow transfer + vectorized flatten: toPandas would hand back a
    # Python object column (one numpy allocation per row — ~60 s at
    # 1M x 32, which single-handedly erased the local path's win);
    # the Arrow list array flattens to one contiguous buffer. float32
    # storage is bit-exact: the fold kernel upcasts per column, the
    # same float->double widening dist2_expr applies.
    v_tbl = vectors.select(
        F.col(idc).alias("node"), F.col(vcc).alias("vec")
    ).toArrow()
    ids = v_tbl["node"].to_numpy().astype(np.int64, copy=False)
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order]
    flat = v_tbl["vec"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    # keep the SOURCE width: float32 corpora stay float32 (halves the
    # broadcast; the fold upcasts per column exactly like dist2_expr),
    # double corpora must stay double — narrowing them would change
    # distances vs the distributed path.
    mat = flat.reshape(len(ids), index.dimension)[order]

    e_tbl = index.edges(spark).select("src", "dst").toArrow()
    src = e_tbl["src"].to_numpy().astype(np.int64, copy=False)
    dst = e_tbl["dst"].to_numpy().astype(np.int64, copy=False)
    # candidates absent from the vector table are dropped at scoring
    # time in the distributed path — dropping their edges is equivalent
    si = np.searchsorted(ids_sorted, src)
    di = np.searchsorted(ids_sorted, dst)
    ok = (
        (si < len(ids_sorted))
        & (di < len(ids_sorted))
        & (ids_sorted[np.minimum(si, len(ids_sorted) - 1)] == src)
        & (ids_sorted[np.minimum(di, len(ids_sorted) - 1)] == dst)
    )
    si, di = si[ok], di[ok]
    eo = np.lexsort((di, si))
    si, di = si[eo], di[eo]
    indptr = np.searchsorted(si, np.arange(len(ids_sorted) + 1))

    coarse_ids = np.asarray(
        [
            r["node"]
            for r in index.coarse_nodes(spark).collect()
        ],
        dtype=np.int64,
    )
    ci = np.searchsorted(ids_sorted, coarse_ids)
    cok = (ci < len(ids_sorted)) & (
        ids_sorted[np.minimum(ci, len(ids_sorted) - 1)] == coarse_ids
    )
    ci = np.unique(ci[cok])

    dead = _tombstones(spark, index)
    dead_ids = (
        np.asarray([r["node"] for r in dead.collect()], dtype=np.int64)
        if dead is not None
        else np.empty(0, dtype=np.int64)
    )
    allow_ids = None
    if filter_ids is not None:
        # LOCAL-regime constraint: the allow-set rides the broadcast, so
        # it must be driver-collectable (the distributed path's broadcast
        # semi-join has no such limit). The index vectors are already
        # driver-resident here, so any set up to corpus size is fine —
        # the guard exists to fail loudly, pre-collect, on a mistaken
        # corpus-scale frame instead of OOMing the driver.
        col0 = (
            idc if idc in filter_ids.columns else filter_ids.columns[0]
        )
        n_filter = filter_ids.count()
        if n_filter > max(10_000_000, 4 * len(ids_sorted)):
            raise ValueError(
                f"filter_ids has {n_filter} rows — too large to collect "
                "to the driver for the local regime; use "
                "search_graph_index (distributed), whose filter is a "
                "broadcast semi-join"
            )
        allow_ids = np.unique(
            np.asarray(
                [r[col0] for r in filter_ids.select(col0).collect()],
                dtype=np.int64,
            )
        )

    bc = spark.sparkContext.broadcast(
        {
            "ids": ids_sorted,
            "mat": mat,
            "indptr": indptr,
            "nbrs": di,
            "coarse": ci,
            "dead": np.sort(dead_ids),
            "allow": allow_ids,
        }
    )
    fanout, hops, bw, topk = entry_fanout, max_hops, beam, k

    def run(batches):
        import pandas as pd  # noqa: PLC0415

        g = bc.value
        gids, gmat = g["ids"], g["mat"]
        gptr, gnbr = g["indptr"], g["nbrs"]
        gco, gdead, gallow = g["coarse"], g["dead"], g["allow"]

        def d2_fold(rows, qv):
            # column-by-column fold — the dist2_expr IEEE sequence.
            # The explicit float64 upcast matters: under NumPy's NEP 50
            # promotion a float32 column minus a float64 SCALAR stays
            # float32, which would quantize the subtraction and break
            # bit-parity with the distributed path's widen-then-
            # subtract.
            acc = np.zeros(rows.shape[0])
            for j in range(rows.shape[1]):
                d = rows[:, j].astype(np.float64) - qv[j]
                acc += d * d
            return acc

        def best(pos, dist, m):
            o = np.lexsort((pos, dist))[:m]
            return pos[o], dist[o]

        for pdf in batches:
            out_q, out_r, out_n, out_d = [], [], [], []
            for qid, qvec in zip(pdf["query_id"], pdf["query"]):
                qv = np.asarray(qvec, dtype=np.float64)
                # coarse routing: exact rank of the sample, top-fanout
                seed_pos, seed_d = best(
                    gco, d2_fold(gmat[gco], qv), fanout
                )
                vis_pos, vis_d = seed_pos, seed_d
                for _ in range(hops):
                    bpos, _bd = best(vis_pos, vis_d, bw)
                    cand = np.unique(
                        np.concatenate(
                            [gnbr[gptr[p]:gptr[p + 1]] for p in bpos]
                        )
                    ) if len(bpos) else np.empty(0, dtype=np.int64)
                    cand = cand[~np.isin(cand, vis_pos)]
                    if len(cand) == 0:
                        break
                    cd = d2_fold(gmat[cand], qv)
                    vis_pos = np.concatenate([vis_pos, cand])
                    vis_d = np.concatenate([vis_d, cd])
                keep = ~np.isin(gids[vis_pos], gdead)
                if gallow is not None:
                    keep &= np.isin(gids[vis_pos], gallow)
                fpos, fd = best(vis_pos[keep], vis_d[keep], topk)
                n = len(fpos)
                out_q.extend([qid] * n)
                out_r.extend(range(1, n + 1))
                out_n.extend(gids[fpos])
                out_d.extend(fd)
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "rank": pd.Series(out_r, dtype="int32"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "dist2": pd.Series(out_d, dtype="float64"),
                }
            )

    q = queries.select("query_id", "query").repartition(
        spark.sparkContext.defaultParallelism
    )
    return q.mapInPandas(
        run, "query_id long, rank int, neighbor_id long, dist2 double"
    )


def search_graph_index_compressed(
    spark: SparkSession,
    index: GraphIndex,
    recon_vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    refine_factor: int = 4,
    vectors: DataFrame | None = None,
    coarse_method: str = "native",
    filter_ids: DataFrame | None = None,
    materialize_recon: bool = True,
) -> DataFrame:
    """Quantizer-generic core of the compressed traversal:
    ``recon_vectors`` is ANY approximate reconstruction of the corpus
    (``(id_col, vec_col)`` — SQ affine, PQ codebook lookup, OPQ
    rotation+PQ, a distilled embedding …). Traversal + shortlist run
    on it; ``vectors`` (raw) triggers the exact refine. See the SQ/PQ
    adapters for the persisted-codes entry points.

    ``materialize_recon`` (default True) eagerly localCheckpoints the
    reconstruction before the walk: the beam search re-evaluates its
    vector table's plan EVERY hop (coarse pass + each hop's scoring
    join), so a recon plan containing a join — the residual tier's
    codes⋈anchors — re-executes per hop and dominates wall-clock
    (measured 14.3 s vs 5.7 s full-precision at the 20k bench point;
    materialized: decode runs once). Values are unchanged — the
    checkpoint is plan truncation, not arithmetic — so oracle replays
    are unaffected. Pass False for the decode-on-access regime when
    the decoded working set (corpus × d doubles) must never
    materialize — the DiskANN trade: storage stays codes-sized, each
    hop re-pays the decode."""
    from vector_indexer_spark.operators.pq import refine_topk  # noqa: PLC0415

    if k < 1:
        raise ValueError("k must be >= 1")
    if refine_factor < 1:
        raise ValueError("refine_factor must be >= 1")
    if materialize_recon:
        recon_vectors = recon_vectors.localCheckpoint(eager=True)
    shortlist_k = k if vectors is None else refine_factor * k
    hits = search_graph_index(
        spark, index, recon_vectors, queries,
        k=shortlist_k, beam=beam, max_hops=max_hops,
        entry_fanout=entry_fanout, coarse_method=coarse_method,
        filter_ids=filter_ids,
    )
    if vectors is None:
        return hits
    if index.metric == "cosine":
        # refine must rank by the index metric: on unit vectors
        # dist2 = 2 - 2*cos, so normalize both sides first (the same
        # internal, never-persisted normalization the search applies)
        from vector_indexer_spark.operators.similarity import (  # noqa: PLC0415
            normalize_vectors,
        )

        vectors = normalize_vectors(vectors, vec_col=index.vec_col)
        queries = normalize_vectors(queries, vec_col="query")
    return refine_topk(
        hits, vectors, queries, k,
        id_col=index.id_col, vec_col=index.vec_col,
    )


def add_to_graph_index(
    spark: SparkSession,
    index: GraphIndex,
    vectors: DataFrame,
    new_vectors: DataFrame,
    *,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    batch_iterations: int = 2,
) -> int:
    """Batched insert — the HNSW insert operation, append-only.

    Each new node's ``k`` nearest EXISTING nodes come from one
    two-layer search over the live index (the same routing a query
    takes); edges are appended in both directions, plus a NN-Descent
    k-NN graph WITHIN the batch (batched insertion's stand-in for
    HNSW's later-inserts-see-earlier-inserts: without it a batch
    landing in a new region would be internally disconnected). The
    live edge table is never read or rewritten — appends only, the
    same discipline as the IVF tier's ``add_vectors`` — so degree
    grows until :func:`compact_graph_index` re-prunes; the coarse
    layer is FIXED on insert (new nodes are findable through layer-0
    edges; a rebuild refreshes the sample — HNSW's upper layers also
    gain nodes only probabilistically).

    ``vectors`` is the EXISTING corpus (pre-insert); the caller owns
    appending ``new_vectors`` to its vector table. Returns the number
    of vectors added. Ids must be disjoint from the existing corpus.
    """
    from vector_indexer_spark.operators.graph import (  # noqa: PLC0415
        nn_descent_knn_graph,
    )

    idc, vcc = index.id_col, index.vec_col
    n_new = new_vectors.count()
    if n_new == 0:
        return 0
    q = new_vectors.select(
        F.col(idc).alias("query_id"), F.col(vcc).alias("query")
    )
    hits = search_graph_index(
        spark, index, vectors, q,
        k=index.k, beam=beam, max_hops=max_hops,
        entry_fanout=entry_fanout,
    ).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    cross = hits.unionByName(
        hits.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if n_new > 1:
        batch_for_graph = new_vectors
        if index.metric == "cosine":
            from vector_indexer_spark.operators.similarity import (  # noqa: PLC0415
                normalize_vectors,
            )

            batch_for_graph = normalize_vectors(
                new_vectors, vec_col=vcc
            )
        internal = nn_descent_knn_graph(
            batch_for_graph,
            min(index.k, n_new - 1),
            iterations=batch_iterations,
            symmetric=True,
            id_col=idc,
            vec_col=vcc,
            early_stop=False,
            # the guards recorded at build time apply to every batch-
            # internal graph too (None = guard off, oracle fixtures)
            max_reverse_degree=index.max_reverse_degree,
            max_candidates=index.max_candidates,
        )
        new_edges = cross.unionByName(internal).distinct()
    else:
        new_edges = cross.distinct()
    new_edges.write.mode("append").parquet(os.path.join(index.path, "edges"))

    index.n_vectors += n_new
    _write_meta(index.path, index._meta_dict())
    return n_new


def merge_graph_indexes(
    spark: SparkSession,
    dst: GraphIndex,
    src: GraphIndex,
    dst_vectors: DataFrame,
    src_vectors: DataFrame,
    *,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    coarse_size: int | None = None,
) -> dict:
    """Absorb ``src`` into ``dst`` (the graph twin of IVF
    ``merge_indexes`` / Faiss ``merge_from``) — the operation that
    makes DISTRIBUTED graph construction practical: build one index
    per data partition in parallel (each NN-Descent run touches only
    its shard), then merge. Unlike routing every src row through
    :func:`add_to_graph_index` (which would re-derive src's internal
    k-NN structure from scratch), the merge REUSES src's edge table
    verbatim — those are valid near-neighbor edges among src nodes —
    and pays only for stitching:

    1. src's edges append to dst's edge table unchanged.
    2. CROSS-LINKS bridge the two subgraphs: every node of src's
       coarse sample searches the dst index for ``dst.k`` neighbors
       and vice versa — 2·O(√n) bounded two-layer searches, edges
       appended in both directions. Routing makes most queries enter
       on their own side; cross-links let the beam cross where the
       corpora actually interleave.
    3. The coarse routing sample is recomputed over the UNION of live
       ids (same hash-spread bottom-m, ``suggest_nlist`` staging) so
       both regions are routable — without this, src's region would be
       as dark as the stale-coarse append case compaction fixes.
    4. src's tombstones carry over.

    ``src`` is left untouched; delete its directory when done. Id
    spaces must be disjoint (checked — one key-only join, the same
    guard as ``add_vectors``); dimension and metric must match.

    Crash/retry semantics (append-only, like ``add_to_graph_index``):
    the steps land in-order — edges+links append, tombstones append,
    coarse swap (atomic), meta write (atomic) — so a crash mid-merge
    leaves dst SEARCHABLE but stale (src's region dark until the
    coarse refresh lands). Re-running the merge after a partial
    failure is SAFE for search correctness but not idempotent on
    storage: src's edge table and tombstones append again, inflating
    the edge table and the dup/tombstone health counters until the
    next ``compact_graph_index`` (whose per-src top-degree re-prune
    collapses exact duplicate edges). Run compaction after any
    retried merge.
    ``dst_vectors``/``src_vectors`` are the two corpora (the caller
    owns unioning its canonical vector table). Returns
    ``{n_added, n_cross_links, n_vectors, coarse_size}``.
    """
    if src.dimension != dst.dimension:
        raise ValueError(
            f"dimension mismatch: src {src.dimension} != dst {dst.dimension}"
        )
    if src.metric != dst.metric:
        raise ValueError(
            f"metric mismatch: src {src.metric!r} != dst {dst.metric!r}"
        )
    idc, vcc = dst.id_col, dst.vec_col
    dv = dst_vectors.select(F.col(idc).alias("node"), F.col(vcc))
    sv = src_vectors.select(
        F.col(src.id_col).alias("node"), F.col(src.vec_col).alias(vcc)
    )
    n_overlap = dv.select("node").join(sv.select("node"), "node").count()
    if n_overlap:
        raise ValueError(
            f"{n_overlap} ids present in both indexes — id spaces must "
            "be disjoint (the merge_from contract)"
        )

    # 2. cross-links FIRST, while each side's index still routes its
    # own corpus cleanly (searches run against the pre-merge tables)
    def _cross(sample_idx, from_vectors, into_idx, into_vectors):
        qs = from_vectors.join(
            F.broadcast(sample_idx.coarse_nodes(spark)), "node"
        ).select(
            F.col("node").alias("query_id"), F.col(vcc).alias("query")
        )
        hits = search_graph_index(
            spark, into_idx, into_vectors.select(
                F.col("node").alias(into_idx.id_col),
                F.col(vcc).alias(into_idx.vec_col),
            ), qs,
            k=into_idx.k, beam=beam, max_hops=max_hops,
            entry_fanout=entry_fanout,
        ).select(
            F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
        )
        return hits.unionByName(
            hits.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    links = (
        _cross(src, sv, dst, dv)
        .unionByName(_cross(dst, dv, src, sv))
        .distinct()
    )
    n_links = links.count()

    # 1. + 2. land together: src edges + cross-links into dst
    src.edges(spark).select("src", "dst").unionByName(links).write.mode(
        "append"
    ).parquet(os.path.join(dst.path, "edges"))

    # 4. tombstones carry over
    src_dead = _tombstones(spark, src)
    if src_dead is not None:
        src_dead.write.mode("append").parquet(
            os.path.join(dst.path, "deleted")
        )

    # 3. coarse refresh over the union of live ids — src's carried
    # tombstones are dead too (they were appended to dst's table above,
    # so _tombstones(dst) now sees both sides)
    live = dv.select("node").unionByName(sv.select("node"))
    dst_dead = _tombstones(spark, dst)
    if dst_dead is not None:
        live = live.join(F.broadcast(dst_dead), "node", "left_anti")
    _, coarse_size = _refresh_coarse(spark, dst, live, coarse_size, "merge")

    n_added = src.n_vectors
    dst.n_vectors += n_added
    dst.coarse_size = coarse_size
    dst.coarse_refreshed_at_n = dst.n_vectors
    _write_meta(dst.path, dst._meta_dict())
    return {
        "n_added": n_added,
        "n_cross_links": n_links,
        "n_vectors": dst.n_vectors,
        "coarse_size": coarse_size,
    }


def compact_graph_index(
    spark: SparkSession,
    index: GraphIndex,
    vectors: DataFrame,
    *,
    max_degree: int | None = None,
    method: str = "arrow",
    coarse_size: int | None = None,
) -> tuple[int, int]:
    """Re-prune the edge table to ``max_degree`` (default ``2*k``)
    out-edges per node by ``(dist2, dst)`` — the counterpart of the
    IVF tier's ``compact_index`` after append-only inserts.

    One pass: rescore every edge (arrow fold-exact pair kernel — the
    edge table holds ids only, so distances are recomputed against
    the CURRENT vector table), per-src top-``max_degree`` window,
    staged write + atomic swap (live table untouched on failure).
    Pruning is per-direction, so the result may be asymmetric —
    exactly HNSW's post-prune state; beam search walks out-edges and
    is unaffected. Returns ``(edges_before, edges_after)``.

    Compaction also REFRESHES the coarse routing layer: the
    hash-spread sample is recomputed over the LIVE id set at
    ``coarse_size`` (default ``max(64, suggest_nlist(n_live))``, the
    build-time staging) — one TakeOrdered over ids. Inserts never touch the coarse layer, so
    after heavy append traffic routing would otherwise stay
    √n_original while layer 0 grows: entry points drift away from new
    regions and recall decays invisibly. Refreshing here restores
    routing parity with a fresh build over the same data.
    """
    import shutil  # noqa: PLC0415

    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.operators.graph import (  # noqa: PLC0415
        nn_descent_knn_graph,  # noqa: F401 (same scoring contract)
    )
    from vector_indexer_spark.functions.distance import (  # noqa: PLC0415
        dist2_expr,
    )

    if max_degree is None:
        max_degree = 2 * index.k
    if max_degree < 1:
        raise ValueError("max_degree must be >= 1")
    if index.metric == "cosine":
        from vector_indexer_spark.operators.similarity import (  # noqa: PLC0415
            normalize_vectors,
        )

        vectors = normalize_vectors(vectors, vec_col=index.vec_col)
    src_dir = os.path.join(index.path, "edges")
    edges = spark.read.parquet(src_dir).distinct()
    n_before = edges.count()
    # physically remove tombstoned nodes: their edges here, their
    # coarse membership below, the tombstone table after the swap
    dead = _tombstones(spark, index)
    if dead is not None:
        dead_src = dead.select(F.col("node").alias("src"))
        dead_dst = dead.select(F.col("node").alias("dst"))
        edges = edges.join(F.broadcast(dead_src), "src", "left_anti").join(
            F.broadcast(dead_dst), "dst", "left_anti"
        )
    v = vectors.select(
        F.col(index.id_col).alias("node"), F.col(index.vec_col).alias("vec")
    )
    joined = edges.join(
        v.select(F.col("node").alias("src"), F.col("vec").alias("__sv")),
        "src",
    ).join(
        v.select(F.col("node").alias("dst"), F.col("vec").alias("__dv")),
        "dst",
    )
    if method == "native":
        scored = joined.select(
            "src", "dst", dist2_expr("__sv", "__dv").alias("dist2")
        )
    else:

        def _score(batches):
            import numpy as np  # noqa: PLC0415
            import pandas as pd  # noqa: PLC0415

            from vector_indexer_spark.functions.kernels import (  # noqa: PLC0415
                rowwise_dist2_foldexact,
            )

            for pdf in batches:
                if pdf.empty:
                    continue
                yield pd.DataFrame(
                    {
                        "src": pdf["src"],
                        "dst": pdf["dst"],
                        "dist2": rowwise_dist2_foldexact(
                            np.stack(pdf["__sv"].to_numpy()),
                            np.stack(pdf["__dv"].to_numpy()),
                        ),
                    }
                )

        scored = joined.mapInPandas(
            _score, "src long, dst long, dist2 double"
        )
    w = Window.partitionBy("src").orderBy("dist2", "dst")
    pruned = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= max_degree)
        .select("src", "dst")
    )
    staging = f"{src_dir}__compact__staging"
    backup = f"{src_dir}__compact__backup"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(backup):
        if not os.path.exists(src_dir):
            os.rename(backup, src_dir)  # recover a crashed prior swap
        else:
            shutil.rmtree(backup)
    pruned.write.mode("overwrite").parquet(staging)
    n_after = spark.read.parquet(staging).count()
    os.rename(src_dir, backup)
    os.rename(staging, src_dir)
    shutil.rmtree(backup)

    # refresh the coarse routing sample over the LIVE id set — appends
    # never touch it, so without this the routing layer stays
    # √n_original forever (recall decays invisibly under append traffic)
    live = v.select("node")
    if dead is not None:
        live = live.join(F.broadcast(dead), "node", "left_anti")
    n_live, coarse_size = _refresh_coarse(
        spark, index, live, coarse_size, "compact"
    )
    if dead is not None:
        shutil.rmtree(os.path.join(index.path, "deleted"))
    index.coarse_size = coarse_size
    index.n_vectors = n_live
    index.coarse_refreshed_at_n = n_live
    _write_meta(index.path, index._meta_dict())
    return n_before, n_after


def _tombstones(spark: SparkSession, index: GraphIndex) -> DataFrame | None:
    """The deletion tombstone table ``(node)``, or None when empty."""
    p = os.path.join(index.path, "deleted")
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p).select("node").distinct()


def delete_from_graph_index(
    spark: SparkSession,
    index: GraphIndex,
    doomed: DataFrame,
) -> int:
    """Soft delete — the HNSW tombstone semantic: deleted nodes stay
    TRAVERSABLE (removing waypoints would tear holes in the graph's
    navigability) but are excluded from every search result from the
    next query on. Appends ids to the ``deleted`` tombstone table —
    the edge table is untouched until :func:`compact_graph_index`
    physically removes tombstoned nodes, their edges, and their coarse
    membership. Returns the number of NEW tombstones written.

    The caller's vector table must keep the doomed rows until
    compaction: searches still score deleted nodes as waypoints.
    """
    ids = doomed.select(
        F.col(index.id_col).alias("node")
    ).distinct()
    prior = _tombstones(spark, index)
    if prior is not None:
        ids = ids.join(prior, "node", "left_anti")
    n = ids.count()
    if n == 0:
        return 0
    ids.write.mode("append").parquet(os.path.join(index.path, "deleted"))
    index.n_vectors -= n
    _write_meta(index.path, index._meta_dict())
    return n


def refresh_graph_meta_count(
    spark: SparkSession, index: GraphIndex, vectors: DataFrame
) -> dict:
    """Re-derive ``n_vectors`` from the caller's canonical vector
    table minus pending tombstones and rewrite the meta sidecar — the
    graph twin of ``index_build.refresh_meta_count``. The streaming
    ingest's crash window (edges+meta land, the vector append doesn't,
    the replayed batch re-runs the insert) double-counts meta while
    the vector table holds each row once; every health milli-ratio in
    :func:`graph_index_stats` then reads off a wrong denominator until
    this repairs it. Returns ``{n_vectors, drift}``."""
    live = vectors.select(F.col(index.id_col).alias("node"))
    dead = _tombstones(spark, index)
    if dead is not None:
        live = live.join(F.broadcast(dead), "node", "left_anti")
    actual = live.count()
    drift = actual - index.n_vectors
    index.n_vectors = actual
    _write_meta(index.path, index._meta_dict())
    return {"n_vectors": actual, "drift": drift}


def graph_index_stats(spark: SparkSession, index: GraphIndex) -> DataFrame:
    """ANALYZE-style health report for a graph index: one tall
    ``(section, key, value)`` frame (all values exact integers —
    ratios in milli-units via integer division, so the report is
    bit-reproducible and oracle-checkable; the graph twin of the IVF
    tier's cluster-stats profiler).

    Sections: ``edges`` (DISTINCT count, covered nodes, out-degree
    min/max/avg, reciprocity — fraction of edges whose reverse exists;
    1000 right after a symmetric build, drifting down after compaction
    prunes or appends; plus ``n_duplicate_edge_rows``, the bag-minus-set
    surplus that accumulates across appends since each insert batch
    only dedups internally), ``coarse`` (sample size), ``meta`` (live
    vector count, k), ``deleted`` (pending tombstones), and ``health``
    — the staleness flags maintenance acts on:

    - ``appends_since_coarse_refresh``: live vectors added since the
      coarse sample was last computed (build or compaction). The
      routing layer does NOT grow on insert, so this is the recall-
      decay exposure.
    - ``coarse_stale_milli``: that same exposure as a fraction of the
      live corpus (milli-units).
    - ``tombstone_milli``: pending tombstones / live vectors.
    - ``duplicate_edge_milli``: duplicate edge rows / distinct edges.
    - ``needs_compaction``: 1 when any of the above crosses its
      threshold (coarse staleness ≥ 30%, tombstones ≥ 10%, duplicate
      rows ≥ 10%) — the boolean a maintenance scheduler polls.

    Degree/reciprocity stats are computed on the DEDUPLICATED edge
    set: duplicate rows from append batches are bookkeeping, not
    topology (bag semantics skewed avg_out_degree vs the set-semantic
    reciprocity intersect on any appended index). Everything is
    aggregate-sized: two edge scans, no joins wider than edge ⋈ edge
    on the reversed key.
    """
    e_raw = index.edges(spark).select("src", "dst")
    e = e_raw.distinct()
    n_raw = e_raw.count()
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    deg_stats = deg.agg(
        F.count("*").alias("nodes"),
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.sum("d").alias("dsum"),
    ).first()
    n_edges = int(deg_stats["dsum"] or 0)
    n_dup = n_raw - n_edges
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = e.intersect(rev).count()
    n_coarse = index.coarse_nodes(spark).count()
    dead = _tombstones(spark, index)
    n_dead = 0 if dead is None else dead.count()
    n_vec = max(index.n_vectors, 1)
    # missing coarse_refreshed_at_n (an index persisted before the
    # field existed) is UNKNOWN staleness — fail safe, not silent:
    # treat the baseline as 0 so needs_compaction trips and the next
    # compaction records a real baseline (the opposite default would
    # report zero staleness forever, exactly the invisible recall
    # decay the flag exists to catch)
    refreshed_at = (
        index.coarse_refreshed_at_n
        if index.coarse_refreshed_at_n is not None
        else 0
    )
    appended = max(index.n_vectors - refreshed_at, 0)
    coarse_stale_milli = (appended * 1000) // n_vec
    tombstone_milli = (n_dead * 1000) // n_vec
    dup_milli = (n_dup * 1000) // n_edges if n_edges else 0
    needs_compaction = int(
        coarse_stale_milli >= 300
        or tombstone_milli >= 100
        or dup_milli >= 100
    )
    rows = [
        ("edges", "n_edges", n_edges),
        ("edges", "n_duplicate_edge_rows", n_dup),
        ("edges", "n_nodes_with_out", int(deg_stats["nodes"] or 0)),
        ("edges", "min_out_degree", int(deg_stats["dmin"] or 0)),
        ("edges", "max_out_degree", int(deg_stats["dmax"] or 0)),
        (
            "edges",
            "avg_out_degree_milli",
            (n_edges * 1000) // int(deg_stats["nodes"])
            if deg_stats["nodes"]
            else 0,
        ),
        (
            "edges",
            "reciprocity_milli",
            (n_recip * 1000) // n_edges if n_edges else 0,
        ),
        ("coarse", "n_coarse_nodes", n_coarse),
        ("meta", "n_vectors", index.n_vectors),
        ("meta", "k", index.k),
        ("deleted", "n_tombstones", n_dead),
        ("health", "appends_since_coarse_refresh", appended),
        ("health", "coarse_stale_milli", coarse_stale_milli),
        ("health", "tombstone_milli", tombstone_milli),
        ("health", "duplicate_edge_milli", dup_milli),
        ("health", "needs_compaction", needs_compaction),
    ]
    return spark.createDataFrame(
        rows, "section string, key string, value long"
    )
