"""Graph traversal on DataFrames — bounded-depth BFS (min-hop
distances).

Spark has no recursive CTE; the standard translation is Pregel-style
iteration: each hop is one frontier ⋈ edges join (a key-partitioned
shuffle), with the visited set accumulated across iterations. Depth
is bounded by contract (``max_hops``) so the driver loop is a fixed,
small number of Spark jobs — the shape GraphFrames/GraphX use for
k-hop queries.

For UNBOUNDED reachability (full connected components) this engine
already has the right tool: ``dedup.resolve_duplicate_groups``'s
pointer-jumping min-label propagation, which converges in
O(log diameter) rounds instead of O(diameter). BFS here is the
complement: exact hop DISTANCES for bounded neighborhoods (k-hop
ego nets, near-dup blast radius, graph-ANN walks).

Scale shape per iteration: frontier ⋈ edges shuffles on the node key;
the visited set joins as an anti-join on the same key. Iterative state
is eagerly localCheckpoint-ed per round — NOT merely persisted: the
state frame appears 2-4x in each next round's tree, so without plan
truncation driver-side Catalyst analysis grows exponentially even with
the data cached (measured; see BASELINE.md). At 1000 executors the
cost is ``max_hops`` shuffles of frontier-sized (not graph-sized) data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    *,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Minimum hop count from any source to every node within
    ``max_hops``: ``(node, hops)``, sources at 0.

    ``edges`` is directed — pass both directions for an undirected
    graph. Deterministic: the first hop at which a node is reached is
    unique, whatever the join order.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    )
    # eager localCheckpoint, NOT persist: `dist` appears 2-3x in every
    # hop's tree (anti-join + union), so the LOGICAL plan doubles per
    # hop and driver-side Catalyst analysis goes exponential even with
    # the data cached (measured 10s -> 45s -> ~200s per hop on the
    # beam-search twin of this loop). Checkpointing truncates to a
    # constant-size LogicalRDD each round — the same pattern as
    # dedup.resolve_duplicate_groups' pointer-jumping loop.
    dist = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["__s"])
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return dist.orderBy("node")


def symmetrize(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Undirected pair list → directed edge list (both directions)."""
    fwd = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    rev = pairs.select(
        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
    )
    return fwd.unionByName(rev).distinct()


def knn_graph(
    vectors: DataFrame,
    k: int,
    *,
    id_col: str = "id",
    vec_col: str = "values",
    symmetric: bool = True,
) -> DataFrame:
    """k-NN graph: directed edge to each point's ``k`` nearest
    neighbors (self excluded, engine tie rule (dist2, id)); optionally
    symmetrized. The navigable structure graph-ANN methods build —
    here as the substrate for hop queries over similarity space.
    """
    from vector_indexer_spark.operators.knn import knn_exact  # noqa: PLC0415

    if k < 1:
        raise ValueError("k must be >= 1")
    q = vectors.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query")
    )
    nn = (
        knn_exact(
            vectors, q, k=k + 1, id_col=id_col, vec_col=vec_col,
            method="native",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            F.col("query_id").alias("src"),
            F.col("neighbor_id").alias("dst"),
            F.col("rank"),
        )
    )
    # rank re-check after dropping self: keep the k best survivors
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("src").orderBy("rank")
    edges = (
        nn.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select("src", "dst")
    )
    if symmetric:
        return symmetrize(edges, "src", "dst")
    return edges


PAGERANK_SCALE = 1_000_000  # ranks held in integer micros


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Link-graph importance in EXACT integer arithmetic:
    ``(node, rank_micros)`` after ``iterations`` rounds of

        r' = (100 - d)/100 + d/100 · Σ_{u→v} r(u) DIV outdeg(u)

    with every rank held in integer micros and every division an
    integer floor — so the result is bit-identical across engines,
    partitionings, and summation orders (float PageRank is none of
    those: its Σ over in-neighbors reassociates per shuffle). The
    page-importance signal CommonCrawl-scale corpus curation feeds
    into quality scoring; absolute values differ from float PageRank
    by < 1e-4 relative (bounded by the per-edge floor loss · in-degree).

    Dangling nodes (no out-edges) appear as rank receivers; their mass
    is dropped rather than redistributed (the common simplification;
    ranks then need no global normalization pass per iteration).

    Scale shape per iteration: ONE shuffle of the rank table joined to
    the edge list on the source key, one map-side-combined SUM by
    destination. ``iterations`` is bounded by contract (quality
    signals use 2-5 rounds); out-degrees are computed once. The edge
    list never moves: pre-partition both sides on the node key (or
    bucket the edge table) and every round is a co-located join.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    )
    # eager localCheckpoint, the engine-wide iterative-state discipline
    # (see bfs_hops/graph_ann_search): `nodes` and `rank` each appear
    # 2x in every iteration's tree, so without plan truncation the
    # logical plan doubles per round and driver-side Catalyst analysis
    # grows exponentially even with the data cached. Checkpointing
    # also replaces the old persist() (which leaked — nothing ever
    # unpersisted it).
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy(F.col("__s").alias("node")).agg(
        F.count("*").alias("__deg")
    )
    base = F.lit((100 - damping_pct) * PAGERANK_SCALE // 100).cast("long")
    rank = nodes.withColumn(
        "rank_micros", F.lit(PAGERANK_SCALE).cast("long")
    )
    for _ in range(iterations):
        contrib = (
            rank.join(outdeg, "node")
            .join(e, rank["node"] == e["__s"])
            .select(
                F.col("__d").alias("node"),
                # true integer division (`div`), NOT double `/` + cast:
                # doubles lose exactness past 2^53 and round-to-nearest
                F.expr("rank_micros div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        rank = (
            nodes.join(contrib, "node", "left")
            .withColumn("__in", F.coalesce(F.col("__in"), F.lit(0)))
            .select(
                "node",
                (
                    base
                    + F.expr(f"({damping_pct} * __in) div 100")
                ).alias("rank_micros"),
            )
            .localCheckpoint()
        )
    return rank


def connected_components(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_pairs_driver: int = 5_000_000,
) -> DataFrame:
    """(node, component) — undirected connected components with the
    component labeled by its minimum node id.

    Public face of the machinery duplicate-group resolution already
    uses: driver union-find below ``max_pairs_driver`` distinct edges
    (edge lists arrive post-blocking and are orders of magnitude
    smaller than node sets), distributed min-label propagation with
    pointer jumping above it (O(log diameter) rounds, never
    materializing edges on the driver). Unlike :func:`bfs_hops` this
    has no depth bound — it answers "which island?", not "how far?".
    """
    from vector_indexer_spark.operators.dedup import (  # noqa: PLC0415
        resolve_duplicate_groups,
    )

    e = edges.select(
        F.col(src_col).alias("id_a"), F.col(dst_col).alias("id_b")
    )
    nodes = (
        e.select(F.col("id_a").alias("doc_id"))
        .union(e.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    out = resolve_duplicate_groups(
        nodes, e, id_col="doc_id", max_pairs_driver=max_pairs_driver
    )
    return out.select(
        F.col("doc_id").alias("node"),
        F.col("canonical_id").alias("component"),
    )


# ---------------------------------------------------------------------------
# Graph-based ANN: beam search over the k-NN graph.
#
# The third major ANN family next to the engine's IVF partition pruning
# and PQ/SQ/BQ quantization tiers: navigable-graph search (the HNSW/
# NSG family's layer-0 mechanic). Batch-oriented and hop-synchronous —
# every query advances one hop per Spark job, so a 10k-query batch
# costs max_hops joins total, not 10k sequential walks.
# ---------------------------------------------------------------------------


def graph_ann_search(
    vectors: DataFrame,
    edges: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    beam: int = 8,
    max_hops: int = 3,
    entry_ids: list[int] | None = None,
    entry_df: DataFrame | None = None,
    exclude_ids: DataFrame | None = None,
    include_ids: DataFrame | None = None,
    id_col: str = "id",
    vec_col: str = "values",
) -> DataFrame:
    """Beam search over a navigable graph: ``(query_id, rank,
    neighbor_id, dist2)`` top-k per query. ``exclude_ids`` (a
    ``node``-column frame, e.g. deletion tombstones) is filtered from
    RESULTS only — excluded nodes remain traversable waypoints.
    ``include_ids`` is the attribute-filtered-ANN complement: results
    restricted to an allowed node set, traversal unrestricted (the
    post-filter-during-search strategy — walking only the filtered
    subgraph would fragment it; raise ``k``/``beam`` for very
    selective filters).

    Semantics (deterministic, oracle-unrollable): the beam starts at
    ``entry_ids`` (default: the ``beam`` nodes with the smallest
    multiplicative hash — a deterministic spread sample), or — for
    PER-QUERY seeding — at ``entry_df`` ``(query_id, node)`` rows (the
    coarse layer's shortlist in the two-layer index); each hop
    expands every current beam node's out-edges, drops already-visited
    candidates, scores the rest, and re-selects the best ``beam``
    visited nodes by ``(dist2, node)``. After ``max_hops`` hops the
    best ``k`` visited nodes are returned. Hop-synchronous expansion
    (whole beam, not just the newest frontier) keeps each hop a single
    uniform join — and makes the recurrence expressible hop-by-hop in
    plain SQL, which is how the oracle locks it.

    Scale shape: per hop, one shuffle of (beam x degree) candidate
    rows per query on the node key to fetch vectors, one broadcast of
    the query batch, one per-query window for beam re-selection.
    State between hops is the visited table — bounded by
    queries x (entry + hops x beam x degree) rows, id+double wide.
    Distances use the fold-left Catalyst expression (bit-exact, the
    oracle anchor); candidate sets are beam-sized so the GEMM kernel
    would be overhead, not win, here.
    """
    from vector_indexer_spark.functions.distance import (  # noqa: PLC0415
        dist2_expr,
    )
    from pyspark.sql import Window  # noqa: PLC0415

    if k < 1 or beam < 1:
        raise ValueError("k and beam must be >= 1")
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    v = vectors.select(
        F.col(id_col).alias("node"), F.col(vec_col).alias("vec")
    )
    q = queries.select("query_id", "query")
    e = edges.select(F.col("src").alias("enode"), F.col("dst"))

    if entry_df is not None:
        seed = entry_df.select("query_id", "node").distinct()
    elif entry_ids is None:
        # default entries: bottom-`beam` by a multiplicative hash — a
        # deterministic SPREAD sample (consecutive ids are usually
        # cluster-mates; hash order decorrelates entry placement from
        # insertion order). orderBy+limit compiles to
        # TakeOrderedAndProject — a distributed partial top-k, not a
        # single-partition window; the hash is the same pure modular
        # arithmetic the NN-Descent init uses, so the oracle replays it.
        h = (
            (F.col("node") % F.lit(1_000_003)) * F.lit(40_503) + F.lit(7)
        ) % F.lit(1_000_003)
        entry = (
            v.select("node", h.alias("__h"))
            .orderBy("__h", "node")
            .limit(beam)
            .select("node")
        )
    else:
        entry = v.sparkSession.createDataFrame(
            [(int(i),) for i in entry_ids], "node long"
        )
    if entry_df is None:
        seed = q.select("query_id").crossJoin(entry)

    def scored(cand: DataFrame) -> DataFrame:
        return (
            cand.join(v, "node")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "node",
                dist2_expr("query", "vec").alias("dist2"),
            )
            # duplicate vector-id rows (e.g. an at-least-once ingest
            # replay that slipped past upstream dedup) would otherwise
            # waste beam slots mid-walk AND let one neighbor consume
            # two of a query's k result ranks; with unique ids this is
            # a no-op on an already-bounded frame. min(dist2) rather
            # than dropDuplicates so the survivor is deterministic
            # even if duplicate ids ever carry DIVERGENT vectors (a
            # contract violation, but one that must not make runs
            # diverge).
            .groupBy("query_id", "node")
            .agg(F.min("dist2").alias("dist2"))
        )

    # eager localCheckpoint, NOT persist: `visited` appears 3x in every
    # hop's tree (beam window + anti-join + union), so the LOGICAL plan
    # doubles per hop and driver-side Catalyst analysis goes exponential
    # even with the data cached (measured 10s -> 45s -> ~200s per hop
    # at 20k nodes). Checkpointing truncates to a constant-size
    # LogicalRDD each hop; the hop cost is then the actual joins.
    visited = scored(seed).localCheckpoint()
    n_vis = visited.count()
    wq = Window.partitionBy("query_id").orderBy("dist2", "node")
    for _ in range(max_hops):
        beam_df = (
            visited.withColumn("__r", F.row_number().over(wq))
            .filter(F.col("__r") <= beam)
            .select("query_id", "node")
        )
        cand = (
            beam_df.join(e, beam_df["node"] == e["enode"])
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("query_id", "node"), ["query_id", "node"],
                  "left_anti")
        )
        nxt = visited.unionByName(scored(cand)).localCheckpoint()
        # the anti-join makes every new row novel, so an unchanged
        # count is exactly "no new candidates reached"
        n_nxt = nxt.count()
        if n_nxt == n_vis:
            break
        visited, n_vis = nxt, n_nxt
    if exclude_ids is not None:
        # soft-deleted nodes stay TRAVERSABLE (waypoints above) but
        # never appear in results — the HNSW tombstone semantic
        visited = visited.join(
            F.broadcast(exclude_ids.select("node").distinct()),
            "node",
            "left_anti",
        )
    if include_ids is not None:
        # attribute filter: same traversal, results restricted — a
        # semi-join before the final top-k (broadcast when the allowed
        # set is a pushed-down key list; swap to a shuffled semi-join
        # upstream for corpus-sized predicates)
        visited = visited.join(
            F.broadcast(include_ids.select("node").distinct()),
            "node",
            "left_semi",
        )
    out = (
        visited.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("node").alias("neighbor_id"),
            "dist2",
        )
    )
    return out


# ---------------------------------------------------------------------------
# NN-Descent k-NN graph construction (Dong, Moses & Li, WWW 2011).
#
# The scale path for graph construction: ``knn_graph`` above is the
# exact O(n^2) yardstick; NN-Descent converges to a near-exact k-NN
# graph in a handful of rounds, each round touching O(n * k^2)
# candidate pairs — linear in n. The principle: a neighbor of a
# neighbor is likely a neighbor, so each round joins the current
# graph with itself through the shared middle node, scores the new
# candidates, and keeps the best k per node.
# ---------------------------------------------------------------------------


def nn_descent_knn_graph(
    vectors: DataFrame,
    k: int,
    *,
    iterations: int = 4,
    max_candidates: int | None = None,
    max_reverse_degree: int | None | str = "auto",
    symmetric: bool = True,
    id_col: str = "id",
    vec_col: str = "values",
    return_distances: bool = False,
    early_stop: bool = True,
    method: str = "arrow",
) -> DataFrame:
    """Approximate k-NN graph via NN-Descent: same ``(src, dst)``
    contract as :func:`knn_graph` (or ``(src, dst, rank, dist2)``
    directed with ``return_distances=True``), built in
    ``iterations`` bounded rounds instead of an all-pairs join.

    Deterministic and oracle-unrollable: the initial graph hashes ids
    into buckets of ~2k+2 expected occupants under THREE independent
    multiplicative hashes (``((id % 1000003) * A_r + B_r) % 1000003 %
    nbuckets`` — pure modular arithmetic, identical in any SQL
    dialect, no engine hash function), scores the union of all
    within-bucket pairs, and keeps each node's best k. Three
    independent bucketings matter: one bucketing yields an
    assortative init whose neighbor-of-neighbor closure never leaves
    its own bucket (the descent converges instantly at a useless
    local optimum — measured recall 0.04); with independent
    bucketings each node's neighbors bridge different buckets, giving
    the expander-like mixing random init the published algorithm
    assumes. Each round then expands neighbor-of-neighbor candidates
    over the symmetrized current graph and re-selects top-k by
    ``(dist2, dst)``. Every step is a deterministic set function of
    the input, so the whole recurrence can be replayed hop-by-hop by
    the DuckDB oracle.

    Scale shape per round: candidate generation is one self-join of
    the edge list on the shared middle node (n*k rows joined to n*k
    rows on a k-ish-cardinality-per-key column: O(n*k^2) output,
    optionally capped per node by ``max_candidates``).
    ``max_reverse_degree`` is the published ρ-sampling guard for HUB
    skew: a node with in-degree D contributes D² candidate rows from
    one join key; the cap bounds every node's symmetrized degree at
    ``k + max_reverse_degree`` via a deterministic hash-ordered
    sample. Default ``"auto"`` = ``4·k`` — on a deduped-web corpus
    (exactly this engine's target) medoid/boilerplate hubs are the
    norm, so the guard is ON by default; pass ``None`` to disable
    (the small-fixture oracle queries do, to keep their SQL replays
    the pure published recurrence). Scoring is two
    key-partitioned joins against the vector table; re-selection is
    one window partitioned by src. No global barrier besides the
    round structure itself — n=10^9, k=20 is 4 rounds of ~4*10^11
    bounded candidate rows, each shuffle key-partitioned, vs the
    10^18-pair all-pairs join this replaces.

    Convergence is checked per round (new edge set == old edge set →
    stop early); recall vs the exact graph is typically >0.9 on
    clustered data after 3-4 rounds (pytest locks a threshold).

    ``method='arrow'`` (default) scores candidate pairs with
    ``kernels.rowwise_dist2_foldexact`` — bit-identical to the
    ``'native'`` fold expression (same IEEE operation sequence,
    column-wise vectorized), ~10x faster on multi-million-pair
    rounds; it requires integer-typed ids (the engine contract).
    The fixed oracle query runs the arrow path, so its bit-exactness
    vs DuckDB is continuously proven.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.functions.distance import (  # noqa: PLC0415
        dist2_expr,
    )

    if k < 1:
        raise ValueError("k must be >= 1")
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if method not in ("arrow", "native"):
        raise ValueError("method must be 'arrow' or 'native'")
    if max_reverse_degree == "auto":
        max_reverse_degree = 4 * k
    elif isinstance(max_reverse_degree, str):
        raise ValueError(
            "max_reverse_degree must be an int, None, or 'auto'"
        )
    if max_reverse_degree is not None and max_reverse_degree < 1:
        raise ValueError("max_reverse_degree must be >= 1")

    v = vectors.select(
        F.col(id_col).alias("node"), F.col(vec_col).alias("vec")
    )
    n = v.count()
    # expected bucket occupancy ~ 2k+2: enough intra-bucket pairs to
    # seed every node with up-to-k starters, small enough that the
    # init join is O(n * k) per bucketing, not O(n^2 / nbuckets)
    nbuckets = max(1, n // (2 * k + 2))

    def bucket_expr(mult: int, add: int):
        return (
            (F.col("node") % F.lit(1_000_003)) * F.lit(mult)
            + F.lit(add)
        ) % F.lit(1_000_003) % F.lit(nbuckets)

    w_src = Window.partitionBy("src").orderBy("dist2", "dst")

    def topk(edges_scored: DataFrame) -> DataFrame:
        return (
            edges_scored.withColumn("__r", F.row_number().over(w_src))
            .filter(F.col("__r") <= k)
            .select(
                "src",
                "dst",
                F.col("__r").cast("int").alias("rank"),
                "dist2",
            )
        )

    init_pairs = None
    for mult, add in ((40_503, 7), (75_029, 13), (126_989, 29)):
        vb = v.withColumn("__b", bucket_expr(mult, add))
        a, b = vb.alias("a"), vb.alias("b")
        pairs_r = (
            a.join(b, on=(F.col("a.__b") == F.col("b.__b")))
            .filter(F.col("a.node") != F.col("b.node"))
            .select(
                F.col("a.node").alias("src"),
                F.col("b.node").alias("dst"),
            )
        )
        init_pairs = (
            pairs_r
            if init_pairs is None
            else init_pairs.unionByName(pairs_r)
        )
    def score_pairs(pairs: DataFrame) -> DataFrame:
        """(src, dst) -> (src, dst, dist2). Both methods produce
        BIT-IDENTICAL doubles: 'native' is the fold-left Catalyst
        expression; 'arrow' is kernels.rowwise_dist2_foldexact, the
        same fold-left order vectorized across rows (measured ~10x on
        the multi-million-pair rounds — HOF folds are interpreted)."""
        joined = pairs.join(
            v.select(F.col("node").alias("src"), F.col("vec").alias("__sv")),
            "src",
        ).join(
            v.select(F.col("node").alias("dst"), F.col("vec").alias("__dv")),
            "dst",
        )
        if method == "native":
            return joined.select(
                "src", "dst", dist2_expr("__sv", "__dv").alias("dist2")
            )

        def _score(batches):
            import numpy as np  # noqa: PLC0415
            import pandas as pd  # noqa: PLC0415

            from vector_indexer_spark.functions.kernels import (  # noqa: PLC0415
                rowwise_dist2_foldexact,
            )

            for pdf in batches:
                if pdf.empty:
                    continue
                a = np.stack(pdf["__sv"].to_numpy())
                b = np.stack(pdf["__dv"].to_numpy())
                yield pd.DataFrame(
                    {
                        "src": pdf["src"],
                        "dst": pdf["dst"],
                        "dist2": rowwise_dist2_foldexact(a, b),
                    }
                )

        return joined.mapInPandas(_score, "src long, dst long, dist2 double")

    # a pair can share a bucket under 2 hashes — dedup before scoring.
    # eager localCheckpoint, NOT persist: `cur` appears 4x in every
    # round's tree (und twice + anti-join + union), so the LOGICAL plan
    # grows ~4x per round and driver-side Catalyst analysis goes
    # exponential even with the data cached; checkpointing truncates
    # to a constant-size LogicalRDD per round (see graph_ann_search).
    cur = topk(score_pairs(init_pairs.distinct())).localCheckpoint()

    for _ in range(iterations):
        und = (
            cur.select("src", "dst")
            .unionByName(
                cur.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .distinct()
        )
        if max_reverse_degree is not None:
            # ρ-sampling (Dong et al. §2.3), deterministic: a HUB node
            # (huge in-degree — a cluster medoid, a boilerplate
            # embedding) makes the middle-node self-join below emit
            # degree² candidate rows from ONE key. Cap each node's
            # und out-degree at k + max_reverse_degree, keeping the k
            # forward edges plus the hash-smallest reverse neighbors
            # (hash order = an unbiased deterministic sample; dst
            # order would bias toward low ids).
            w_rev = Window.partitionBy("src").orderBy(
                (
                    (F.col("dst") % F.lit(1_000_003)) * F.lit(40_503)
                    + F.lit(7)
                )
                % F.lit(1_000_003),
                "dst",
            )
            und = (
                und.withColumn("__u", F.row_number().over(w_rev))
                .filter(F.col("__u") <= k + max_reverse_degree)
                .drop("__u")
            )
        u1, u2 = und.alias("u1"), und.alias("u2")
        cand = (
            u1.join(u2, on=(F.col("u1.dst") == F.col("u2.src")))
            .filter(F.col("u1.src") != F.col("u2.dst"))
            .select(
                F.col("u1.src").alias("src"),
                F.col("u2.dst").alias("dst"),
            )
            .distinct()
            # drop candidates already in the graph — they carry a
            # known dist2; rescoring them is wasted joins
            .join(cur.select("src", "dst"), ["src", "dst"], "left_anti")
        )
        if max_candidates is not None:
            w_cap = Window.partitionBy("src").orderBy("dst")
            cand = (
                cand.withColumn("__c", F.row_number().over(w_cap))
                .filter(F.col("__c") <= max_candidates)
                .drop("__c")
            )
        scored = score_pairs(cand)
        nxt = topk(
            cur.select("src", "dst", "dist2").unionByName(scored)
        ).localCheckpoint()
        # early_stop trades one exceptAll job per round for skipping
        # the remaining rounds once the edge set stops changing; the
        # OUTPUT is identical either way (a converged set is a fixed
        # point of the round function), so callers on a fixed round
        # budget can turn the check off
        if early_stop:
            converged = (
                nxt.select("src", "dst")
                .exceptAll(cur.select("src", "dst"))
                .isEmpty()
            )
            if converged:  # no new edges survived this round
                break
        cur = nxt

    if symmetric:
        return symmetrize(cur, "src", "dst")
    if return_distances:
        return cur.select("src", "dst", "rank", "dist2")
    return cur.select("src", "dst")
