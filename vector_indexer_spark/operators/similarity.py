"""Similarity search over embedding columns.

Extension operators (the "similarity search" pillar of the
training-data pipeline): brute-force cosine top-k as the exact
baseline, and an IVF-accelerated cosine path built on the engine's own
index by the classic reduction — for unit vectors,
``cos(a,b) = 1 − dist2(â, b̂)/2`` — so cosine ANN *is* L2 ANN on
normalized vectors, reusing build/search/pruning unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_indexer_spark.functions.distance import cosine_expr, norm_expr
from vector_indexer_spark.operators.index_build import IvfIndex, build_index
from vector_indexer_spark.operators.search import search_index


def normalize_vectors(
    df: DataFrame, *, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """L2-normalize an embedding column (zero vectors pass through).

    The norm is hoisted into a temporary column first: referencing the
    aggregate inside the per-element transform lambda would re-evaluate
    the whole O(d) fold for every element (O(d²) per row — Catalyst
    does not CSE across a higher-order-function boundary).
    """
    out_col = out_col or vec_col
    tmp = "__norm"
    while tmp in df.columns:  # never clobber a caller's column
        tmp += "_"
    n = F.col(tmp)
    normed = F.when(
        n > 0,
        F.transform(F.col(vec_col), lambda x: (x.cast("double") / n).cast("float")),
    ).otherwise(F.col(vec_col))
    return (
        df.withColumn(tmp, norm_expr(vec_col))
        .withColumn(out_col, normed)
        .drop(tmp)
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Exact cosine top-k (descending, ties by neighbor id) — the
    brute-force baseline, fully oracle-checkable."""
    if k <= 0:
        raise ValueError("k must be positive")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_col).alias("__q")
    )
    scored = vectors.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_expr("__q", F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def build_cosine_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **build_kwargs,
) -> IvfIndex:
    """Build an IVF index over *normalized* vectors — the cosine ANN
    scale path (brute cosine is O(n) per query; this prunes like any
    IVF search)."""
    normed = normalize_vectors(df, vec_col=vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("values")
    )
    return build_index(normed, path, **build_kwargs)


def search_cosine(
    spark: SparkSession,
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 20,
    *,
    query_id_col: str = "query_id",
    query_col: str = "query",
    **kwargs,
) -> DataFrame:
    """Cosine ANN: normalize queries, run L2 search on the normalized
    index, convert dist2 back to cosine (cos = 1 − d²/2)."""
    qn = normalize_vectors(queries, vec_col=query_col)
    out = search_index(
        spark,
        index,
        qn,
        k=k,
        n_probe=n_probe,
        query_id_col=query_id_col,
        query_col=query_col,
        **kwargs,
    )
    return out.select(
        "query_id",
        "rank",
        "neighbor_id",
        (F.lit(1.0) - F.col("dist2") / F.lit(2.0)).alias("cosine"),
    )


# ---------------------------------------------------------------------------
# Random-hyperplane (signed random projection) LSH for cosine — the
# training-free complement to the IVF cosine path: Charikar (STOC 2002)
# SimHash for real-valued vectors. P[sign bit agrees] = 1 − θ/π, so
# near-duplicate pairs (θ→0) collide in some band with high probability
# while the self-join only ever shuffles band-bucket keys, never n².
# ---------------------------------------------------------------------------


def sample_hyperplanes(
    df: DataFrame,
    n_bits: int = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Deterministic data-derived hyperplanes: the ``n_bits`` lowest-id
    vectors. For (near-)centered embedding spaces a data vector is a
    usable random direction, and deriving it from the table keeps every
    downstream signature SQL-reproducible (no RNG stream to replicate —
    the same fixture idea as the fixed-centroid oracles). Callers with
    uncentered data should pass mean-subtracted samples or their own
    planes.
    """
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_bits)
        .collect()
    )
    if len(rows) < n_bits:
        raise ValueError(
            f"need {n_bits} rows to derive hyperplanes, got {len(rows)}"
        )
    return [list(r[1]) for r in rows]


def rhp_sig_expr(vec, hyperplanes: list):
    """BIGINT signature: bit b set iff ``dot(vec, H_b) >= 0``. The dots
    are the engine's bit-reproducible fold, so the signature (and every
    bucket derived from it) is exactly reproducible by the SQL oracle.
    """
    from vector_indexer_spark.functions.distance import dot_expr  # noqa: PLC0415

    vec = F.col(vec) if isinstance(vec, str) else vec
    bits = []
    for b, h in enumerate(hyperplanes):
        hlit = F.array(*[F.lit(float(x)) for x in h])
        bits.append(
            F.when(dot_expr(vec, hlit) >= 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def rhp_signatures(
    df: DataFrame,
    hyperplanes: list,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, sig)`` — scan-local codegen projection (n_bits folds
    per row, no shuffle, no Python)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        rhp_sig_expr(vec_col, hyperplanes).alias("sig"),
    )


def rhp_candidate_pairs(
    df: DataFrame,
    hyperplanes: list,
    *,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """Banded signature self-join → distinct candidate ``(id_a, id_b)``
    with ``id_a < id_b``.

    Same scale posture as the MinHash LSH blocker (operators/dedup.py):
    shuffle on band-bucket keys only, oversized buckets (degenerate
    directions / mass-duplicated embeddings) dropped via a broadcast
    anti-join so one hot bucket cannot go quadratic.
    """
    n_bits = len(hyperplanes)
    if n_bits % bands:
        raise ValueError("n_bits must be divisible by bands")
    rows_per_band = n_bits // bands
    mask = (1 << rows_per_band) - 1
    sig = rhp_signatures(
        df, hyperplanes, id_col=id_col, vec_col=vec_col
    ).persist()
    banded = sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * rows_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bval")
    if max_bucket_size is not None:
        big = (
            banded.groupBy("band", "bval")
            .agg(F.count("*").alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket_size)
            .select("band", "bval")
        )
        banded = banded.join(
            F.broadcast(big), ["band", "bval"], "left_anti"
        )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("id_a"),
            F.col("r.vec_id").alias("id_b"),
        )
        .distinct()
    )


def cosine_near_dup_rhp(
    df: DataFrame,
    hyperplanes: list | None = None,
    *,
    threshold: float = 0.9,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 100_000,
    method: str = "arrow",
) -> DataFrame:
    """Embedding near-dup pairs via RHP blocking + exact cosine verify:
    ``(id_a, id_b, cosine)`` with ``cosine >= threshold``. The exact
    cosine runs only on LSH candidates — never all pairs; the verify
    scoring is the shared fold-exact arrow kernel by default
    (``dedup.cosine_score_pairs`` — bit-identical to the native fold,
    ~10x on candidate-pair frames at scale)."""
    if hyperplanes is None:
        hyperplanes = sample_hyperplanes(
            df, id_col=id_col, vec_col=vec_col
        )
    pairs = rhp_candidate_pairs(
        df,
        hyperplanes,
        bands=bands,
        id_col=id_col,
        vec_col=vec_col,
        max_bucket_size=max_bucket_size,
    )
    from vector_indexer_spark.operators.dedup import (  # noqa: PLC0415
        cosine_score_pairs,
    )

    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    proj = pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", "__va", "__vb"
    )
    return cosine_score_pairs(proj, method=method).filter(
        F.col("cosine") >= threshold
    )


def _nearest_centroid(
    df: DataFrame, centroids, *, id_col: str, vec_col: str
) -> DataFrame:
    """``(id, cluster_id, dist2)`` via the codegen J1 argmin: literal
    centroid cross join + fold dist2 + (dist2, centroid_id) window.

    Deliberately NOT :func:`kmeans.assign_clusters` (the NumPy/Arrow
    kernel): this expression tree is what the DuckDB oracles replay
    bit-for-bit, ties and all — the audit/dedup operators built on it
    stay SQL-checkable. The kernel path is for the index build's bulk
    assignment, where no oracle replays the floats.
    """
    import numpy as np  # noqa: PLC0415

    from vector_indexer_spark.functions.distance import dist2_expr  # noqa: PLC0415

    c = np.asarray(centroids, dtype=np.float64)
    spark = df.sparkSession
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(c)],
        "centroid_id long, cvec array<double>",
    )
    pairs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
    ).crossJoin(F.broadcast(cent)).select(
        "id", "centroid_id", dist2_expr("cvec", "__v").alias("dist2")
    )
    w = Window.partitionBy("id").orderBy("dist2", "centroid_id")
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", F.col("centroid_id").alias("cluster_id"), "dist2")
    )


def embedding_outliers(
    df: DataFrame,
    centroids,
    *,
    top_n: int | None = None,
    threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier audit: score every vector by its squared
    distance to the nearest centroid and flag the worst offenders —
    mis-embedded rows, corrupt inputs, and off-manifold junk that
    poisons both ANN recall and training batches.

    Two modes (exactly one of ``top_n`` / ``threshold``):

    - ``top_n``: the n globally worst rows, ranked ``(dist2 desc, id)``
      — deterministic and oracle-checkable. The global rank sorts only
      rows that survive a per-partition pre-rank... at audit sizes
      (top_n ≪ n) Catalyst's TakeOrdered handles it without a full
      sort of the corpus.
    - ``threshold``: scan-scale filter ``dist2 > threshold`` (derive
      the threshold from a quantile sketch in production) — no global
      ordering, fully distributed.

    ``centroids`` is a small (k, d) array-like — broadcast via literal
    cross join; the assignment is the same J1 argmin the index build
    uses. Returns ``(id, cluster_id, dist2[, outlier_rank])``.
    """
    if (top_n is None) == (threshold is None):
        raise ValueError("pass exactly one of top_n / threshold")
    if top_n is not None and top_n <= 0:
        raise ValueError("top_n must be positive")
    nearest = _nearest_centroid(
        df, centroids, id_col=id_col, vec_col=vec_col
    )
    if threshold is not None:
        return nearest.filter(F.col("dist2") > threshold)
    # TakeOrdered top-n over the corpus-sized distance frame; the
    # rank window then touches ≤ top_n rows (an unpartitioned window
    # over `nearest` itself would single-task the corpus)
    top = nearest.orderBy(F.col("dist2").desc(), "id").limit(top_n)
    wg = Window.orderBy(F.col("dist2").desc(), "id")
    return top.withColumn(
        "outlier_rank", F.row_number().over(wg)
    ).select("id", "cluster_id", "dist2", "outlier_rank")


def semdedup(
    df: DataFrame,
    centroids,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping, within each
    cluster, every vector that has a lower-id near-duplicate at
    ``cosine >= threshold`` — one exemplar (the lowest id, the paper's
    deterministic stand-in for its random choice) survives per
    duplicate neighborhood.

    ``centroids`` is a small (k, d) array-like (a k-means fit or any
    fixed partitioning). Returns ``(vec_id, cluster_id, kept)`` for
    every input row.

    Scale shape: assignment is the same broadcast-argmin the index
    build uses (no shuffle beyond the scan); candidate pairs are
    generated strictly within a cluster — the SemDeDup design point:
    k is chosen so clusters are small enough that intra-cluster
    pairwise cosine is tractable while cross-cluster pairs (provably
    far) are never materialized. The drop rule is a left-semi/anti
    join on the pair list, map-side broadcastable when the pair list
    is small.

    ``max_cluster_size`` guards the design point against skew: a
    cluster that blows past the cap (dead-centroid attractor,
    boilerplate embeddings) is hash-salted into bounded sub-blocks
    before the pair join — same quadratic-bomb defense as LSH's
    ``max_bucket_size``, at the cost of recall only inside the
    pathological cluster.
    """
    from vector_indexer_spark.operators.dedup import embedding_near_dups  # noqa: PLC0415

    if not -1.0 <= threshold <= 1.0:
        raise ValueError("threshold must be a cosine in [-1, 1]")
    assigned = _nearest_centroid(
        df, centroids, id_col=id_col, vec_col=vec_col
    ).drop("dist2")
    members = df.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).join(assigned.withColumnRenamed("id", id_col), id_col)
    pairs = embedding_near_dups(
        members,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cluster_id",
        threshold=threshold,
        max_block_size=max_cluster_size,
    )
    dropped = (
        pairs.select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return assigned.join(dropped, "id", "left").select(
        F.col("id").alias("vec_id"),
        "cluster_id",
        F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    *,
    k0: float = 60.0,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) of two
    ranked lists — the standard hybrid-retrieval combiner (lexical
    BM25 ⊕ vector ANN): ``score(d) = Σ 1/(k0 + rank_i(d))`` over the
    lists that contain ``d``; ``k0=60`` is the paper's constant.

    Rank-based, so the two lists' incomparable score scales (BM25
    points vs cosine) never need calibration. Returns ``(id, score,
    rank)``, ties broken by id.

    Scale shape: a full-outer join of two top-N lists (N rows each —
    list-sized, not corpus-sized) and a TakeOrdered final rank; the
    expensive retrieval stages run INSIDE their own operators, fusion
    touches only their outputs.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if k0 <= 0:
        raise ValueError("k0 must be positive")
    sa = ranked_a.select(
        F.col(id_col).alias("id"), F.col(rank_col).alias("__ra")
    )
    sb = ranked_b.select(
        F.col(id_col).alias("id"), F.col(rank_col).alias("__rb")
    )
    score = F.coalesce(
        F.lit(1.0) / (F.lit(k0) + F.col("__ra")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("__rb")), F.lit(0.0))
    w = Window.orderBy(F.col("score").desc(), "id")
    return (
        sa.join(sb, "id", "full_outer")
        .select("id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def maxsim_topk(
    chunk_emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_col: str = "query",
    metric: str = "cosine",
) -> DataFrame:
    """Late-interaction retrieval (the ColBERT MaxSim shape at chunk
    granularity): a document's score for a query is the similarity of
    its BEST-matching chunk — long documents are found by their one
    relevant passage instead of being diluted by whole-doc pooling.

    ``chunk_emb`` holds one embedding per chunk with its parent
    ``doc_col``. ``metric``: ``"cosine"`` or ``"dot"`` (use dot when
    the embeddings are already L2-normalized — skips re-deriving
    norms ≈ 1). Returns ``(query_id, rank, doc_id, score)``.

    Scale shape: chunk scoring is scan-local against the broadcast
    query batch; the max-per-(query, doc) is a map-side-combinable MAX
    aggregation (one shuffle, keys = query × matched docs); final
    top-k is a window over doc-level rows.
    """
    from vector_indexer_spark.functions.distance import dot_expr  # noqa: PLC0415

    if k <= 0:
        raise ValueError("k must be positive")
    if metric not in ("cosine", "dot"):
        raise ValueError(f"unknown metric {metric!r}")
    sim = (
        cosine_expr("__q", F.col(vec_col))
        if metric == "cosine"
        else dot_expr("__q", F.col(vec_col))
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_col).alias("__q")
    )
    per_doc = (
        chunk_emb.crossJoin(F.broadcast(q))
        .select(
            "query_id", F.col(doc_col).alias("doc_id"), sim.alias("__sim")
        )
        .groupBy("query_id", "doc_id")
        .agg(F.max("__sim").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "doc_id"
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


# Single-slot reuse of the query-token broadcast: repeated calls with
# the SAME query batch (the bench invokes one pair 4+ times; a serving
# loop re-issues the hot batch constantly) would otherwise pile up one
# executor-resident broadcast per call. The replaced entry is
# unpersisted; only the latest batch stays live. Keyed on content, not
# object identity, so a re-read of the same parquet batch still hits.
_MAXSIM_QBC: dict = {"ctx": None, "key": None, "bc": None}


def _is_integral(df: DataFrame, col: str) -> bool:
    from pyspark.sql import types as T  # noqa: PLC0415

    return isinstance(
        df.schema[col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )


def _maxsim_query_broadcast(spark, qids, qtoks, qmat):
    import hashlib  # noqa: PLC0415

    h = hashlib.sha256()
    for arr in (qids, qtoks, qmat):
        h.update(arr.tobytes())
    key = (qmat.shape, h.hexdigest())
    sc = spark.sparkContext
    cache = _MAXSIM_QBC
    if cache["bc"] is not None and cache["ctx"] is sc and cache["key"] == key:
        return cache["bc"]
    if cache["bc"] is not None and cache["ctx"] is sc:
        try:
            cache["bc"].unpersist()
        except Exception:  # noqa: BLE001 — a dead context is fine to drop
            pass
    bc = sc.broadcast((qids, qtoks, qmat))
    cache.update(ctx=sc, key=key, bc=bc)
    return bc


def _maxsim_per_token_arrow(
    doc_tokens: DataFrame,
    q: DataFrame,
    *,
    doc_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, __qtok, doc_id, __best) via a fold-exact Arrow
    kernel: one ``pairwise_cosine_foldexact`` GEMM-shaped pass per
    doc-token batch against the broadcast query-token matrix, reduced
    to PARTITION-LOCAL per-(doc, query token) maxima before the
    exchange (max is associative — docs straddling batches are merged
    by the global map-side-combinable MAX aggregation). Replaces
    (doc tokens × query tokens) fold-expression rows with
    (docs × query tokens) partial rows on the wire: at 400k tokens ×
    64 query tokens the crossJoin chain evaluates 25.6M interpreted
    array folds; this path does the same flops inside NumPy and ships
    4× fewer rows."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from collections.abc import Iterator  # noqa: PLC0415

    from vector_indexer_spark.functions.kernels import (  # noqa: PLC0415
        pairwise_cosine_foldexact,
        stack_arrays,
    )

    spark = doc_tokens.sparkSession
    # NOTE: this collect is EAGER — building the arrow-path DataFrame
    # runs one Spark job over the (bounded-by-contract) query batch.
    qrows = q.collect()
    out_schema = "query_id long, __qtok long, doc_id long, __best double"
    if not qrows:
        # stack_arrays([]) would yield a (0,)-shaped array and crash the
        # kernel inside executors; the empty result needs no job at all.
        return spark.createDataFrame([], out_schema)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qtoks = np.array([r[1] for r in qrows], dtype=np.int64)
    qmat = stack_arrays([r[2] for r in qrows])
    bc = _maxsim_query_broadcast(spark, qids, qtoks, qmat)

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qtoks_, qmat_ = bc.value
        nq = len(qids_)
        for pdf in batches:
            if pdf.empty:
                continue
            docs = pdf["doc_id"].to_numpy()
            sim = pairwise_cosine_foldexact(
                stack_arrays(pdf["__vec"]), qmat_
            )  # (n_tokens, nq)
            order = np.argsort(docs, kind="stable")
            sdocs = docs[order]
            starts = np.flatnonzero(
                np.r_[True, sdocs[1:] != sdocs[:-1]]
            )
            best = np.maximum.reduceat(sim[order], starts, axis=0)
            udocs = sdocs[starts]
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qids_, len(udocs)),
                    "__qtok": np.tile(qtoks_, len(udocs)),
                    "doc_id": np.repeat(udocs, nq),
                    "__best": best.reshape(-1),
                }
            )

    local = doc_tokens.select(
        F.col(doc_col).alias("doc_id"), F.col(vec_col).alias("__vec")
    ).mapInPandas(_score, out_schema)
    return local.groupBy("query_id", "__qtok", "doc_id").agg(
        F.max("__best").alias("__best")
    )


def maxsim_multivector(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 10,
    *,
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qtok_col: str = "qtok_id",
    query_col: str = "query",
    method: str = "arrow",
) -> DataFrame:
    """Full late-interaction retrieval (Khattab & Zaharia 2020,
    ColBERT): both sides are BAGS of token vectors and
    ``score(q, d) = Σ_{t ∈ q} max_{u ∈ d} cos(t, u)`` — each query
    token independently finds its best-matching document token, so a
    document matches on the union of its aligned terms instead of one
    pooled vector. :func:`maxsim_topk` is the single-vector-query
    special case (best chunk); this is the multi-token query surface.

    Scores are emitted as ``score_micros`` (BIGINT, each per-token max
    floored at 1e-6 resolution before the sum) so the cross-token sum
    is ORDER-FREE — the same integer-unit discipline every aggregating
    oracle in this engine uses; a double sum over a shuffled groupBy
    has no deterministic accumulation order.

    Scale shape: the query batch (all its tokens) broadcasts; token
    scoring is scan-local over the doc-token table; per-(query, token,
    doc) MAX and per-(query, doc) SUM are both map-side-combinable
    aggregations on the same leading keys (one real shuffle + an AQE
    local re-agg); final top-k is a per-query window. The doc-token
    table — the 100 TB side — never shuffles before aggregation keyed
    rows are token-count-bounded. Returns
    ``(query_id, rank, doc_id, score_micros)``.

    ``method``: ``"arrow"`` (default) scores each doc-token batch
    against the whole query-token matrix with
    ``kernels.pairwise_cosine_foldexact`` — the same fold-left IEEE
    sequence as ``cosine_expr``, so results are bit-identical to the
    native path and the oracle (proven by the registered
    ``sim_maxsim_multivector`` oracle, which runs this path) — and
    emits PARTITION-LOCAL (query, qtok, doc) maxima, so the exchange
    carries at most (docs-in-partition × query tokens) rows instead of
    (doc tokens × query tokens). ``"native"`` keeps the pure
    crossJoin + fold-expression chain (the plan the oracle SQL
    mirrors textually).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if method not in ("arrow", "native"):
        raise ValueError(f"unknown method {method!r}")
    q = query_tokens.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qtok_col).alias("__qtok"),
        F.col(query_col).alias("__q"),
    )
    if method == "arrow" and not (
        _is_integral(query_tokens, query_id_col)
        and _is_integral(query_tokens, qtok_col)
        and _is_integral(doc_tokens, doc_col)
    ):
        # the arrow kernel emits long ids; string/decimal id columns
        # keep the native chain, which is id-type agnostic
        method = "native"
    if method == "arrow":
        per_token = _maxsim_per_token_arrow(
            doc_tokens, q, doc_col=doc_col, vec_col=vec_col
        )
    else:
        per_token = (
            doc_tokens.crossJoin(F.broadcast(q))
            .select(
                "query_id",
                "__qtok",
                F.col(doc_col).alias("doc_id"),
                cosine_expr("__q", F.col(vec_col)).alias("__sim"),
            )
            .groupBy("query_id", "__qtok", "doc_id")
            .agg(F.max("__sim").alias("__best"))
        )
    scores = per_token.groupBy("query_id", "doc_id").agg(
        F.sum(
            F.floor(F.col("__best") * F.lit(1_000_000.0)).cast("long")
        ).alias("score_micros")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micros").desc(), "doc_id"
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_micros")
    )


def maxsim_multivector_ann(
    spark: SparkSession,
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    index,
    k: int = 10,
    *,
    token_k: int = 32,
    n_probe: int = 20,
    doc_col: str = "doc_id",
    tok_col: str = "tok_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qtok_col: str = "qtok_id",
    query_col: str = "query",
    vectors: DataFrame | None = None,
) -> DataFrame:
    """ANN-accelerated late interaction (the PLAID / ColBERTv2
    retrieval shape, Santhanam et al. 2022): each query token routes
    through the IVF ``index`` (built over the token vectors,
    ``tok_col`` as its id — ids must be globally unique across docs)
    for its ``token_k`` nearest doc tokens; the union of their parent
    documents is the candidate set, and the exact sum-of-max MaxSim
    (:func:`maxsim_multivector` semantics, order-free integer micros)
    is computed ONLY over candidate docs' full token bags. A document
    none of whose tokens surfaces in any query token's probe is never
    scored — that pruning is the point: the scoring pass touches
    candidate-doc tokens instead of all n_doc_tokens, and the
    candidate pass inherits IVF's partition-pruned probe scan. At full
    probe (``n_probe = index.nlist``) candidate generation is exact
    top-``token_k`` per token, which is how the oracle replays the
    whole chain training-independently. Returns
    ``(query_id, rank, doc_id, score_micros)``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if token_k <= 0:
        raise ValueError("token_k must be positive")
    qt = query_tokens.select(
        F.col(query_id_col).alias("__query"),
        F.col(qtok_col).alias("query_id"),  # search key = the token id
        F.col(query_col).alias("query"),
    )
    # ``vectors``: optional pre-loaded index table (the standard
    # search_index hot-table passthrough) so a repeated-search caller
    # can pin the codes once instead of re-reading the partitioned
    # layout every batch — same contract as the headline IVF bench.
    hits = search_index(
        spark, index, qt.select("query_id", "query"),
        k=token_k, n_probe=n_probe, vectors=vectors,
    )
    tok2doc = doc_tokens.select(
        F.col(tok_col).alias("neighbor_id"), F.col(doc_col).alias("doc_id")
    )
    qtok2query = qt.select(F.col("query_id"), F.col("__query"))
    # hits is contract-bounded (n_query_tokens * token_k rows) — hint it
    # explicitly so the token->doc mapping side (doc-token-table-sized)
    # never shuffles for this join even if AQE misestimates at scale
    cand = (
        F.broadcast(hits).join(tok2doc, "neighbor_id")
        .join(F.broadcast(qtok2query), "query_id")
        .select(F.col("__query").alias("query_id"), "doc_id")
        .distinct()
    )
    # exact MaxSim over the candidates' FULL token bags
    qbag = query_tokens.select(
        F.col(query_id_col).alias("query_id"),
        F.col(qtok_col).alias("__qtok"),
        F.col(query_col).alias("__q"),
    )
    # cand is (n_queries * candidate docs) — also bounded; broadcast so
    # the full doc-token table is pruned by a broadcast semi-probe
    # instead of shuffling on doc_id
    per_token = (
        doc_tokens.select(F.col(doc_col).alias("doc_id"), F.col(vec_col))
        .join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(qbag), "query_id")
        .select(
            "query_id",
            "__qtok",
            "doc_id",
            cosine_expr("__q", F.col(vec_col)).alias("__sim"),
        )
        .groupBy("query_id", "__qtok", "doc_id")
        .agg(F.max("__sim").alias("__best"))
    )
    scores = per_token.groupBy("query_id", "doc_id").agg(
        F.sum(
            F.floor(F.col("__best") * F.lit(1_000_000.0)).cast("long")
        ).alias("score_micros")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micros").desc(), "doc_id"
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_micros")
    )


def mrl_search(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    prefix_dims: int = 16,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: bool = True,
    method: str = "arrow",
) -> DataFrame:
    """Matryoshka-truncated search (Kusupati et al. 2022, MRL):
    shortlist on the FIRST ``prefix_dims`` coordinates — for
    Matryoshka-trained embeddings the prefix is itself a valid
    lower-dimensional embedding — then exact-refine the
    ``refine_factor·k`` shortlist against the full vectors. The
    adaptive-retrieval deployment shape: the scan pass touches
    ``prefix_dims/d`` of the vector bytes (d=768 → 1/48 at prefix 16),
    the refine pass re-pays full width on nq·refine·k rows only.

    Pure composition: sliced exact kNN (scan-local ``slice`` — no
    codes, no training) + the engine's shared ``refine_topk`` stage.
    ``refine=False`` returns the truncated-distance ranking as-is
    (``dist2`` is then the prefix-space distance). Deterministic both
    ways, so the whole chain is SQL-replayed
    (``sim_mrl_search``). Returns
    ``(query_id, rank, neighbor_id, dist2)``.
    """
    from vector_indexer_spark.operators.knn import knn_exact  # noqa: PLC0415
    from vector_indexer_spark.operators.pq import refine_topk  # noqa: PLC0415

    if k <= 0:
        raise ValueError("k must be positive")
    if prefix_dims <= 0:
        raise ValueError("prefix_dims must be positive")
    if refine_factor < 1:
        raise ValueError("refine_factor must be >= 1")
    v_cut = vectors.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, prefix_dims).alias(vec_col)
    )
    q_cut = queries.select(
        "query_id", F.slice(F.col("query"), 1, prefix_dims).alias("query")
    )
    # method: the prefix scan's kNN kernel — default "arrow" (the
    # GEMM batch path, the right choice at corpus scale); "native"
    # (fold expression) available for small-table plan audits. The two
    # are pytest-locked bit-exact (F2), so the oracle covers both.
    shortlist_k = refine_factor * k if refine else k
    hits = knn_exact(
        v_cut, q_cut, k=shortlist_k,
        id_col=id_col, vec_col=vec_col, method=method,
    )
    if not refine:
        return hits
    return refine_topk(
        hits, vectors, queries, k, id_col=id_col, vec_col=vec_col
    )


def mrl_search_ann(
    spark: SparkSession,
    vectors: DataFrame,
    queries: DataFrame,
    index,
    k: int = 10,
    *,
    prefix_dims: int = 16,
    refine_factor: int = 4,
    n_probe: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_vectors: DataFrame | None = None,
) -> DataFrame:
    """Matryoshka search with an INDEXED shortlist — the
    adaptive-retrieval scale rung :func:`mrl_search` stops short of:
    that operator's prefix pass, while reading only ``prefix_dims/d``
    of the bytes, still SCANS every row per query batch. The MRL
    deployment story (Kusupati et al. 2022 §4, "adaptive retrieval")
    is truncate-then-index: build the IVF ``index`` over the
    ``prefix_dims``-sliced corpus once (the index stores the small
    prefix vectors — d=768 → 1/48 the index bytes at prefix 16), route
    the shortlist through its partition-pruned probe scan, then
    exact-refine the ``refine_factor·k`` shortlist against the FULL
    vectors — the identical shared ``refine_topk`` stage brute MRL
    uses, so the two paths differ only in how the shortlist is found.

    ``index_vectors`` passes an already-cached copy of the index's
    persisted prefix table through to ``search_index(vectors=...)`` —
    repeated query batches then hit a pinned scan instead of re-listing
    the partitioned cluster directories per batch (the protocol every
    repeated-batch bench pair uses); results are identical either way.

    At full probe (``n_probe = index.nlist``) the shortlist is the
    exact prefix-space top-``refine_factor·k`` regardless of where
    training put the centroids, so the whole chain replays in SQL
    training-independently (``sim_mrl_ann``) — the same oracle trick
    ``sim_maxsim_ann`` and ``ivf_range_search_full`` use. At
    deployment probes the scan touches ~n_probe/nlist of the prefix
    index. Returns ``(query_id, rank, neighbor_id, dist2)`` with TRUE
    full-width distances.
    """
    from vector_indexer_spark.operators.pq import (  # noqa: PLC0415
        refine_topk,
    )
    from vector_indexer_spark.operators.search import (  # noqa: PLC0415
        search_index,
    )

    if k <= 0:
        raise ValueError("k must be positive")
    if prefix_dims <= 0:
        raise ValueError("prefix_dims must be positive")
    if refine_factor < 1:
        raise ValueError("refine_factor must be >= 1")
    if index.dimension != prefix_dims:
        raise ValueError(
            f"index dimension {index.dimension} != prefix_dims "
            f"{prefix_dims} — build the index over the sliced corpus "
            "(F.slice(vec, 1, prefix_dims))"
        )
    q_cut = queries.select(
        "query_id", F.slice(F.col("query"), 1, prefix_dims).alias("query")
    )
    hits = search_index(
        spark, index, q_cut, k=refine_factor * k, n_probe=n_probe,
        vectors=index_vectors,
    )
    return refine_topk(
        hits, vectors, queries, k, id_col=id_col, vec_col=vec_col
    )


def mine_hard_negatives(
    df: DataFrame,
    *,
    anchors: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: IvfIndex | None = None,
    n_probe: int = 20,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the ``k`` nearest OTHER vectors by L2 — the negatives that sit
    closest to the decision boundary (Xiong et al. 2021, ANCE).
    Returns ``(anchor_id, rank, negative_id, dist2)``.

    Scale path: pass a built ``index`` and the candidate generation
    runs through the probe-pruned ANN scan instead of the brute
    crossJoin — at corpus-sized anchor sets (mining negatives for
    EVERY training example, the production shape) brute force is
    O(n²·d) while ANN touches nprobe/nlist of the corpus per anchor
    batch. Both paths over-fetch ``k+1`` then drop the self-match, so
    an anchor that is not its own nearest neighbor (duplicate vectors)
    still yields exactly ``k`` negatives.
    """
    from vector_indexer_spark.operators.knn import knn_exact  # noqa: PLC0415

    if k <= 0:
        raise ValueError("k must be positive")
    src = anchors if anchors is not None else df
    queries = src.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query")
    )
    if index is not None:
        cand = search_index(
            df.sparkSession, index, queries, k=k + 1, n_probe=n_probe
        )
    else:
        cand = knn_exact(
            df, queries, k=k + 1, id_col=id_col, vec_col=vec_col,
            method="native",
        )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        cand.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias("anchor_id"),
            "rank",
            F.col("neighbor_id").alias("negative_id"),
            "dist2",
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    *,
    lambda_mult: float = 0.5,
    query_id_col: str = "query_id",
    cand_id_col: str = "cand_id",
    vec_col: str = "vec",
    score_col: str = "score",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick, per query, the candidate maximizing
    ``λ·relevance − (1−λ)·max_cosine_to_already_picked`` — the
    diversity pass a retrieval stack runs on its top candidates before
    handing them to a model.

    Input is the per-query candidate set (``query_id, cand_id, vec,
    score``) — list-sized by construction (the output of a top-k
    search), so the greedy loop runs inside ``applyInPandas`` on one
    query's candidates at a time: one query-key shuffle of
    candidate-sized data, each group's O(k·n_cand) NumPy loop local.
    Ties break on candidate id; λ=1 degenerates to pure relevance
    order. Returns ``(query_id, rank, cand_id, mmr_score)``.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    if k <= 0:
        raise ValueError("k must be positive")
    if not 0.0 <= lambda_mult <= 1.0:
        raise ValueError("lambda_mult must be in [0, 1]")

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[cand_id_col].to_numpy()
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        n = len(ids)
        picked: list[int] = []
        max_sim = np.zeros(n)
        out = {"query_id": [], "rank": [], "cand_id": [], "mmr_score": []}
        avail = np.ones(n, dtype=bool)
        for r in range(min(k, n)):
            mmr = lambda_mult * rel - (1.0 - lambda_mult) * (
                max_sim if picked else np.zeros(n)
            )
            mmr_masked = np.where(avail, mmr, -np.inf)
            # argmax with id tie-break: among equal scores take min id
            best_score = mmr_masked.max()
            tied = np.flatnonzero(
                avail & (np.abs(mmr_masked - best_score) < 1e-15)
            )
            j = tied[np.argmin(ids[tied])]
            picked.append(j)
            avail[j] = False
            max_sim = np.maximum(max_sim, unit @ unit[j])
            out["query_id"].append(pdf[query_id_col].iloc[0])
            out["rank"].append(r + 1)
            out["cand_id"].append(ids[j])
            out["mmr_score"].append(float(best_score))
        return pd.DataFrame(out)

    return (
        candidates.select(query_id_col, cand_id_col, vec_col, score_col)
        .groupBy(query_id_col)
        .applyInPandas(
            _mmr,
            "query_id long, rank int, cand_id long, mmr_score double",
        )
    )


def prune_by_prototypicality(
    df: DataFrame,
    centroids,
    *,
    keep_lo: float = 0.0,
    keep_hi: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Prototypicality-band data pruning (the D4 / SSL-prototypes
    recipe, Sorscher et al. NeurIPS'22; Tirumala et al. 2023): rank
    every row by squared distance to its nearest cluster centroid and
    keep only the percentile band ``[keep_lo, keep_hi)`` WITHIN each
    cluster. ``keep_lo > 0`` drops the most prototypical rows (the
    easy, redundant core the papers show is safe to shed at scale);
    ``keep_hi < 1`` drops the far tail (off-manifold noise — the
    threshold twin of :func:`embedding_outliers`); both give the
    middle band.

    The band test is integer-exact — ``keep_lo``/``keep_hi`` become
    parts-per-million and the condition is
    ``lo_ppm·cnt ≤ (rn−1)·1e6 < hi_ppm·cnt`` on BIGINTs — so the
    selection is oracle-reproducible with no float percentile on
    either engine. Rank ties break by id (the engine-wide contract).

    Plan shape: the J1 codegen argmin (broadcast centroid cross join,
    zero shuffle) feeds ONE ``cluster_id`` hash shuffle for the
    per-cluster rank window + count — clusters spread across the
    executors, so the sort is per-cluster, not global. At 100 TB the
    same band can be cut without the window: derive per-cluster dist2
    thresholds from ``hdr_quantiles`` and filter scan-locally (the
    documented lever; this operator is the exact-rank form).

    Returns the kept rows as ``(id, cluster_id, dist2, cluster_rank,
    cluster_count)`` — the rank metadata kept so downstream curricula
    can reuse the ordering without recomputing it.
    """
    if not (0.0 <= keep_lo < keep_hi <= 1.0):
        raise ValueError("need 0 <= keep_lo < keep_hi <= 1")
    lo_ppm = int(round(keep_lo * 1_000_000))
    hi_ppm = int(round(keep_hi * 1_000_000))
    nearest = _nearest_centroid(df, centroids, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("cluster_id").orderBy("dist2", "id")
    wc = Window.partitionBy("cluster_id")
    ranked = nearest.withColumn(
        "cluster_rank", F.row_number().over(w)
    ).withColumn("cluster_count", F.count(F.lit(1)).over(wc))
    pos = (F.col("cluster_rank") - 1).cast("long") * F.lit(1_000_000)
    cnt = F.col("cluster_count").cast("long")
    return ranked.filter(
        (pos >= F.lit(lo_ppm) * cnt) & (pos < F.lit(hi_ppm) * cnt)
    ).select("id", "cluster_id", "dist2", "cluster_rank", "cluster_count")
