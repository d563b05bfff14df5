"""Deduplication + similarity operators for training-data pipelines.

Post-parity extensions (SURVEY §7 Phase 6): the operations a 100 TB
LLM-data pipeline runs over a ``documents`` table. Design rules:

- **never all-pairs**: every near-dup operator generates candidate
  pairs through a *blocking key* (LSH band bucket, simhash band,
  cluster/label) and only scores within buckets. The candidate join is
  a shuffle on the bucket key; skewed buckets are AQE's problem
  (skew-join splitting is on in our session factory).
- **JVM expressions only** in the hot path (functions.text primitives
  are Catalyst folds) — no Python UDFs.
- every operator is deterministic and mirrored by a DuckDB oracle.

MinHash constants: ``num_hashes`` seeded affine permutations
``h_i(x) = (a_i·x + b_i) mod 2^31-1`` with banding for LSH; SimHash is
the classic 32-bit sign-of-weighted-bit-sums over token hashes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_indexer_spark.functions.distance import cosine_expr
from vector_indexer_spark.functions.text import (
    HASH_MOD,
    shingle_hashes_expr,
    token_hash_expr,
    tokens_expr,
)

MINHASH_SEED = 1_000_003


def minhash_params(num_hashes: int, seed: int = MINHASH_SEED) -> list[tuple[int, int]]:
    """Seeded (a, b) affine coefficients, a ∈ [1, p), b ∈ [0, p)."""
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, HASH_MOD)), int(rng.integers(0, HASH_MOD)))
        for _ in range(num_hashes)
    ]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def normalized_text_expr(col):
    """Canonical text form for near-exact dedup: lowercase, whitespace
    runs collapsed to single spaces, trimmed. Catches the
    capitalization/formatting re-posts that byte-exact hashing misses."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dup_groups(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Exact duplicate groups by sha256(text): one row per duplicated
    content hash with the canonical (min) id and the group size.

    Pure hash-groupBy — at 100 TB this is one shuffle on a 64-hex-char
    key with map-side partial aggregation. ``normalize`` hashes the
    canonical text form (case/whitespace-insensitive) instead of the
    raw bytes.
    """
    key = (
        normalized_text_expr(text_col) if normalize else F.col(text_col)
    )
    return (
        df.select(
            F.sha2(key, 256).alias("content_hash"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def dedup_exact(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id row of every exact-content group (all columns)."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_sig_columns(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
    include_shingleless: bool = True,
) -> DataFrame:
    """(doc_id, s0..s{num_hashes-1}) MinHash signature columns.

    Physical shape: posexplode tokens, build k-shingles with window
    ``lead`` (plain codegen-friendly expressions — a nested
    higher-order-function formulation runs interpreted at ~12 µs per
    shingle, ~10× slower), hash each shingle once, then one
    groupBy(doc_id) with ``num_hashes`` map-side-combinable MIN
    aggregates. Duplicate shingles are NOT removed first: MIN is
    idempotent under duplicates, so the distinct pass would be pure
    cost. Docs with < k tokens get the sentinel p via the left join.

    ``include_shingleless=False`` skips that reattach join (one scan of
    ``df`` plus one join dropped from the plan): per-column mins are
    strictly < HASH_MOD by construction, so the inner result equals the
    reattached one filtered on ``s0 != HASH_MOD`` — the exact filter the
    LSH banding paths apply.
    """
    from vector_indexer_spark.functions.text import token_hash_expr

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(w) for i in range(1, shingle_k)
    ]
    sh = tok.select(
        "doc_id",
        F.concat_ws(" ", *parts).alias("shingle"),
        parts[-1].alias("__last"),
    ).filter(F.col("__last").isNotNull())
    hs = sh.select(
        "doc_id",
        (token_hash_expr(F.col("shingle")) % F.lit(HASH_MOD)).alias("h"),
    )
    aggs = [
        F.coalesce(
            F.min(
                (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(HASH_MOD)
            ),
            F.lit(HASH_MOD),
        ).alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    sig = hs.groupBy("doc_id").agg(*aggs)
    if not include_shingleless:
        return sig
    # reattach shingle-less docs with the sentinel signature
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(sig, "doc_id", "left").select(
        "doc_id",
        *[
            F.coalesce(F.col(f"s{i}"), F.lit(HASH_MOD)).alias(f"s{i}")
            for i in range(num_hashes)
        ],
    )


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, signature ARRAY<BIGINT>) — array view of the signature."""
    cols = minhash_sig_columns(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        shingle_k=shingle_k,
    )
    return cols.select(
        "doc_id",
        F.array(*[F.col(f"s{i}") for i in range(num_hashes)]).alias("signature"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """MinHash-LSH blocking: docs sharing any band of the signature
    become a candidate pair (id_a < id_b, distinct).

    The self-join shuffles on the band-bucket key only — candidate
    volume is Σ_bucket |bucket|², never n². Two skew guards keep that
    sum bounded on web-scale corpora:

    - **shingle-less docs never band.** Docs with < ``shingle_k``
      tokens carry the all-sentinel signature; banding them would
      collide *every* short doc with every other one in every band
      (10⁸ short docs → 10¹⁶ candidate pairs). They cannot be
      shingle-Jaccard near-dups (empty shingle set ⇒ J = 0), so they
      are excluded before banding.
    - **oversized buckets are dropped** (``max_bucket_size``, default
      100k): a bucket that large is mass-duplicated boilerplate, which
      belongs to :func:`exact_dup_groups` — run exact dedup first, then
      LSH on the survivors. ``None`` disables the cap.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    # shingle-less docs cannot near-dup (J = 0) and must not band, so
    # skip the sentinel reattach entirely: the inner aggregate equals
    # the reattached frame filtered on s0 != HASH_MOD (per-column mins
    # are strictly < HASH_MOD), minus one docs scan and one join
    sig = minhash_sig_columns(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        shingle_k=shingle_k, include_shingleless=False,
    )
    # sig feeds the self-join twice (left/right) and, with the cap, the
    # bucket-count branch too — Catalyst does not reuse the MinHash
    # aggregation exchange across those branches (verified: 4x subtree
    # recomputation in the executed plan), so pin the compact per-doc
    # signature table (n x num_hashes ints; the exploded banding stays
    # lazy — caching IT is slower than recomputing it). Same pattern as
    # _search_native's probes: no explicit unpersist, the
    # ContextCleaner drops the blocks when the plan is dropped.
    sig = sig.persist()
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[F.col(f"s{b * rows + r}") for r in range(rows)],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        # the oversized-bucket list is tiny by definition (≤ n/cap
        # buckets can exceed the cap), so: map-side-combined count →
        # filter → broadcast anti-join. The only extra shuffle carries
        # partial (band, bucket) counts, never the banded rows.
        big = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(
            F.broadcast(big), ["band", "bucket"], "left_anti"
        )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard verification
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B| over
    distinct hashed shingles. ``pairs`` carries (id_a, id_b).

    Shingle sets are computed only for docs that appear in a pair
    (semi-join first) — after LSH blocking that is a small fraction of
    the corpus.
    """
    ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        df.join(ids, df[id_col] == ids["doc_id"], "left_semi")
        .select(
            F.col(id_col).alias("doc_id"),
            F.array_sort(shingle_hashes_expr(text_col, shingle_k)).alias("sh"),
        )
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (
        F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias(
                "jaccard"
            ),
        )
    )


def near_dup_minhash(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """End-to-end near-dup: LSH candidates → exact Jaccard filter."""
    cand = lsh_candidate_pairs(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        bands=bands, shingle_k=shingle_k, max_bucket_size=max_bucket_size,
    )
    return jaccard_pairs(
        df, cand, text_col=text_col, id_col=id_col, shingle_k=shingle_k
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# Duplicate-group resolution (connected components over dup pairs)
# ---------------------------------------------------------------------------


def resolve_duplicate_groups(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_pairs_driver: int = 5_000_000,
) -> DataFrame:
    """Assign every doc its duplicate-group canonical id (the min id
    reachable through the pair graph); docs in no pair are their own
    canonical. The keep-list of a dedup pass is
    ``filter(doc_id == canonical_id)``.

    Pair sets arrive post-blocking (LSH/threshold), so they are orders
    of magnitude smaller than the corpus. Up to ``max_pairs_driver``
    distinct pairs, union-find runs on the driver over the collected
    edges (the corpus itself is never collected — the final labeling
    is a broadcast join). Beyond the bound the resolver switches to
    distributed min-label propagation (:func:`_propagate_min_labels`),
    which never materializes the edge list on the driver.
    """
    dist = pairs.select("id_a", "id_b").distinct().persist()
    try:
        n_pairs = dist.count()
        if n_pairs > max_pairs_driver:
            mdf = _propagate_min_labels(dist)
            return _canonical_from_components(df, mdf, id_col, broadcast=False)

        edge_rows = dist.collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in edge_rows:
            ra, rb = find(int(r.id_a)), find(int(r.id_b))
            if ra != rb:
                # union by min id: the root is the component's min PAIR id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

        mapping = [(x, find(x)) for x in list(parent)]
        spark = df.sparkSession
        if not mapping:
            ids = df.select(F.col(id_col).alias("doc_id"))
            return ids.select("doc_id", F.col("doc_id").alias("canonical_id"))
        mdf = spark.createDataFrame(mapping, "doc_id long, component long")
        return _canonical_from_components(df, mdf, id_col, broadcast=True)
    finally:
        dist.unpersist()


def _propagate_min_labels(
    edges: DataFrame, *, max_iter: int = 50
) -> DataFrame:
    """Distributed connected components over an (id_a, id_b) edge list:
    iterative min-label propagation with pointer jumping.

    Each round every node takes the min label among itself, its
    neighbors' labels, and its label's label (pointer jump), so chain
    diameter collapses roughly geometrically — O(log d) rounds for
    diameter d, each round a pair of shuffles on node id. State is
    localCheckpoint-ed per round to truncate lineage. Returns
    (doc_id, component) for every node appearing in an edge.
    """
    sym = edges.select(
        F.col("id_a").alias("node"), F.col("id_b").alias("nbr")
    ).union(
        edges.select(F.col("id_b").alias("node"), F.col("id_a").alias("nbr"))
    ).persist()
    lab = (
        sym.groupBy("node")
        .agg(F.min("nbr").alias("nbr_min"))
        .select("node", F.least("node", "nbr_min").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_lab = (
            sym.join(
                lab.select(
                    F.col("node").alias("nbr"), F.col("label").alias("nl")
                ),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("nl").alias("nbr_label"))
        )
        new = lab.join(nbr_lab, "node", "left").select(
            "node",
            F.least(
                "label", F.coalesce("nbr_label", "label")
            ).alias("label"),
        )
        # pointer jump: label ← label(label) when the label is a node
        # (node is unique in `new`, so this is a plain keyed lookup)
        jump = new.select(
            F.col("node").alias("label"), F.col("label").alias("jump_label")
        )
        new = new.join(jump, "label", "left").select(
            "node",
            F.least(
                "label", F.coalesce("jump_label", "label")
            ).alias("label"),
        ).localCheckpoint()
        changed = (
            new.alias("n")
            .join(lab.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        lab = new
        if changed == 0:
            break
    sym.unpersist()
    return lab.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def _canonical_from_components(
    df: DataFrame, mdf: DataFrame, id_col: str, *, broadcast: bool
) -> DataFrame:
    """(doc_id, canonical_id) from a (doc_id, component) mapping.

    canonical = min id of the component that is PRESENT IN df — the
    pair graph may reference ids df no longer carries (e.g. pairs
    computed before a quality filter); anchoring on the min pair id
    would make filter(doc_id == canonical_id) drop whole groups.
    """
    ids = df.select(F.col(id_col).alias("doc_id"))
    m = F.broadcast(mdf) if broadcast else mdf
    labeled = ids.join(m, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )
    canon = labeled.groupBy("component").agg(
        F.min("doc_id").alias("canonical_id")
    )
    return labeled.join(canon, "component").select("doc_id", "canonical_id")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Classic SimHash over token hashes: bit b of the output is set
    iff Σ_tokens (±1 by bit b of hash(token)) > 0.

    One explode + one groupBy (map-side combinable sums) — no UDF.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(text_col)).alias("tok"),
    ).withColumn("h", token_hash_expr(F.col("tok")))
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sums.select("doc_id", out.alias("simhash"))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (blocked)
# ---------------------------------------------------------------------------


def embedding_near_dups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.9,
    max_block_size: int | None = 100_000,
    method: str = "arrow",
) -> DataFrame:
    """Cosine near-duplicate pairs within a blocking key.

    ``block_col`` is the candidate-generation key (a cluster id from
    :func:`~vector_indexer_spark.operators.kmeans.assign_clusters`, a
    label, an LSH bucket, …). With ``None`` it degrades to all-pairs —
    only for tiny test tables, never at scale.

    **Oversized blocks are salted into sub-blocks** (``max_block_size``,
    default 100k): a block of size s > cap is split into ceil(s/cap)
    deterministic hash sub-blocks and pairs are generated only within
    a sub-block. Without this, one skewed block (a dead-centroid
    attractor cluster, a boilerplate label) is a quadratic bomb — the
    same failure mode :func:`lsh_candidate_pairs` caps with
    ``max_bucket_size``. The trade is recall inside the pathological
    block only (cross-sub-block pairs are not compared); normal-sized
    blocks are untouched. ``None`` disables (tests only).

    ``method='arrow'`` (default) scores the joined pairs with
    ``kernels.rowwise_cosine_foldexact`` — bit-identical to the
    ``'native'`` ``cosine_expr`` fold (same IEEE sequence, column-wise
    vectorized; interpreted HOF folds measured ~10x slower on
    multi-million-pair frames). Requires integer-typed ids; the
    registered oracle runs the arrow path, proving its exactness.
    """
    sel = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        (F.col(block_col) if block_col else F.lit(0)).alias("blk"),
    )
    if max_block_size is not None:
        if max_block_size <= 0:
            raise ValueError("max_block_size must be positive")
        wb = Window.partitionBy("blk")
        n_sub = F.ceil(
            F.count("*").over(wb) / F.lit(float(max_block_size))
        ).cast("long")
        sub = F.when(
            n_sub > 1, F.pmod(F.xxhash64(F.col("vid")), n_sub)
        ).otherwise(F.lit(0))
        sel = sel.withColumn(
            "blk",
            F.concat_ws(
                "#", F.col("blk").cast("string"), sub.cast("string")
            ),
        )
    a, b = sel.alias("a"), sel.alias("b")
    proj = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.vid") < F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("id_a"),
        F.col("b.vid").alias("id_b"),
        F.col("a.vec").alias("__va"),
        F.col("b.vec").alias("__vb"),
    )
    return cosine_score_pairs(proj, method=method).filter(
        F.col("cosine") >= threshold
    )


def cosine_score_pairs(proj: DataFrame, *, method: str = "arrow") -> DataFrame:
    """Score ``(id_a, id_b, __va, __vb)`` pair rows → ``(id_a, id_b,
    cosine)``. The shared verify-stage scorer: ``'native'`` is the
    fold-left ``cosine_expr`` Catalyst expression, ``'arrow'`` (the
    scale default) is ``kernels.rowwise_cosine_foldexact`` — the SAME
    IEEE operation sequence vectorized across rows, bit-identical
    output (interpreted HOF folds measured ~10x slower on
    multi-million-pair frames). Arrow requires integer-typed ids.
    """
    if method not in ("arrow", "native"):
        raise ValueError("method must be 'arrow' or 'native'")
    if method == "native":
        return proj.select(
            "id_a",
            "id_b",
            cosine_expr(F.col("__va"), F.col("__vb")).alias("cosine"),
        )

    def _score(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        from vector_indexer_spark.functions.kernels import (  # noqa: PLC0415
            rowwise_cosine_foldexact,
        )

        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "cosine": rowwise_cosine_foldexact(
                        np.stack(pdf["__va"].to_numpy()),
                        np.stack(pdf["__vb"].to_numpy()),
                    ),
                }
            )

    return proj.mapInPandas(_score, "id_a long, id_b long, cosine double")


# ---------------------------------------------------------------------------
# Decontamination — remove training documents that leak evaluation data.
# The standard pre-training hygiene step (exact + n-gram overlap tiers,
# the public GPT-3/PaLM-style 8-gram collision rule).
# ---------------------------------------------------------------------------


def decontaminate_exact(
    corpus: DataFrame,
    blocklist: DataFrame,
    *,
    text_col: str = "text",
    block_text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Drop corpus rows whose (normalized) text appears verbatim in the
    blocklist — all corpus columns pass through.

    Plan: anti-join on the content hash. The blocklist (an eval set —
    thousands of rows, not billions) is broadcast, so the corpus never
    shuffles; at 100 TB this is a scan + broadcast filter.
    """
    key = (
        normalized_text_expr(F.col(text_col))
        if normalize
        else F.col(text_col)
    )
    bkey = (
        normalized_text_expr(F.col(block_text_col))
        if normalize
        else F.col(block_text_col)
    )
    blocked = blocklist.select(F.sha2(bkey, 256).alias("__bh")).distinct()
    tmp = "__h"
    while tmp in corpus.columns:  # never clobber a caller's column
        tmp += "_"
    return (
        corpus.withColumn(tmp, F.sha2(key, 256))
        .join(F.broadcast(blocked), F.col(tmp) == F.col("__bh"), "left_anti")
        .drop(tmp)
    )


def decontaminate_ngram(
    corpus: DataFrame,
    blocklist: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_text_col: str = "text",
) -> DataFrame:
    """Drop corpus rows sharing ANY word n-gram with the blocklist (the
    8-gram eval-contamination rule). Returns the surviving rows, all
    columns intact.

    Plan: the blocklist's distinct n-gram hash set is built once
    (eval-set-sized) and broadcast; each corpus doc is dropped iff its
    shingle array intersects it — an anti-join on the exploded corpus
    shingles restricted by the broadcast set, so the full corpus text
    shuffles nowhere.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    bgrams = (
        blocklist.select(
            F.explode(
                shingle_hashes_expr(block_text_col, n)
            ).alias("__g")
        )
        .distinct()
    )
    hit = (
        corpus.select(
            F.col(id_col).alias("__cid"),
            F.explode(shingle_hashes_expr(text_col, n)).alias("__g"),
        )
        .join(F.broadcast(bgrams), "__g")
        .select("__cid")
        .distinct()
    )
    # NO broadcast hint on `hit`: unlike the eval-set-sized shingle set,
    # the contaminated-doc-id set scales with the corpus (boilerplate
    # shared with the eval set can implicate a large fraction of
    # documents) — let the planner pick broadcast vs shuffle from its
    # size estimate.
    return corpus.join(
        hit,
        corpus[id_col] == hit["__cid"],
        "left_anti",
    )


def remove_boilerplate_paragraphs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = ". ",
    max_docs: int = 5,
    min_chars: int = 10,
) -> DataFrame:
    """Boilerplate removal at paragraph granularity (the RefinedWeb /
    Lee et al. line-dedup shape): a paragraph whose normalized form
    appears in more than ``max_docs`` DISTINCT documents is stripped
    from every document; surviving paragraphs are rejoined in their
    original order. Paragraphs shorter than ``min_chars`` are exempt
    (connectives like "Yes" would otherwise be nuked corpus-wide).

    Plan shape: posexplode → one (hash) aggregation for the distinct-
    doc counts → broadcast-able semi-join of the boilerplate set back
    onto the exploded rows → re-assembly via ``array_join(collect_list
    over position window)``. Two bounded shuffles (hash counts + doc
    regroup); the boilerplate set is vocabulary-sized (it only holds
    hashes seen in > max_docs docs).

    Returns ``(doc_id, text, n_removed)`` — text with boilerplate
    stripped, and the per-doc removed-paragraph count.
    """
    import re  # noqa: PLC0415

    # F.split takes a REGEX: escape the literal separator (an unescaped
    # ". " would split on <any char><space> and eat word endings)
    parts = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep), -1)
        ).alias("pos", "para"),
    ).withColumn(
        "phash",
        F.sha2(F.lower(F.trim(F.col("para"))), 256),
    )
    boiler = (
        parts.filter(F.length(F.trim("para")) >= min_chars)
        .groupBy("phash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .select("phash")
    )
    kept = parts.join(F.broadcast(boiler), "phash", "left_anti")
    removed = parts.join(F.broadcast(boiler), "phash", "semi").groupBy(
        "doc_id"
    ).agg(F.count("*").alias("n_removed"))
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "para"))
                    ),
                    lambda s: s.para,
                ),
                sep,
            ).alias("text")
        )
    )
    return (
        rebuilt.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )


def decontaminate_semantic(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """Drop corpus rows whose embedding is near-duplicate (cosine ≥
    ``threshold``) of ANY evaluation vector — the semantic tier of
    decontamination, catching paraphrases the exact/n-gram tiers
    (``decontaminate_exact`` / ``decontaminate_ngram``) miss. All
    corpus columns pass through for survivors.

    Plan: the eval side (an eval set — thousands of vectors, not
    billions) broadcasts; each corpus partition scores its rows
    against the full eval matrix scan-locally (broadcast nested loop
    — deliberate: the build side is eval-sized) and contaminated ids
    anti-join out. The corpus never shuffles. For an eval set too
    large to broadcast, pre-block both sides with
    ``similarity.cosine_near_dup_rhp``'s banded signatures and run
    this check within buckets only.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    from vector_indexer_spark.functions.distance import cosine_expr  # noqa: PLC0415

    ev = F.broadcast(
        eval_set.select(F.col(eval_vec_col).alias("__evec"))
    )
    contaminated = (
        corpus.select(F.col(id_col).alias("__cid"), F.col(vec_col))
        .crossJoin(ev)
        .filter(
            cosine_expr(F.col(vec_col), F.col("__evec"))
            >= F.lit(float(threshold))
        )
        .select("__cid")
        .distinct()
    )
    return corpus.join(
        contaminated,
        corpus[id_col] == contaminated["__cid"],
        "left_anti",
    )


def jaccard_similarity_join(
    df: DataFrame,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT set-similarity self-join: every pair of documents whose
    token-SET Jaccard ≥ ``threshold`` — the prefix-filtering algorithm
    (AllPairs/PPJoin family, Bayardo et al. 2007 / Xiao et al. 2008).
    Complements MinHash-LSH: LSH is probabilistic blocking with a
    recall curve; this is exact — no missed pairs, no false pairs —
    at the cost of a candidate set governed by the prefix lists.

    Algorithm: order all tokens by ascending document frequency
    (rarest first, ties by token); a doc with n tokens emits only its
    first ``n − ⌈t·n⌉ + 1`` tokens as "prefix" keys — two sets with
    Jaccard ≥ t MUST share a prefix token under any global order, so
    equi-joining prefixes loses nothing; exact verification then
    filters the candidates. All threshold arithmetic is integer
    (micros), so the boundary is bit-stable and oracle-checkable.

    Returns ``(id_a, id_b, n_int, n_union)`` with id_a < id_b;
    Jaccard = n_int/n_union. Empty-token documents never pair.

    Scale shape: one token-df aggregation; prefix explode is ≤
    (1−t)·|tokens| of the corpus; the candidate join shuffles on the
    prefix token — rare tokens by construction, so lists stay short
    EXCEPT for heavy prefix tokens, which the rarest-first order
    minimizes; verification touches candidates only. The classic
    skew guard (length filter |a|·t ≤ |b| inside the join) is
    included.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    t_micros = int(round(threshold * 1_000_000))
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(tokens_expr(text_col)).alias("toks"),
    ).filter(F.size("toks") >= 1)
    tok = docs.select(
        "doc_id", F.explode("toks").alias("token")
    )
    dfreq = tok.groupBy("token").agg(F.count("*").alias("df"))
    # global rarest-first order, materialized per doc as a sorted
    # (df, token) struct array — deterministic total order
    ranked = (
        tok.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("df", "token"))
            ).alias("rts")
        )
        .select(
            "doc_id",
            F.col("rts.token").alias("rtoks"),
            F.size("rts").alias("n"),
        )
    )
    # prefix length p = n − ⌈t·n⌉ + 1, ceil in exact integer micros
    req = F.floor(
        (F.col("n") * F.lit(t_micros) + F.lit(999_999)) / F.lit(1_000_000)
    ).cast("long")
    prefixed = ranked.select(
        "doc_id",
        "rtoks",
        "n",
        F.slice(
            "rtoks", 1, (F.col("n") - req + F.lit(1)).cast("int")
        ).alias("prefix"),
    )
    sides = prefixed.select(
        "doc_id", "n", "rtoks", F.explode("prefix").alias("ptok")
    )
    a, b = sides.alias("a"), sides.alias("b")
    # length filter: |a| ≥ t·|b| is necessary for Jaccard ≥ t (a ≤ b)
    cand = (
        a.join(
            b,
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n"), F.col("b.n")) * F.lit(1_000_000)
                >= F.greatest(F.col("a.n"), F.col("b.n"))
                * F.lit(t_micros)
            ),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.rtoks").alias("ta"),
            F.col("b.rtoks").alias("tb"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    n_int = F.size(F.array_intersect("ta", "tb")).cast("long")
    verified = cand.select(
        "id_a",
        "id_b",
        n_int.alias("n_int"),
        (F.col("na") + F.col("nb") - n_int).cast("long").alias("n_union"),
    ).filter(
        F.col("n_int") * F.lit(1_000_000)
        >= F.lit(t_micros) * F.col("n_union")
    )
    return verified.orderBy("id_a", "id_b")


def edit_distance_verify(
    pairs: DataFrame,
    docs: DataFrame,
    *,
    max_distance: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Final verification tier of the dedup ladder: exact Levenshtein
    distance on candidate pairs (from LSH / SimHash / Jaccard-join
    blocking), keeping pairs within ``max_distance`` edits — the
    strictest near-dup criterion, run ONLY on the blocked candidates
    (edit distance is quadratic per pair; never corpus×corpus).

    Plan: two hash joins attach the texts (candidate-sized, not
    corpus-sized, on the build side of nothing), then the codegen
    ``levenshtein`` per pair. Returns (id_a, id_b, edit_distance).
    """
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    ta = docs.select(
        F.col(id_col).alias(a_col), F.col(text_col).alias("__ta")
    )
    tb = docs.select(
        F.col(id_col).alias(b_col), F.col(text_col).alias("__tb")
    )
    return (
        pairs.select(a_col, b_col)
        .join(ta, a_col)
        .join(tb, b_col)
        .select(
            a_col,
            b_col,
            F.levenshtein("__ta", "__tb").cast("long").alias(
                "edit_distance"
            ),
        )
        .filter(F.col("edit_distance") <= max_distance)
        .orderBy(a_col, b_col)
    )


# ---------------------------------------------------------------------------
# Incremental (delta-vs-corpus) dedup
# ---------------------------------------------------------------------------
#
# A production corpus is never re-deduplicated from scratch: each crawl
# or ingest DELTA is deduped against the standing corpus using a small
# persisted *manifest* (content hashes for exact dedup, banded MinHash
# buckets for near-dup), then the manifest is advanced with the
# survivors. At 100 TB the manifest is the only corpus-sized state that
# participates per batch, and it is hash/bucket-keyed — persist it
# bucketed on its key and the per-batch join is a zero-shuffle
# sort-merge against delta-sized shuffled data. The reference engine
# has no incremental story (full rebuild, src/ivf_index.rs); this is a
# Spark-first extension in the spirit of its streaming ingest.


def content_hash_manifest(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """(content_hash, keep_id) — the exact-dedup state to persist
    between batches. One hash-key shuffle with map-side combine; the
    manifest has one row per distinct content, not per doc."""
    key = normalized_text_expr(text_col) if normalize else F.col(text_col)
    return (
        df.select(
            F.sha2(key, 256).alias("content_hash"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"))
    )


def dedup_incremental_exact(
    new_df: DataFrame,
    manifest: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
    bloom_bits: int | None = None,
) -> DataFrame:
    """Delta-batch survivors vs a standing corpus: rows of ``new_df``
    whose content hash is absent from ``manifest`` AND that are the
    min-id representative of their content within the batch (a batch
    can carry internal copies too). Returns all columns of ``new_df``.

    Physical shape: hash each delta row once, window-dedup within the
    batch (delta-sized shuffle), then LEFT ANTI join against the
    manifest on the hash key. The anti-join shuffles only the delta
    when the manifest is pre-bucketed on ``content_hash``; with
    ``bloom_bits`` set, a broadcast Bloom filter built from the DELTA
    (the small side!) prunes the manifest scan first, so a 100 TB
    manifest is reduced to candidate rows before its exchange —
    exactness is unaffected (Bloom has no false negatives and the
    anti-join removes false positives).
    """
    key = normalized_text_expr(text_col) if normalize else F.col(text_col)
    hashed = new_df.withColumn("__chash", F.sha2(key, 256))
    w = Window.partitionBy("__chash").orderBy(F.col(id_col))
    batch_kept = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    m = manifest.select(F.col("content_hash").alias("__chash"))
    if bloom_bits is not None:
        from vector_indexer_spark.operators.sketches import bloom_prefilter

        m = bloom_prefilter(
            m, batch_kept.select("__chash"), "__chash", m_bits=bloom_bits
        )
    return batch_kept.join(m, "__chash", "left_anti").drop("__chash")


def banded_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, band, bucket) — the near-dup LSH state to persist
    between batches (the banded MinHash bucket table; text is NOT part
    of the manifest). Shingle-less docs are excluded before banding
    for the same reason as :func:`lsh_candidate_pairs` — the
    all-sentinel signature would collide every short doc with every
    other one."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sig = minhash_sig_columns(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        shingle_k=shingle_k, include_shingleless=False,
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[F.col(f"s{b * rows + r}") for r in range(rows)],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def incremental_lsh_candidates(
    new_df: DataFrame,
    manifest: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """(new_id, corpus_id) near-dup candidates between a delta batch
    and the standing corpus, from shared MinHash band buckets.

    The corpus never re-shingles: its side of the join is the
    persisted :func:`banded_signatures` manifest. Only the delta pays
    signature computation, and the bucket join is delta×manifest (an
    equi-join on (band, bucket)), NOT a corpus self-join. Oversized
    buckets — mass boilerplate that belongs to exact dedup — are
    dropped by their size in the UNION of both sides, mirroring the
    batch path's cap so incremental and from-scratch runs agree.
    """
    delta = banded_signatures(
        new_df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        bands=bands, shingle_k=shingle_k,
    )
    if max_bucket_size is not None:
        both = delta.unionByName(manifest)
        big = (
            both.groupBy("band", "bucket")
            .agg(F.count("*").alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket_size)
            .select("band", "bucket")
        )
        delta = delta.join(F.broadcast(big), ["band", "bucket"], "left_anti")
        manifest = manifest.join(
            F.broadcast(big), ["band", "bucket"], "left_anti"
        )
    d = delta.alias("d")
    m = manifest.alias("m")
    return (
        d.join(
            m,
            (F.col("d.band") == F.col("m.band"))
            & (F.col("d.bucket") == F.col("m.bucket")),
        )
        .select(
            F.col("d.doc_id").alias("new_id"),
            F.col("m.doc_id").alias("corpus_id"),
        )
        .distinct()
    )


def dedup_incremental_near(
    new_df: DataFrame,
    corpus_df: DataFrame,
    manifest: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """(new_id, corpus_id, jaccard) verified near-dup matches of the
    delta against the corpus: LSH candidates from the banded manifest,
    then exact shingle-Jaccard verification ≥ ``threshold``.

    Verification needs both texts, but only for docs that appear in a
    candidate pair — :func:`jaccard_pairs` semi-joins the union frame
    down to exactly those docs before shingling, so the corpus scan it
    pays is candidate-sized, not corpus-sized. Requires delta/corpus
    id spaces to be disjoint (true for monotonic ingest ids).
    """
    cand = incremental_lsh_candidates(
        new_df, manifest, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
    ).select(F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b"))
    both = new_df.select(F.col(id_col), F.col(text_col)).unionByName(
        corpus_df.select(F.col(id_col), F.col(text_col))
    )
    return (
        jaccard_pairs(
            both, cand, text_col=text_col, id_col=id_col,
            shingle_k=shingle_k,
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").alias("new_id"),
            F.col("id_b").alias("corpus_id"),
            "jaccard",
        )
    )


def resolve_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    max_pairs_driver: int = 5_000_000,
) -> DataFrame:
    """(doc_id, canonical_id, keep_id) — duplicate-group resolution
    that keeps the BEST document of each group instead of the lowest
    id: ``keep_id`` is the group's argmax-``quality_col`` doc, ties
    broken toward the lower id. Docs in no pair keep themselves.

    Real cleaning pipelines resolve near-dup groups this way (keep the
    longest / highest-quality variant, drop the mangled re-posts);
    min-id keep is only right when copies are byte-identical. Group
    labels come from :func:`resolve_duplicate_groups` (driver
    union-find under ``max_pairs_driver`` distinct pairs, distributed
    min-label propagation beyond). The argmax is a groupBy over
    (canonical_id) with a single struct-MIN aggregate — map-side
    combinable, no per-group sort, unlike a window formulation — and
    the winners table (one row per group) joins back on the group key.
    """
    canon = resolve_duplicate_groups(
        df, pairs, id_col=id_col, max_pairs_driver=max_pairs_driver
    )
    q = df.select(
        F.col(id_col).alias("doc_id"), F.col(quality_col).alias("__q")
    )
    labeled = canon.join(q, "doc_id")
    # min over (-quality, id): argmax quality with min-id tie-break.
    # Spark normalizes -0.0 = 0.0 in struct comparisons, so a zero
    # quality cannot split a tie group differently from the oracle's
    # (quality DESC, id ASC) window order.
    best = (
        labeled.groupBy("canonical_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("__q")).alias("negq"),
                    F.col("doc_id").alias("id"),
                )
            ).alias("__b")
        )
        .select("canonical_id", F.col("__b.id").alias("keep_id"))
    )
    return labeled.join(best, "canonical_id").select(
        "doc_id", "canonical_id", "keep_id"
    )


def containment_pairs(
    df: DataFrame,
    pairs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Asymmetric shingle containment for candidate pairs:
    ``containment_a = |A∩B| / |A|`` (how much of doc a is inside doc
    b) and vice versa, plus the symmetric Jaccard. Quote-inclusion and
    page-embeds-page duplication score near 1.0 on one containment
    side while Jaccard stays low (the union is dominated by the larger
    doc) — the signal Jaccard-only verification systematically misses.

    Same physical shape as :func:`jaccard_pairs`: shingle sets only
    for docs appearing in a pair (semi-join first), candidate-sized
    joins, scan-local set expressions.
    """
    ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh = df.join(ids, df[id_col] == ids["doc_id"], "left_semi").select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(shingle_hashes_expr(text_col, shingle_k)).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    na = F.size("sh_a").cast("double")
    nb = F.size("sh_b").cast("double")
    union = na + nb - inter
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(na > 0, inter / na).otherwise(F.lit(0.0)).alias(
                "containment_a"
            ),
            F.when(nb > 0, inter / nb).otherwise(F.lit(0.0)).alias(
                "containment_b"
            ),
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias(
                "jaccard"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Substring-level dedup: duplicate-span detection.
#
# Doc-level dedup (exact / MinHash / SimHash above) misses the common
# corpus pathology of SHARED SPANS inside otherwise-unique documents —
# boilerplate headers, license blocks, quoted threads. The suffix-array
# method of "Deduplicating Training Data Makes Language Models Better"
# (Lee et al., 2022) finds repeated substrings; this is its scalable
# relational analog at token-k-gram granularity: a span is flagged when
# EVERY k-gram inside it occurs in >= min_df distinct documents.
# ---------------------------------------------------------------------------


def _positioned_gram_hashes(
    df: DataFrame, *, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(doc_id, pos, h): hash of the k-gram starting at token ``pos``
    (0-based), built with window ``lead`` like minhash_sig_columns —
    codegen-friendly, one doc_id shuffle."""
    from vector_indexer_spark.functions.text import token_hash_expr

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(w) for i in range(1, k)
    ]
    return (
        tok.select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.concat_ws(" ", *parts).alias("gram"),
            parts[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select(
            "doc_id", "pos", token_hash_expr(F.col("gram")).alias("h")
        )
    )


def duplicate_spans(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document: ``(doc_id,
    span_start, span_end, n_grams)`` where tokens ``span_start ..
    span_end`` (0-based, inclusive) are covered by a maximal run of
    consecutive k-grams each appearing in >= ``min_df`` distinct docs.

    Physical shape at corpus scale: one doc_id shuffle for gram
    formation, two map-side-combinable aggregations for document
    frequency ((h, doc) then (h) — never a count-distinct state blowup),
    one semi-join of positions against the (small, post-filter)
    duplicated-gram set, and one per-doc window for the islands merge
    (``pos - row_number``). No step is quadratic in corpus size; the
    df-count shuffle key is the gram hash, uniformly distributed by
    construction.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    grams = _positioned_gram_hashes(df, text_col=text_col, id_col=id_col, k=k)
    docfreq = (
        grams.groupBy("h", "doc_id")
        .agg(F.lit(1).alias("__one"))
        .groupBy("h")
        .agg(F.count("*").alias("ndocs"))
        .filter(F.col("ndocs") >= min_df)
        .select("h")
    )
    flagged = grams.join(docfreq, "h", "semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = flagged.withColumn(
        "__grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy("doc_id", "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def span_dup_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Per-document duplicated-span quality signal: ``(doc_id,
    total_tokens, dup_tokens, dup_fraction)`` — the fraction of tokens
    covered by at least one duplicated k-gram. The standard filter
    threshold for span-level contamination (drop or trim docs whose
    dup_fraction exceeds a budget).

    Coverage is exact even where flagged runs overlap within k-1
    tokens: each flagged gram explodes into its k covered token
    indices and coverage is counted distinct per doc (bounded: k x
    flagged grams, flagged grams <= total grams).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    grams = _positioned_gram_hashes(df, text_col=text_col, id_col=id_col, k=k)
    docfreq = (
        grams.groupBy("h", "doc_id")
        .agg(F.lit(1).alias("__one"))
        .groupBy("h")
        .agg(F.count("*").alias("ndocs"))
        .filter(F.col("ndocs") >= min_df)
        .select("h")
    )
    covered = (
        grams.join(docfreq, "h", "semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("tpos"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("tpos").alias("dup_tokens"))
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_expr(text_col)).cast("long").alias("total_tokens"),
    )
    return totals.join(covered, "doc_id", "left").select(
        "doc_id",
        "total_tokens",
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias(
            "dup_tokens"
        ),
        F.when(
            F.col("total_tokens") > 0,
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            / F.col("total_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )


def embedding_near_dups_graph(
    df: DataFrame,
    *,
    threshold2: float,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "arrow",
    max_reverse_degree: int | None | str = "auto",
) -> DataFrame:
    """Embedding near-duplicate pairs mined from the NN-Descent k-NN
    graph: ``(id_a, id_b, dist2)`` with ``dist2 <= threshold2`` and
    ``id_a < id_b``.

    The third near-dup blocking strategy next to cluster blocking
    (:func:`embedding_near_dups`) and RHP banding
    (similarity.cosine_near_dup_rhp): the approximate k-NN graph IS an
    ANN join of the corpus with itself, so near-dup mining is a filter
    over its edges — no banding/bucket parameters to tune, and recall
    is the graph's k-NN recall (a true near-dup closer than the k-th
    neighbor is found by construction once the descent converges).
    Cost is the O(n·k²)-per-round graph build — every stage one
    bounded key-partitioned join (operators/graph.py).

    Misses pairs beyond each point's k nearest — pick ``k`` above the
    expected duplicate-cluster size (a doc with more than k dups
    yields a connected GROUP through shared members even when not all
    pairwise edges survive; resolve with resolve_duplicate_groups).
    """
    from vector_indexer_spark.operators.graph import (  # noqa: PLC0415
        nn_descent_knn_graph,
    )

    if threshold2 < 0:
        raise ValueError("threshold2 must be non-negative")
    edges = nn_descent_knn_graph(
        df, k, iterations=iterations, symmetric=False,
        id_col=id_col, vec_col=vec_col, return_distances=True,
        early_stop=False, method=method,
        # hub guard passthrough — near-dup corpora are exactly the
        # boilerplate-hub case; "auto" = 4*k (graph.py), None = off
        max_reverse_degree=max_reverse_degree,
    )
    return (
        edges.filter(F.col("dist2") <= F.lit(float(threshold2)))
        .select(
            F.least("src", "dst").alias("id_a"),
            F.greatest("src", "dst").alias("id_b"),
            "dist2",
        )
        .distinct()  # both directions of a mutual pair collapse
    )
