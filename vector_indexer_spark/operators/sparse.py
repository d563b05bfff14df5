"""Sparse-vector retrieval: inverted-index dot-product top-k.

The sparse rung of the retrieval ladder (next to dense kNN/IVF/graph
and late-interaction MaxSim): documents and queries are sparse vectors
``(indices ARRAY<INT>, weights ARRAY<DOUBLE>)`` over a hashed term
space — the data model of SPLADE/uniCOIL-style learned-sparse
embeddings and of classic tf-idf — and scoring is the posting-list
join every inverted index runs: explode both sides to ``(id, term,
w)``, join on term, sum the products per (query, doc) pair.

Design notes (100-TB shapes):

- The doc-side posting table shuffles ONCE on ``term`` for the join;
  the query side is a bounded batch and is broadcast. No all-pairs
  anywhere — a (query, doc) pair is scored only if it shares a term.
- Scores are summed in INTEGER MICROS (each per-term product floored
  to micros first), so the cross-term sum is order-free — the same
  oracle-hash discipline as MaxSim. Ranking ties break by id.
- Common terms (stopwords under tf-idf, high-df tokens generally) are
  the skew axis: ``max_postings_per_term`` keeps only the top-cap
  postings per term by ``(weight DESC, id)`` — the impact-ordered
  "champion list" truncation (Persin'94 / WAND-family static pruning),
  deterministic and SQL-replayable. At web scale the cap bounds the
  join fan-out of a stopword-like term from n_docs to cap.
- ``sparse_from_tokens`` derives tf-idf sparse vectors from raw text
  with the engine's own tokenizer and md5 term hashing, so text →
  sparse → retrieval runs with no external model; learned-sparse
  weights drop into the same ``(indices, weights)`` columns.

Reference parity: the reference engine is dense-only (src/api.rs);
this module extends the surface the same way PQ/SQ/BQ and MaxSim do —
same result contract (top-k, ties by id), same oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_indexer_spark.functions.text import tokens_expr

MICROS = 1_000_000

# Salt fan-out for the two-stage champion-list cap: stage 1 ranks per
# (term, salt) so a hot term's postings spread across this many tasks;
# stage 2 ranks the <= _CAP_SALTS * cap survivors per term. Exact by
# the standard partial-top-k argument: any posting in a term's global
# top-cap is beaten by < cap postings overall, hence by < cap postings
# inside its own salt group, hence survives stage 1.
_CAP_SALTS = 32


def term_hash_expr(token: Column | str, vocab_size: int) -> Column:
    """md5-prefix bucket of a token string — the engine-wide draw
    (``conv(substr(md5(t),1,8),16,10) % vocab``), replayed verbatim in
    DuckDB by the oracles."""
    t = F.col(token) if isinstance(token, str) else token
    return (
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        % F.lit(vocab_size)
    ).cast("int")


def _tf_table(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int
) -> DataFrame:
    """``(id, term, tf)`` — one token explode + one composite-key
    aggregate (map-side combined)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(text_col)).alias("token"),
    ).select("id", term_hash_expr("token", vocab_size).alias("term"))
    return toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))


def _tfidf_weight() -> Column:
    """``ln(1 + tf) · ln((N + 1) / (df + 1))`` — sublinear tf, smoothed
    idf (never negative, never /0); the exact expression the DuckDB
    oracles replay."""
    return F.log(F.lit(1.0) + F.col("tf").cast("double")) * F.log(
        (F.col("n_docs").cast("double") + F.lit(1.0))
        / (F.col("dfreq").cast("double") + F.lit(1.0))
    )


def sparse_from_tokens(
    df: DataFrame,
    *,
    vocab_size: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """tf-idf sparse vectors from raw text: ``(id, indices ARRAY<INT>
    term-sorted, weights ARRAY<DOUBLE>)``.

    Hash collisions fold rare terms together (the standard
    feature-hashing trade; raise ``vocab_size`` to taste). Documents
    with zero tokens produce no row (a sparse vector with no mass
    cannot match anything).

    Plan: one token explode + two bounded aggregates — (id, term) tf
    counts shuffle once on the composite key, term df counts are
    term-space-sized and broadcast back, and N is a 1-row aggregate
    cross-joined in (kept in-plan so the operator stays composable
    under streaming/caching).
    """
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    # lazy localCheckpoint: tf feeds BOTH the weight projection and the
    # df aggregate, and Catalyst plans them as independent branches —
    # without the checkpoint the corpus is tokenized twice per
    # invocation (measured 6 FileScans for the text path). Batch-only
    # by nature: the corpus-wide df/N stats preclude streaming anyway.
    tf = _tf_table(df, id_col, text_col, vocab_size).localCheckpoint(
        eager=False
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n = df.select(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(n))
        .select("id", "term", _tfidf_weight().alias("w"))
    )
    pairs = F.array_sort(F.collect_list(F.struct("term", "w")))
    return w.groupBy("id").agg(
        F.transform(pairs, lambda s: s.term).alias("indices"),
        F.transform(pairs, lambda s: s.w).alias("weights"),
    )


def _postings(
    df: DataFrame, id_out: str, w_out: str, id_col: str,
    indices_col: str, weights_col: str,
) -> DataFrame:
    """Explode a sparse-vector table to ``(id, term, w)`` rows —
    scan-local (explode of co-zipped arrays, no shuffle)."""
    return df.select(
        F.col(id_col).alias(id_out),
        F.explode(
            F.arrays_zip(
                F.col(indices_col).alias("term"),
                F.col(weights_col).alias("w"),
            )
        ).alias("p"),
    ).select(id_out, F.col("p.term").alias("term"), F.col("p.w").alias(w_out))


def _cap_postings(d: DataFrame, cap: int) -> DataFrame:
    """Two-stage champion-list cap (skew-safe, exact). A single window
    on `term` would route EVERY posting of a hot stopword-like term
    through one task — the exact skew the cap exists to tame. Stage 1
    ranks within (term, salt-of-doc_id) so a 10^9-posting term spreads
    over _CAP_SALTS tasks; stage 2 ranks the bounded survivors
    (<= _CAP_SALTS * cap per term) globally."""
    w1 = Window.partitionBy("term", "__salt").orderBy(
        F.col("dw").desc(), "doc_id"
    )
    w2 = Window.partitionBy("term").orderBy(
        F.col("dw").desc(), "doc_id"
    )
    return (
        d.withColumn(
            "__salt",
            F.pmod(F.xxhash64("doc_id"), F.lit(_CAP_SALTS)),
        )
        .withColumn("__pr", F.row_number().over(w1))
        .filter(F.col("__pr") <= cap)
        .drop("__salt")
        .withColumn("__pr", F.row_number().over(w2))
        .filter(F.col("__pr") <= cap)
        .drop("__pr")
    )


def _contrib() -> Column:
    return F.floor(
        F.col("qw") * F.col("dw") * F.lit(float(MICROS))
    ).cast("long")


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score_micros").desc(), "doc_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_micros")
    )


def _topk_postings(
    d: DataFrame,
    q: DataFrame,
    k: int,
    max_postings_per_term: int | None,
    rescore_shortlist: int | None = None,
) -> DataFrame:
    """Score ``(doc_id, term, dw)`` against broadcast ``(query_id,
    term, qw)`` postings — the single scoring kernel behind both entry
    points.

    ``rescore_shortlist`` (requires the cap): cap+rescore tier — the
    capped posting join only SELECTS a per-query shortlist of that many
    candidates; the returned top-k and scores come from rescoring the
    shortlist against the FULL postings of those documents. Recovers
    the quality the bare cap forfeits on hot-term corpora (a doc
    evicted from one hot term's champion list still wins via its other
    terms) while the expensive join stays cap-bounded; the rescore join
    fans out by candidate DOC, not by term — ≤ shortlist·nq bounded
    pairs against a broadcast pair set."""
    if k <= 0:
        raise ValueError("k must be positive")
    if max_postings_per_term is not None and max_postings_per_term <= 0:
        raise ValueError("max_postings_per_term must be positive")
    if rescore_shortlist is not None:
        if max_postings_per_term is None:
            raise ValueError(
                "rescore_shortlist requires max_postings_per_term"
            )
        if rescore_shortlist < k:
            raise ValueError("rescore_shortlist must be >= k")
        cand = _topk_postings(
            _cap_postings(d, max_postings_per_term),
            q,
            rescore_shortlist,
            None,
        ).select("query_id", "doc_id")
        # exact rescore of the bounded (query, candidate-doc) pair set:
        # full postings of candidate docs only — the pair set is
        # broadcast (nq · shortlist rows), the posting table never
        # shuffles, and a term shared with a NON-shortlisting query
        # contributes nothing (join keys include query_id)
        rescored = (
            d.join(F.broadcast(cand), "doc_id")
            .join(F.broadcast(q), ["query_id", "term"])
            .select("query_id", "doc_id", _contrib().alias("c"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum("c").alias("score_micros"))
        )
        return _rank_topk(rescored, k)
    if max_postings_per_term is not None:
        d = _cap_postings(d, max_postings_per_term)
    scored = (
        d.join(F.broadcast(q), "term")
        .select("query_id", "doc_id", _contrib().alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score_micros"))
    )
    return _rank_topk(scored, k)


def sparse_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    indices_col: str = "indices",
    weights_col: str = "weights",
    max_postings_per_term: int | None = None,
    rescore_shortlist: int | None = None,
) -> DataFrame:
    """Top-k documents per query by sparse dot product.

    Returns ``(query_id, rank, doc_id, score_micros)`` — score is the
    order-free integer-micros sum ``Σ_t floor(q_t · d_t · 1e6)``,
    descending, ties by doc_id. Documents sharing no term with a query
    never appear (score-0 rows are not manufactured).

    ``max_postings_per_term`` enables impact-ordered champion-list
    pruning: per term, only the top-cap postings by ``(w DESC, id)``
    survive — a documented approximation (exact for any query whose
    true top-k all sit inside their terms' champion lists) that bounds
    stopword-term join fan-out at scale. The cap itself is skew-safe:
    a salted pre-rank spreads a hot term over ``_CAP_SALTS`` tasks
    before the (now bounded) per-term rank — exact, since the global
    top-cap is contained in the union of salted top-caps.
    """
    d = _postings(docs, "doc_id", "dw", id_col, indices_col, weights_col)
    q = _postings(
        queries, "query_id", "qw", query_id_col, indices_col, weights_col
    )
    return _topk_postings(
        d, q, k, max_postings_per_term, rescore_shortlist
    )


def sparse_search_tokens(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    vocab_size: int = 65536,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    text_col: str = "text",
    weighting: str = "tfidf",
    k1: float = 1.2,
    b: float = 0.75,
    max_postings_per_term: int | None = None,
    rescore_shortlist: int | None = None,
) -> DataFrame:
    """Text-in/text-out composition: encode the corpus, weight the
    query TEXTS against the CORPUS's term statistics (df/N/avgdl come
    from the documents — a query must not perturb the index), and
    score via the posting join. The lexical-retrieval twin of
    ``bm25_search`` expressed in the sparse-vector data model; both
    sides skip the array round-trip and score straight from posting
    frames (one explode each).

    ``weighting``:

    - ``"tfidf"`` (default): ``ln(1+tf) · ln((N+1)/(df+1))`` on BOTH
      sides — the symmetric dot the encode op stores.
    - ``"bm25"``: Robertson/Okapi doc-side weights — ``idf ·
      tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with ``idf =
      ln(1 + (N−df+0.5)/(df+0.5))``; the query side contributes its
      raw term frequency (the k3→∞ simplification). ``N``/``avgdl``
      are computed over docs with ≥1 token. Same posting join, same
      integer-micros contract — BM25 is just a different weight
      column in the sparse data model.
    """
    if weighting not in ("tfidf", "bm25"):
        raise ValueError(f"unknown weighting {weighting!r}")
    # lazy localCheckpoint: the corpus tf frame feeds the doc postings,
    # the df table, and (via df) the query weights — one tokenize pass
    # instead of three (see sparse_from_tokens)
    tf = _tf_table(docs, id_col, text_col, vocab_size).localCheckpoint(
        eager=False
    )
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return _search_from_tf(
        tf, n, queries, k=k, vocab_size=vocab_size,
        query_id_col=query_id_col, text_col=text_col,
        weighting=weighting, k1=k1, b=b,
        max_postings_per_term=max_postings_per_term,
        rescore_shortlist=rescore_shortlist,
    )


def _search_from_tf(
    tf: DataFrame,
    n: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    vocab_size: int,
    query_id_col: str,
    text_col: str,
    weighting: str,
    k1: float,
    b: float,
    max_postings_per_term: int | None,
    rescore_shortlist: int | None = None,
) -> DataFrame:
    """Score token queries against a corpus ``(id, term, tf)`` frame —
    the shared kernel behind :func:`sparse_search_tokens` (tf derived
    from the docs) and :func:`sparse_search_manifest` (tf IS the
    persisted posting manifest). ``n`` is a 1-row ``n_docs`` frame
    (the two entry points define it differently — see their docs)."""
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    qtf = _tf_table(queries, query_id_col, text_col, vocab_size)
    if weighting == "tfidf":
        d = (
            tf.join(F.broadcast(dft), "term")
            .crossJoin(F.broadcast(n))
            .select(
                F.col("id").alias("doc_id"), "term",
                _tfidf_weight().alias("dw"),
            )
        )
        # inner join: query terms absent from the corpus have no
        # postings to match anyway, so they carry no mass
        q = (
            qtf.join(F.broadcast(dft), "term")
            .crossJoin(F.broadcast(n))
            .select(
                F.col("id").alias("query_id"), "term",
                _tfidf_weight().alias("qw"),
            )
        )
        return _topk_postings(
            d, q, k, max_postings_per_term, rescore_shortlist
        )
    # BM25: per-doc length + corpus stats, all from the one tf frame.
    # dl is computed as a window sum over the tf frame itself (one
    # shuffle on `id`, bounded partitions — a doc has at most doc-length
    # distinct terms) instead of joining a separate doc-sized length
    # table; broadcasting that table would be corpus-sized driver state,
    # the class of plan this engine bans everywhere else.
    stats = tf.agg(
        F.sum("tf").alias("total_tokens"),
        F.count_distinct("id").alias("n_d"),
    )
    n_dd = F.col("n_d").cast("double")
    dfd = F.col("dfreq").cast("double")
    tfd = F.col("tf").cast("double")
    avgdl = F.col("total_tokens").cast("double") / n_dd
    idf = F.log(
        F.lit(1.0) + (n_dd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    )
    denom = tfd + F.lit(float(k1)) * (
        F.lit(1.0) - F.lit(float(b))
        + F.lit(float(b)) * (F.col("dl").cast("double") / avgdl)
    )
    w = idf * (tfd * F.lit(float(k1) + 1.0)) / denom
    d = (
        tf.withColumn("dl", F.sum("tf").over(Window.partitionBy("id")))
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col("id").alias("doc_id"), "term", w.alias("dw"))
    )
    q = qtf.select(
        F.col("id").alias("query_id"), "term", tfd.alias("qw")
    )
    return _topk_postings(
        d, q, k, max_postings_per_term, rescore_shortlist
    )


def sparse_manifest(
    docs: DataFrame,
    *,
    vocab_size: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, term, tf)`` posting manifest — the persistable sparse
    index artifact, and the incremental-ingest rung of the sparse
    family (the analogue of the dedup family's banded-signature
    manifest). The manifest is APPEND-ONLY: a delta batch's postings
    are computed from the delta alone (call this same function on the
    delta — cost is delta-shaped, the standing corpus is never
    re-tokenized) and appended with ``unionByName`` / a parquet
    append.

    df/N staleness contract: document frequencies, ``n_docs`` and
    ``avgdl`` are derived FROM the manifest at query time
    (:func:`sparse_search_manifest`), so they refresh exactly when the
    append lands — there is no separately-maintained stat table to
    drift. A deployment that caches df between appends trades that
    freshness for one aggregate per batch; the scoring kernel is
    unchanged either way.
    """
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    return _tf_table(docs, id_col, text_col, vocab_size)


def sparse_search_manifest(
    manifest: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    vocab_size: int = 65536,
    query_id_col: str = "query_id",
    text_col: str = "text",
    weighting: str = "tfidf",
    k1: float = 1.2,
    b: float = 0.75,
    max_postings_per_term: int | None = None,
    rescore_shortlist: int | None = None,
) -> DataFrame:
    """Search token queries against a persisted posting manifest —
    identical scoring contract to :func:`sparse_search_tokens`, with
    corpus statistics derived from the manifest itself: ``N`` is the
    count of distinct documents IN the manifest (documents with zero
    tokens never produced postings, so the two entry points agree on
    any corpus without empty documents — the difference is pinned by
    tests). One aggregate pass over the manifest replaces the corpus
    re-tokenize; at 100 TB the manifest is the thing that's already on
    disk, partitioned however the posting join wants it."""
    if weighting not in ("tfidf", "bm25"):
        raise ValueError(f"unknown weighting {weighting!r}")
    # lazy localCheckpoint for the same reason as the tokens path: the
    # manifest frame feeds postings, df, and stats branches
    tf = manifest.localCheckpoint(eager=False)
    n = tf.select(F.count_distinct("id").cast("long").alias("n_docs"))
    return _search_from_tf(
        tf, n, queries, k=k, vocab_size=vocab_size,
        query_id_col=query_id_col, text_col=text_col,
        weighting=weighting, k1=k1, b=b,
        max_postings_per_term=max_postings_per_term,
        rescore_shortlist=rescore_shortlist,
    )
