"""Document-level text analysis operators (DataFrame in → DataFrame out).

Thin operator wrappers over the Catalyst expressions in
``functions.text`` — each is a scan-local projection (no shuffle, no
UDF, whole-stage codegen) over a ``documents``-shaped table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_indexer_spark.functions.text import (
    alpha_ratio_expr,
    digit_ratio_expr,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    space_ratio_expr,
    stopword_count_expr,
    stopword_ratio_expr,
    token_count_expr,
)


def text_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document statistics: length, token count, character-class
    ratios, stopword ratio, quality score."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        token_count_expr(text_col).alias("n_tokens"),
        digit_ratio_expr(text_col).alias("digit_ratio"),
        space_ratio_expr(text_col).alias("space_ratio"),
        alpha_ratio_expr(text_col).alias("alpha_ratio"),
        stopword_count_expr(text_col).alias("n_stopwords"),
        stopword_ratio_expr(text_col).alias("stopword_ratio"),
        quality_score_expr(text_col).alias("quality"),
    )


def language_id(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID ('en'/'de'/'fr'/'es'/'und')."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        lang_id_expr(text_col).alias("lang_pred"),
    )


def fingerprints(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprints."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_expr(text_col).alias("fingerprint"),
    )


def quality_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 8,
) -> DataFrame:
    """Keep documents above quality/length thresholds (the pipeline's
    pre-training filter stage); passes all input columns through."""
    return df.filter(
        (quality_score_expr(text_col) >= min_quality)
        & (token_count_expr(text_col) >= min_tokens)
    )


def repetition_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Intra-document repetition: fraction of word n-grams that are
    repeats of an earlier n-gram in the same document (the standard
    "repetitious text" pre-training quality signal — highly repetitive
    documents are boilerplate/spam; cf. Gopher/RefinedWeb rules).

    Scan-local: n-grams, distinct count, and ratio are all array
    expressions inside whole-stage codegen — zero shuffle, no UDF, so
    at 100 TB this is a single pass bounded by scan bandwidth.
    Returns ``(doc_id, n_ngrams, n_distinct, repetition)`` where
    ``repetition = 1 − n_distinct/n_ngrams`` (0.0 for docs with no
    n-grams).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from vector_indexer_spark.functions.text import tokens_expr

    toks = tokens_expr(text_col)
    grams = F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            # sequence() with stop < start counts DOWN — the when()
            # guard above keeps that branch unevaluated rows out
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(n)]
            ),
        )
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(grams).cast("long").alias("n_ngrams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
    )
    return out.select(
        "doc_id",
        "n_ngrams",
        "n_distinct",
        F.when(
            F.col("n_ngrams") > 0,
            1.0
            - F.col("n_distinct").cast("double")
            / F.col("n_ngrams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("repetition"),
    )


def duplicate_ngram_fraction(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Cross-document boilerplate share: per document, the fraction of
    its word n-gram occurrences whose n-gram also appears in at least
    one OTHER document (the corpus-level "duplicate n-grams" signal
    used to find templated/boilerplate text in pre-training corpora).

    Plan shape (scales to 100 TB): tokenize+shingle scan-locally
    (posexplode + window lead, same as MinHash), aggregate each
    n-gram's distinct-document count with one hash shuffle on the
    n-gram (map-side partial), semi-join the shared n-grams back onto
    the per-document occurrences (shuffle reuses the n-gram key), then
    one map-side-combinable groupBy(doc_id). Nothing is all-pairs.

    Returns ``(doc_id, n_shingles, n_shared, shared_fraction)``;
    shingle-less documents (< n tokens) get 0 / 0.0.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from pyspark.sql import Window

    from vector_indexer_spark.functions.text import tokens_expr

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = (
        tok.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("shingle"),
            parts[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .drop("__last")
    )
    shared = (
        sh.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") > 1)
        .select("shingle")
    )
    marked = sh.join(shared.withColumn("__shared", F.lit(1)), "shingle", "left")
    per_doc = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum(F.coalesce(F.col("__shared"), F.lit(0))).alias("n_shared"),
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        F.when(
            F.coalesce("n_shingles", F.lit(0)) > 0,
            F.col("n_shared").cast("double")
            / F.col("n_shingles").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("shared_fraction"),
    )


def top_tokens(
    df: DataFrame,
    k: int = 20,
    *,
    by_col: str | None = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary: top-k tokens per group (default: per
    language) with occurrence and document frequencies — the
    vocabulary/IDF-side statistic of a training-data pipeline.

    Returns ``(group, rank, token, n_occurrences, n_docs)``, rank by
    ``(n_occurrences DESC, token)`` (deterministic ties).

    Scale shape: explode to (group, token, doc) rows, one
    map-side-combined aggregation to vocabulary-sized counts, then a
    window over per-group vocabularies. The heavy shuffle carries
    (group, token, doc_id) partial counts — bounded by corpus token
    count, trivially partitionable; the window input is |vocab| rows.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    if k <= 0:
        raise ValueError("k must be positive")
    group = (
        F.col(by_col).alias("group")
        if by_col is not None
        else F.lit("all").alias("group")
    )
    toks = df.select(
        group,
        F.col(id_col).alias("__doc"),
        F.explode(tokens_expr(text_col)).alias("token"),
    )
    counts = toks.groupBy("group", "token").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("__doc").alias("n_docs"),
    )
    w = Window.partitionBy("group").orderBy(
        F.col("n_occurrences").desc(), "token"
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "group", F.col("rank").cast("int").alias("rank"),
            "token", "n_occurrences", "n_docs",
        )
    )


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token chunks with overlap — the
    context-window prep stage of a training/RAG pipeline.

    Chunk ``i`` covers tokens ``[i·stride, i·stride + chunk_tokens)``
    with ``stride = chunk_tokens − overlap``; the chunk count is
    ``ceil(max(n_tokens − overlap, 1) / stride)`` so every token lands
    in some chunk and the final partial chunk is kept. Token-less
    documents yield no rows.

    Returns ``(doc_id, chunk_idx, n_tokens, chunk_text)``. Scan-local
    (tokenize + slice inside codegen, explode of a per-row index
    sequence) — no shuffle, no UDF; at 100 TB this is bounded by scan
    bandwidth like the other text projections.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    stride = chunk_tokens - overlap
    toked = df.select(
        F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("__toks")
    ).filter(F.size("__toks") > 0)
    num = F.ceil(
        F.greatest(F.size("__toks") - overlap, F.lit(1))
        / F.lit(float(stride))
    ).cast("int")
    chunked = toked.select(
        "doc_id",
        "__toks",
        F.explode(F.sequence(F.lit(0), num - 1)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def clean_corpus(
    df: DataFrame,
    *,
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composite pre-training cleaning pipeline, end to end:
    language filter (heuristic ID == ``lang``) → quality/length filter
    → exact dedup (keep the min-id copy). Returns the surviving rows
    with all input columns — the corpus a training run would consume.

    One pass of scan-local predicates (language + quality never
    shuffle) followed by the single content-hash shuffle of the dedup
    stage — the filters run FIRST so the shuffle carries only
    survivors.
    """
    from vector_indexer_spark.functions.text import lang_id_expr  # noqa: PLC0415
    from vector_indexer_spark.operators.dedup import dedup_exact  # noqa: PLC0415

    filtered = quality_filter(
        df.filter(lang_id_expr(text_col) == lang),
        text_col=text_col,
        min_quality=min_quality,
        min_tokens=min_tokens,
    )
    return dedup_exact(filtered, text_col=text_col, id_col=id_col)


def hash_embed(
    df: DataFrame,
    dim: int = 64,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Deterministic feature-hashing text embedding (the classic
    hashing trick): token → md5-based bucket in ``[0, dim)``, bucket
    counts, L2-normalized — ``(doc_id, embedding ARRAY<DOUBLE>)``.

    No model, no RNG: the one text→vector step that is exactly
    SQL-reproducible, which closes the documents → embeddings → ANN
    loop INSIDE the engine (see the ``pipeline_text_ann`` oracle query:
    clean text, embed it, and answer vector queries, every stage
    bit-checked). Real learned embeddings slot into the same column
    contract via a Pandas-UDF stage (multimodal.py's decode pattern).

    Bucket counting is an explode + ``dim`` conditional-sum
    aggregation: one md5 per token, then JVM whole-stage-codegen
    ``SUM(IF(h = b, 1, 0))`` columns with map-side partial
    aggregation, so the shuffle carries docs × dim aggregated counts,
    never raw tokens. (The obvious scan-local alternative — ``dim``
    ``filter``/``size`` passes over the token-hash array — is an
    interpreted higher-order function in Spark, O(dim·T) per row with
    lambda-eval overhead: measured 100+ s vs ~2 s on the sf0.01 sweep.)
    Zero-token documents (dropped by the explode) are restored by a
    left join of the doc_id spine against the aggregated counts, with
    an all-zero vector filled in.
    The norm is hoisted into its own column so the fold isn't
    re-evaluated per element (same CSE trap as
    similarity.normalize_vectors).
    """
    if dim <= 0:
        raise ValueError("dim must be positive")
    from vector_indexer_spark.functions.text import (  # noqa: PLC0415
        token_hash_expr,
        tokens_expr,
    )

    hs = F.transform(
        tokens_expr(text_col), lambda t: token_hash_expr(t) % dim
    )
    ex = df.select(F.col(id_col).alias("doc_id"), hs.alias("__hs")).select(
        "doc_id", F.explode("__hs").alias("__h")
    )
    cnts = ex.groupBy("doc_id").agg(
        F.array(
            *[
                F.sum(
                    F.when(F.col("__h") == b, F.lit(1)).otherwise(F.lit(0))
                ).cast("double")
                for b in range(dim)
            ]
        ).alias("__cnts")
    )
    zeros = F.array(*[F.lit(0.0)] * dim)
    out = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(cnts, "doc_id", "left")
        .withColumn("__cnts", F.coalesce(F.col("__cnts"), zeros))
    )
    if not normalize:
        return out.select("doc_id", F.col("__cnts").alias("embedding"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("__cnts"), lambda v: v * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    out = out.withColumn("__nrm", nrm)
    return out.select(
        "doc_id",
        F.when(
            F.col("__nrm") > 0,
            F.transform(F.col("__cnts"), lambda v: v / F.col("__nrm")),
        )
        .otherwise(F.col("__cnts"))
        .alias("embedding"),
    )


def pii_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII match counts (emails / IPv4 / phone numbers)
    plus a ``has_pii`` flag — the detection half of the corpus
    scrubbing stage.

    Scan-local: three ``regexp_count`` codegen projections, zero
    shuffle; at 100 TB this is bounded by scan bandwidth alone.
    """
    from vector_indexer_spark.functions.text import PII_PATTERNS, pii_count_expr

    counts = {
        f"n_{name}": pii_count_expr(text_col, pattern)
        for name, pattern, _ in PII_PATTERNS
    }
    out = df.select(
        F.col(id_col).alias("doc_id"),
        *[expr.alias(name) for name, expr in counts.items()],
    )
    total = sum((F.col(n) for n in counts), F.lit(0).cast("long"))
    return out.withColumn("has_pii", (total > 0).cast("int"))


def redact_pii(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Replace every detected PII span with a placeholder tag
    (``<EMAIL>`` / ``<IP>`` / ``<PHONE>``) — the rewrite half of the
    scrubbing stage. Scan-local ``regexp_replace`` chain, no shuffle."""
    from vector_indexer_spark.functions.text import redact_pii_expr

    return df.select(
        F.col(id_col).alias("doc_id"),
        redact_pii_expr(text_col).alias("text"),
    )


def gopher_quality(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.80,
    max_symbol_word_ratio: float = 0.10,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1, as
    popularized by RefinedWeb/Dolma cleaning pipelines): word count
    bounds, mean word length band, fraction of words containing an
    alphabetic character, symbol-to-word ratio (``#``/ellipsis), and a
    minimum stopword-hit count. Emits the per-document signals plus a
    ``passes`` flag so the caller can either filter or audit.

    Every signal is an array/regex expression over the token array —
    scan-local whole-stage codegen, zero shuffle, no UDF. Thresholds
    are keyword arguments; the defaults follow the published rules
    (word-count bounds relaxed for short test corpora).
    """
    from vector_indexer_spark.functions.text import (
        stopword_count_expr,
        tokens_expr,
    )

    toks = tokens_expr(text_col)
    n_words = F.size(toks).cast("long")
    # Sum of token lengths folded left over the token array: integer
    # sum, so double division below is exact and engine-portable.
    len_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_word_len = F.when(n_words > 0, len_sum / n_words).otherwise(F.lit(0.0))
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ).cast("long")
    alpha_frac = F.when(n_words > 0, alpha_words / n_words).otherwise(
        F.lit(0.0)
    )
    symbols = (
        F.regexp_count(F.col(text_col), F.lit(r"#"))
        + F.regexp_count(F.col(text_col), F.lit(r"\.\.\.|…"))
    ).cast("long")
    symbol_ratio = F.when(n_words > 0, symbols / n_words).otherwise(
        F.lit(0.0)
    )
    stop_hits = stopword_count_expr(text_col)
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (alpha_frac >= min_alpha_word_frac)
        & (symbol_ratio <= max_symbol_word_ratio)
        & (stop_hits >= min_stopword_hits)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        symbol_ratio.alias("symbol_word_ratio"),
        stop_hits.alias("stopword_hits"),
        passes.cast("int").alias("passes"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    strat_col: str | None = None,
    n_streams: int = 1,
) -> DataFrame:
    """Deterministic sequence packing: assign documents to fixed token
    budgets (training context windows) by contiguous cumulative token
    count — the "sample packing" step that turns a cleaned corpus into
    dense training examples.

    Semantics (offset-quantized packing): within each packing stream,
    documents are taken in ``id`` order and a document joins the bin
    its *preceding* cumulative token count falls in —
    ``bin_id = floor(tokens_before / budget)``. A document straddling a
    boundary stays in the earlier bin (bins may overflow by one
    document); split overlong documents with ``chunk_documents`` first
    if hard budget caps are required. This formulation is a pure
    window cumsum — deterministic, engine-portable, and free of the
    sequential state a first-fit packer would need.

    Scale: one shuffle on the stream key. A single stream means a
    single sorted partition, so for large corpora raise ``n_streams``
    — documents are hash-routed to ``n_streams`` independent packing
    streams (deterministic (seed,id) bucket), keeping every stream
    driver-independent and the sort bounded. ``strat_col`` (e.g.
    source) additionally keeps streams pure per stratum.

    Returns ``(doc_id[, strat], stream, n_tokens, bin_id, bin_offset)``
    with ``bin_offset`` = token offset of the document inside its bin.
    """
    from pyspark.sql import Window

    from vector_indexer_spark.functions.text import token_count_expr
    from vector_indexer_spark.operators.splits import _bucket_expr

    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_streams <= 0:
        raise ValueError("n_streams must be positive")
    stream = (_bucket_expr(id_col, 7) % n_streams).alias("stream")
    cols = [F.col(id_col).alias("doc_id")]
    part_keys = ["stream"]
    if strat_col is not None:
        cols.append(F.col(strat_col))
        part_keys.append(strat_col)
    base = df.select(
        *cols, stream, token_count_expr(text_col).alias("n_tokens")
    )
    w = (
        Window.partitionBy(*part_keys)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__before")
    out = base.select("*", before)
    return out.select(
        *[c for c in out.columns if c != "__before"],
        F.floor(F.col("__before") / budget).cast("long").alias("bin_id"),
        (F.col("__before") % budget).cast("long").alias("bin_offset"),
    )


def _eq_lit(term: str):
    # one-arg lambda factory: a default-arg closure inside F.filter
    # would arrive as a TWO-arg lambda, which F.filter calls with
    # (element, index) — the index would silently replace the term
    return lambda t: t == F.lit(term)


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 lexical top-k for a fixed bag-of-terms query — the keyword
    complement to the engine's vector search (Robertson/Sparck Jones
    Okapi BM25, the same scoring Lucene/Elasticsearch default to).

    Returns ``(doc_id, score, rank)`` for the ``k`` best-scoring
    documents with at least one query term, rank by ``(score DESC,
    doc_id)``.

    Scale shape: per-term term frequencies are *scan-local* —
    ``size(filter(tokens, t -> t = term))`` per term, no posting-list
    explode, no shuffle; corpus statistics (N, avgdl, per-term doc
    frequencies) reduce to ONE map-side-combined aggregate row that is
    broadcast back; the only ordered step is the global top-k, which
    Catalyst executes as TakeOrdered (per-partition heap + driver
    merge of k·partitions rows), never a full sort. The score itself
    sums the per-term contributions in fixed literal order, so the
    double-precision result is reproducible by the SQL oracle.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    if k <= 0:
        raise ValueError("k must be positive")
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct")

    # hoist the tokenization into a column first: Catalyst does not
    # CSE across higher-order-function boundaries (same pitfall as
    # similarity.normalize_vectors), so referencing tokens_expr in
    # every tf projection would re-split the text T+1 times per row
    per_doc = df.select(
        F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").cast("double").alias("dl"),
        *[
            F.size(F.filter("__toks", _eq_lit(term)))
            .cast("double")
            .alias(f"tf_{i}")
            for i, term in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    # Okapi BM25 with the +1 floor (Lucene variant): idf never negative.
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contribs = []
    for i in range(len(terms)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"tf_{i}")
        contribs.append(idf * tf * F.lit(k1 + 1.0) / (tf + norm))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    # top-k via orderBy+limit → TakeOrderedAndProject: each map task
    # forwards its local k, the driver merges — never a full shuffle
    # of every scoring doc into one window partition. (Spark 4.1 does
    # NOT plant a WindowGroupLimit under an unpartitioned window —
    # verified empirically — so the rank-then-filter shape would
    # funnel the corpus through a single task.) The rank window then
    # runs over ≤ k rows, where single-partition is free.
    top = (
        scored.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def length_quantiles(
    df: DataFrame,
    *,
    by_col: str | None = "lang",
    len_col: str = "n_chars",
    probs: tuple = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact linear-interpolated length quantiles per group — the
    corpus length profile a curation pipeline reads before choosing
    chunking and packing budgets.

    Uses Spark's exact ``percentile`` (same ``(n−1)·q`` interpolation
    rule as DuckDB ``quantile_cont``, so the oracle matches
    bit-for-bit). Exact percentile shuffles each group's values to one
    reducer — right for profile-sized groups (languages, sources); at
    genuinely unbounded cardinality swap in ``percentile_approx``
    (t-digest sketch, map-side combinable) and drop the oracle to a
    tolerance check.

    Returns ``(group, n_docs, p25, p50, p75, p95)``-style columns,
    one row per group.
    """
    if not probs or any(not 0 <= p <= 1 for p in probs):
        raise ValueError("probs must be fractions in [0, 1]")
    group = (
        F.col(by_col).alias("group")
        if by_col is not None
        else F.lit("all").alias("group")
    )
    aggs = [F.count("*").alias("n_docs")]
    for p in probs:
        aggs.append(
            F.percentile(F.col(len_col), F.lit(p)).alias(
                f"p{int(round(p * 100))}"
            )
        )
    return df.select(group, F.col(len_col)).groupBy("group").agg(*aggs)


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Batched BM25 — the inverted-index formulation: many keyword
    queries scored in ONE plan. ``queries`` is ``(query_id,
    terms ARRAY<STRING>)``. Returns ``(query_id, rank, doc_id,
    score_nanos)``.

    Scale shape (this is the posting-list pruning that makes corpus-
    scale lexical search work): the corpus explodes to (doc, token)
    counts, then a BROADCAST SEMI-JOIN against the distinct query
    terms discards every token no query mentions — the shuffle carries
    only matching postings, not the corpus vocabulary. Document
    lengths and per-term document frequencies are corpus statistics
    computed in the same plan; per-(query, doc, term) contributions
    then sum per (query, doc).

    Determinism: each term's contribution is floored to integer nanos
    BEFORE the sum — integer addition commutes, so the score is
    reproducible under any aggregation order (a raw double sum over a
    shuffled term set is not). The ranking therefore scores sums of
    per-term floors; the per-term quantization error is < 1e-9 per
    term — irrelevant to ranking, essential to bit-stable results.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    if k <= 0:
        raise ValueError("k must be positive")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("__toks")
    )
    dl = toks.select(
        "doc_id", F.size("__toks").cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(terms_col).alias("term"),
    ).distinct()
    vocab = qterms.select("term").distinct()
    postings = (
        toks.select("doc_id", F.explode("__toks").alias("term"))
        .join(F.broadcast(vocab), "term")  # posting-list pruning
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    contrib = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = (
        idf * F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    )
    scored = (
        contrib.select(
            "query_id",
            "doc_id",
            F.floor(term_score * F.lit(1_000_000_000))
            .cast("long")
            .alias("__nanos"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__nanos").alias("score_nanos"))
        .filter(F.col("score_nanos") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_nanos").desc(), "doc_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_nanos")
    )


def unigram_surprisal(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Language-model quality signal without an external model: train
    a unigram LM on the corpus itself and score every document by its
    total token surprisal ``Σ −ln p(token)`` (the CCNet/perplexity-
    filter idea, first-order version — documents full of corpus-
    atypical tokens score high; boilerplate scores low).

    Returns ``(doc_id, n_tokens, surprisal_micros)`` where each
    token's surprisal is floored to integer MICROS before summation —
    per-token quantization ≤ 1e-6 nat (irrelevant to any filtering
    threshold) buys an order-independent integer sum that both
    engines reproduce bit-for-bit; a raw double sum over a shuffled
    token stream would not. Divide by ``n_tokens`` downstream for the
    mean.

    Scale shape: vocabulary counts are one map-side-combined shuffle;
    the token→probability join keys on the token (vocabulary-sized
    build side), and the per-doc sum combines map-side. Nothing is
    all-pairs; the corpus text rides the explode exactly once.
    """
    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(text_col)).alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    scored = toks.join(vocab, "token").crossJoin(F.broadcast(total))
    surprisal = -F.log(F.col("cnt").cast("double") / F.col("total"))
    per_tok = scored.select(
        "doc_id",
        F.floor(surprisal * F.lit(1_000_000)).cast("long").alias("__u"),
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("__u").alias("surprisal_micros"),
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("surprisal_micros", F.lit(0)).alias("surprisal_micros"),
    )


def collocations(
    df: DataFrame,
    k: int = 20,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """Corpus collocations: the ``k`` adjacent word pairs with the
    highest pointwise mutual information ``PMI = ln(p(ab)/(p(a)p(b)))``
    among pairs seen ≥ ``min_count`` times — the classic multiword-
    expression detector (Church & Hanks 1990).

    Returns ``(rank, tok_a, tok_b, n_pairs, pmi_micros)``, rank by
    ``(pmi_micros DESC, tok_a, tok_b)``; the PMI is floored to
    integer micros so ranking and values are engine-exact.

    Scale shape: bigrams shingle scan-locally (posexplode + lead, the
    MinHash pattern); pair and unigram counts are map-side-combined
    shuffles on vocabulary-sized keys; the ``min_count`` cut prunes
    the tail before the PMI projection; top-k is TakeOrdered.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    if k <= 0:
        raise ValueError("k must be positive")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        tok.select(
            F.col("tok").alias("tok_a"),
            F.lead("tok").over(w).alias("tok_b"),
        )
        .filter(F.col("tok_b").isNotNull())
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_count)
    )
    uni = tok.groupBy(F.col("tok").alias("t")).agg(
        F.count("*").alias("n_tok")
    )
    totals = tok.agg(
        F.count("*").cast("double").alias("n_unigrams")
    ).crossJoin(
        pairs.agg(F.sum("n_pairs").cast("double").alias("n_bigrams"))
    )
    joined = (
        pairs.join(uni.withColumnRenamed("t", "tok_a"), "tok_a")
        .withColumnRenamed("n_tok", "na")
        .join(uni.withColumnRenamed("t", "tok_b"), "tok_b")
        .withColumnRenamed("n_tok", "nb")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("n_pairs").cast("double") / F.col("n_bigrams"))
        / (
            (F.col("na").cast("double") / F.col("n_unigrams"))
            * (F.col("nb").cast("double") / F.col("n_unigrams"))
        )
    )
    scored = joined.select(
        "tok_a",
        "tok_b",
        "n_pairs",
        F.floor(pmi * F.lit(1_000_000)).cast("long").alias("pmi_micros"),
    )
    # TakeOrdered top-k (map-side local k), NOT rank-then-filter: an
    # unpartitioned window would move the whole pruned-pair vocabulary
    # through one task (Spark 4.1 plants no WindowGroupLimit there)
    top = scored.orderBy(
        F.col("pmi_micros").desc(), "tok_a", "tok_b"
    ).limit(k)
    wr = Window.orderBy(F.col("pmi_micros").desc(), "tok_a", "tok_b")
    return top.withColumn(
        "rank", F.row_number().over(wr).cast("int")
    ).select("rank", "tok_a", "tok_b", "n_pairs", "pmi_micros")


def keyword_snippets(
    df: DataFrame,
    term: str,
    *,
    width: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Search-result snippets: for documents containing ``term``
    (case-insensitive), a ±``width``-char window around the first
    occurrence — the highlighting stage after BM25/hybrid ranking.

    Scan-local ``position``/``substring`` codegen over the matched
    rows only (the containment filter pushes into the scan); zero
    shuffle, no UDF. Returns ``(doc_id, match_pos, snippet)`` with
    1-based ``match_pos``.

    The match position is found on a lowercased copy (for the
    case-insensitive search) but the snippet is cut from the ORIGINAL
    text, preserving user-facing casing. Positions on the two strings
    align for ASCII; for the rare Unicode code points where
    ``lower()`` changes string length (e.g. İ → i̇) the window can be
    off by the accumulated length delta — acceptable for highlighting,
    documented here rather than paying a per-row normalization pass.
    """
    if not term:
        raise ValueError("term must be non-empty")
    if width < 0:
        raise ValueError("width must be non-negative")
    low = F.lower(F.col(text_col))
    pos = F.locate(term.lower(), low)
    start = F.greatest(pos - F.lit(width), F.lit(1))
    length = F.lit(len(term) + 2 * width)
    return (
        df.filter(pos > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            pos.cast("long").alias("match_pos"),
            F.substring(F.col(text_col), start, length).alias("snippet"),
        )
    )


def top_ngram_concentration(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """The remaining Gopher repetition rule (Rae et al. 2021 §A1.1):
    the fraction of a document's token characters covered by its single
    most frequent word n-gram — catches one dominating phrase
    (keyword stuffing, generation loops) that the distinct-ratio signal
    in :func:`repetition_stats` dilutes when the rest of the document
    is varied. Gopher bounds the 2-gram fraction at 0.20.

    Returns ``(doc_id, top_ngram, top_count, char_frac)`` where
    ``char_frac = top_count · len_chars(top_ngram_tokens) /
    total_token_chars`` (integer arithmetic up to one final double
    division — engine-exact). Ties break to the lexicographically
    smallest n-gram; documents with < n tokens get ('', 0, 0.0).

    Scale shape: scan-side shingling (posexplode + window lead, the
    MinHash pattern), one map-side-combined count keyed by
    ``(doc_id, gram)``, a per-doc leader via WindowGroupLimit-eligible
    row_number, and a join back to the scan-local char totals — no
    driver state, no UDF.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    toks = tokens_expr(text_col)
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
    )
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    grams = (
        tok.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("gram"),
            parts[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    lead_w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("gram")
    )
    top = (
        grams.withColumn("__rn", F.row_number().over(lead_w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("gram").alias("top_ngram"), "cnt")
    )
    return totals.join(top, "doc_id", "left").select(
        "doc_id",
        F.coalesce("top_ngram", F.lit("")).alias("top_ngram"),
        F.coalesce("cnt", F.lit(0)).cast("long").alias("top_count"),
        F.when(
            F.col("cnt").isNotNull() & (F.col("total_chars") > 0),
            (
                F.col("cnt")
                # chars of the gram's tokens = len(gram) - (n-1) spaces
                * (F.length("top_ngram") - F.lit(n - 1))
            ).cast("double")
            / F.col("total_chars").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("char_frac"),
    )


def dsir_scores(
    df: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR-style importance score for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling" — first-order unigram variant): every document in
    ``df`` scores ``Σ_tokens ln p_target(w) − ln p_raw(w)``, the
    log-likelihood ratio between a unigram LM of the ``target``
    (high-quality / in-domain) corpus and one of the raw corpus.
    Documents that look like the target score high; selection is then
    a top-fraction cut (see :func:`dsir_select`).

    Both LMs use add-``smoothing`` estimates over the RAW corpus
    vocabulary, so every raw token has positive probability under
    both. Per-token ratios are floored to integer micros before
    summation (the :func:`unigram_surprisal` discipline) — the
    per-doc sum is order-independent and engine-exact.

    Returns ``(doc_id, n_tokens, dsir_micros)``; empty docs score 0.

    Scale shape: two vocabulary aggregations (map-side combined), a
    vocabulary-keyed join to attach per-token stats, one per-doc sum.
    The target corpus is typically small (a curated set) but nothing
    here requires it; no all-pairs step anywhere.
    """
    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    if smoothing <= 0:
        raise ValueError("smoothing must be positive")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(text_col)).alias("token"),
    )
    raw_vocab = toks.groupBy("token").agg(F.count("*").alias("raw_cnt"))
    tgt_toks = target.select(
        F.explode(tokens_expr(text_col)).alias("token")
    )
    tgt_vocab = tgt_toks.groupBy("token").agg(
        F.count("*").alias("tgt_cnt")
    )
    stats = (
        raw_vocab.agg(
            F.sum("raw_cnt").cast("double").alias("raw_total"),
            F.count("*").cast("double").alias("vsize"),
        )
        .crossJoin(
            tgt_toks.agg(
                F.count("*").cast("double").alias("tgt_total")
            )
        )
    )
    a = F.lit(float(smoothing))
    vocab = (
        raw_vocab.join(tgt_vocab, "token", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            (
                F.log(
                    (
                        F.coalesce(F.col("tgt_cnt"), F.lit(0)).cast(
                            "double"
                        )
                        + a
                    )
                    / (F.col("tgt_total") + a * F.col("vsize"))
                )
                - F.log(
                    (F.col("raw_cnt").cast("double") + a)
                    / (F.col("raw_total") + a * F.col("vsize"))
                )
            ).alias("__llr"),
        )
        .select(
            "token",
            F.floor(F.col("__llr") * F.lit(1_000_000))
            .cast("long")
            .alias("llr_micros"),
        )
    )
    per_doc = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("llr_micros").alias("dsir_micros"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("dsir_micros", F.lit(0)).alias("dsir_micros"),
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
    length_normalize: bool = True,
) -> DataFrame:
    """Top-``k`` documents by DSIR score — the selection step.

    ``length_normalize`` ranks by mean per-token ratio (so long
    documents don't win on length alone); ties break by doc_id. At
    warehouse scale the top-k is TakeOrdered over the score frame —
    no global sort of the corpus.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    scores = dsir_scores(
        df, target, text_col=text_col, id_col=id_col, smoothing=smoothing
    )
    rank_col = (
        (
            F.col("dsir_micros").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
        )
        if length_normalize
        else F.col("dsir_micros").cast("double")
    )
    return (
        scores.select(
            "doc_id",
            "n_tokens",
            "dsir_micros",
            F.floor(rank_col).cast("long").alias("rank_key"),
        )
        .orderBy(F.col("rank_key").desc(), "doc_id")
        .limit(k)
    )


def source_drift_kl(
    df: DataFrame,
    *,
    by_col: str = "source",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Distribution drift per corpus slice: KL(P_slice ‖ P_corpus)
    over the unigram distributions, with add-``smoothing`` estimates
    on the corpus vocabulary — the monitor a pipeline runs per
    source / per day to catch a feed going off-distribution before it
    poisons a training mix.

    Returns ``(group, n_tokens, kl_micros)`` — per-word contributions
    ``p_s(w)·ln(p_s(w)/p(w))`` floored to integer micros before the
    sum (the engine-wide order-independence discipline), so the score
    is bit-reproducible. Note KL ≥ 0 holds for the true quantity;
    per-term flooring can leave tiny negatives for near-identical
    distributions — it is a drift SCORE, compared against thresholds
    orders of magnitude above the quantization.

    Scale shape: one (group, token) aggregation + one vocabulary
    aggregation; the join keys on the token (vocabulary-sized sides);
    final sum is per-group. The corpus text explodes exactly once.
    """
    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    if smoothing <= 0:
        raise ValueError("smoothing must be positive")
    toks = df.select(
        F.col(by_col).alias("group"),
        F.explode(tokens_expr(text_col)).alias("token"),
    )
    per_group = toks.groupBy("group", "token").agg(
        F.count("*").alias("g_cnt")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("c_cnt"))
    gtotals = toks.groupBy("group").agg(
        F.count("*").cast("double").alias("g_total")
    )
    stats = vocab.agg(
        F.sum("c_cnt").cast("double").alias("c_total"),
        F.count("*").cast("double").alias("vsize"),
    )
    a = F.lit(float(smoothing))
    joined = (
        per_group.join(vocab, "token")
        .join(F.broadcast(gtotals), "group")
        .crossJoin(F.broadcast(stats))
    )
    p_s = (F.col("g_cnt").cast("double") + a) / (
        F.col("g_total") + a * F.col("vsize")
    )
    p_c = (F.col("c_cnt").cast("double") + a) / (
        F.col("c_total") + a * F.col("vsize")
    )
    contrib = F.floor(
        p_s * (F.log(p_s) - F.log(p_c)) * F.lit(1_000_000_000)
    ).cast("long")
    return (
        joined.select("group", "g_cnt", contrib.alias("__c"))
        .groupBy("group")
        .agg(
            F.sum("g_cnt").alias("n_tokens"),
            F.sum("__c").alias("kl_nanos"),
        )
        .orderBy("group")
    )


def bigram_surprisal(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Second-order LM quality signal: per-document total bigram
    surprisal ``Σ −ln p(wᵢ | wᵢ₋₁)`` under a self-trained add-1
    bigram model (p = (c(ab)+1)/(c(a)+V), V = unigram vocabulary).
    Catches what the unigram filter can't: documents whose words are
    individually common but locally incoherent (shuffled text, word
    salads) score high; natural phrasing scores low.

    Same determinism discipline as :func:`unigram_surprisal`: each
    bigram's surprisal floors to integer micros before the per-doc
    sum. Returns ``(doc_id, n_bigrams, surprisal_micros)``; docs with
    < 2 tokens score 0.

    Scale shape: bigrams shingle scan-locally (posexplode + lead);
    bigram and unigram counts are vocabulary-keyed map-side-combined
    shuffles; the two count joins key on vocabulary-sized sides; one
    per-doc sum. The corpus text explodes exactly once.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        tok.select(
            "doc_id",
            F.col("tok").alias("tok_a"),
            F.lead("tok").over(w).alias("tok_b"),
        )
        .filter(F.col("tok_b").isNotNull())
    )
    bi_counts = bi.groupBy("tok_a", "tok_b").agg(
        F.count("*").alias("c_ab")
    )
    uni_counts = tok.groupBy(F.col("tok").alias("t")).agg(
        F.count("*").alias("c_a")
    )
    vsize = uni_counts.agg(
        F.count("*").cast("double").alias("vsize")
    )
    scored_vocab = (
        bi_counts.join(
            uni_counts, bi_counts.tok_a == uni_counts.t
        )
        .crossJoin(F.broadcast(vsize))
        .select(
            "tok_a",
            "tok_b",
            F.floor(
                -F.log(
                    (F.col("c_ab").cast("double") + F.lit(1.0))
                    / (F.col("c_a").cast("double") + F.col("vsize"))
                )
                * F.lit(1_000_000)
            )
            .cast("long")
            .alias("s_micros"),
        )
    )
    per_doc = (
        bi.join(scored_vocab, ["tok_a", "tok_b"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("s_micros").alias("surprisal_micros"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("surprisal_micros", F.lit(0)).alias(
            "surprisal_micros"
        ),
    )


def cluster_keywords(
    df: DataFrame,
    *,
    cluster_col: str,
    text_col: str = "text",
    top_k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Corpus-map labeling: per cluster, the ``top_k`` most DISTINCTIVE
    tokens by cluster-term PMI ``ln(p(tok|cluster) / p(tok))`` among
    tokens seen ≥ ``min_count`` times inside the cluster — the labels
    a dataset card prints next to each k-means cluster / source /
    language slice ("what is this slice about?"). Per-source frequency
    alone ranks stopwords first; the corpus-marginal denominator is
    what surfaces the slice's signature vocabulary.

    Returns ``(cluster, rank, token, n_in_cluster, pmi_micros)``, rank
    by ``(pmi_micros DESC, token ASC)`` within each cluster; PMI is
    floored to integer micros so ranking and values are engine-exact.

    Scale shape: tokens explode scan-locally ONCE; (cluster, token)
    counts and token marginals are map-side-combined shuffles on
    vocabulary-sized keys; cluster totals are cluster-count-sized and
    broadcast; the per-cluster top-k is a rank filter over a window
    PARTITIONED by cluster, so Spark 4.1 plants a partial
    WindowGroupLimit below the exchange — each map task forwards at
    most ``top_k`` rows per cluster, never the vocabulary.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from vector_indexer_spark.functions.text import tokens_expr  # noqa: PLC0415

    if top_k <= 0:
        raise ValueError("top_k must be positive")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    tok = df.select(
        F.col(cluster_col).alias("cluster"),
        F.explode(tokens_expr(text_col)).alias("tok"),
    )
    ct = tok.groupBy("cluster", "tok").agg(
        F.count("*").alias("n_in_cluster")
    ).filter(F.col("n_in_cluster") >= min_count)
    marg = tok.groupBy("tok").agg(F.count("*").alias("n_corpus"))
    ctot = tok.groupBy("cluster").agg(F.count("*").alias("n_cluster_toks"))
    total = tok.agg(F.count("*").cast("double").alias("n_total"))
    pmi = F.log(
        (F.col("n_in_cluster").cast("double")
         / F.col("n_cluster_toks").cast("double"))
        / (F.col("n_corpus").cast("double") / F.col("n_total"))
    )
    scored = (
        ct.join(marg, "tok")
        .join(F.broadcast(ctot), "cluster")
        .crossJoin(F.broadcast(total))
        .select(
            "cluster",
            F.col("tok").alias("token"),
            "n_in_cluster",
            F.floor(pmi * F.lit(1_000_000)).cast("long").alias("pmi_micros"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("pmi_micros").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("cluster", "rank", "token", "n_in_cluster", "pmi_micros")
    )


def dedup_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Within-document repeated-line removal: keep the FIRST occurrence
    of each line, preserve order, rejoin — the intra-doc counterpart of
    cross-doc boilerplate stripping (navigation menus, cookie banners,
    and chat transcripts repeat lines inside one page). Returns
    ``(doc_id, n_lines, n_kept, text)``.

    Entirely scan-local array expressions (split → positional filter →
    rejoin): zero shuffle, no UDF, whole-stage codegen. The positional
    keep-first filter is O(lines²) per document — lines per doc is
    bounded in practice (and the quadratic term is in-core, not in the
    shuffle), unlike a posexplode + window formulation which would pay
    a corpus-wide shuffle for a per-row rewrite.
    """
    import re  # noqa: PLC0415

    lines = F.split(F.col(text_col), re.escape(sep))
    kept = F.filter(
        F.col("__lines"),
        lambda x, i: ~F.array_contains(F.slice(F.col("__lines"), 1, i), x),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"), lines.alias("__lines")
        )
        .select(
            "doc_id",
            F.size("__lines").cast("long").alias("n_lines"),
            kept.alias("__kept"),
        )
        .select(
            "doc_id",
            "n_lines",
            F.size("__kept").cast("long").alias("n_kept"),
            F.array_join("__kept", sep).alias("text"),
        )
    )
