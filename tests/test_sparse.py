"""Sparse-vector retrieval: posting join, champion-list cap, encode."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.sparse import (
    sparse_from_tokens,
    sparse_search_tokens,
    sparse_topk,
)

MICROS = 1_000_000


def _sparse_frames(spark, n=40, vocab=50, nnz=6, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    mats = {}
    for i in range(n):
        idx = np.sort(rng.choice(vocab, size=nnz, replace=False))
        w = rng.uniform(0.1, 2.0, size=nnz)
        rows.append((i, [int(x) for x in idx], [float(x) for x in w]))
        dense = np.zeros(vocab)
        dense[idx] = w
        mats[i] = dense
    df = spark.createDataFrame(
        rows, "doc_id long, indices array<int>, weights array<double>"
    )
    q = spark.createDataFrame(
        [(i, rows[i][1], rows[i][2]) for i in range(5)],
        "query_id long, indices array<int>, weights array<double>",
    )
    return df, q, mats


def _expected_scores(mats, qid):
    """Replicate the integer-micros contract: floor each per-term
    product to micros, then sum."""
    out = {}
    qv = mats[qid]
    for did, dv in mats.items():
        terms = np.flatnonzero((qv != 0) & (dv != 0))
        if len(terms) == 0:
            continue
        out[did] = int(
            sum(int(np.floor(qv[t] * dv[t] * MICROS)) for t in terms)
        )
    return out


class TestSparseTopk:
    def test_matches_bruteforce_integer_micros(self, spark):
        df, q, mats = _sparse_frames(spark)
        got = sparse_topk(df, q, k=40).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, {})[r.doc_id] = r.score_micros
        for qid in range(5):
            assert by_q[qid] == _expected_scores(mats, qid), qid

    def test_ranking_order_and_ties(self, spark):
        df, q, mats = _sparse_frames(spark, seed=2)
        got = sparse_topk(df, q, k=10).collect()
        for qid in range(5):
            rows = sorted(
                (r for r in got if r.query_id == qid), key=lambda r: r.rank
            )
            keys = [(-r.score_micros, r.doc_id) for r in rows]
            assert keys == sorted(keys), qid

    def test_no_shared_term_no_row(self, spark):
        df = spark.createDataFrame(
            [(0, [1, 2], [1.0, 1.0])],
            "doc_id long, indices array<int>, weights array<double>",
        )
        q = spark.createDataFrame(
            [(0, [5, 6], [1.0, 1.0])],
            "query_id long, indices array<int>, weights array<double>",
        )
        assert sparse_topk(df, q, k=5).count() == 0

    def test_champion_cap_exact_when_loose_prunes_when_tight(self, spark):
        df, q, mats = _sparse_frames(spark, n=60, vocab=10, nnz=4, seed=4)
        full = sparse_topk(df, q, k=5).collect()
        loose = sparse_topk(df, q, k=5, max_postings_per_term=60).collect()
        assert {(r.query_id, r.rank, r.doc_id, r.score_micros) for r in full} == {
            (r.query_id, r.rank, r.doc_id, r.score_micros) for r in loose
        }
        # tight cap: every surviving posting is in its term's top-2 by
        # (weight desc, id) — scores can only shrink
        tight = sparse_topk(df, q, k=60, max_postings_per_term=2).collect()
        full_all = {
            (r.query_id, r.doc_id): r.score_micros
            for r in sparse_topk(df, q, k=60).collect()
        }
        for r in tight:
            assert r.score_micros <= full_all[(r.query_id, r.doc_id)]

    def test_validation(self, spark):
        df, q, _ = _sparse_frames(spark, n=5)
        with pytest.raises(ValueError):
            sparse_topk(df, q, k=0)
        with pytest.raises(ValueError):
            sparse_topk(df, q, k=5, max_postings_per_term=0)
        with pytest.raises(ValueError, match="requires"):
            sparse_topk(df, q, k=5, rescore_shortlist=10)
        with pytest.raises(ValueError, match=">= k"):
            sparse_topk(
                df, q, k=5, max_postings_per_term=3, rescore_shortlist=4
            )

    def test_rescore_scores_are_exact_full_scores(self, spark):
        """The cap+rescore tier's returned SCORES are the full
        (uncapped) posting scores of the shortlisted docs — the cap
        only selects candidates. With a corpus-sized shortlist the
        result is identical to the exact uncapped top-k."""
        df, q, mats = _sparse_frames(spark, n=60, vocab=10, nnz=4, seed=4)
        exact = {
            (r.query_id, r.rank, r.doc_id, r.score_micros)
            for r in sparse_topk(df, q, k=5).collect()
        }
        # loose cap + corpus-sized shortlist: identical to exact (a doc
        # evicted from EVERY champion list is unreachable by design —
        # candidate generation is capped; with a loose cap nothing is)
        resc = {
            (r.query_id, r.rank, r.doc_id, r.score_micros)
            for r in sparse_topk(
                df, q, k=5, max_postings_per_term=60, rescore_shortlist=60
            ).collect()
        }
        assert resc == exact
        # tighter shortlist: every returned score still equals the
        # full-posting score (never the capped partial sum)
        full = _expected_scores(mats, 0)
        got = sparse_topk(
            df, q, k=5, max_postings_per_term=2, rescore_shortlist=8
        ).collect()
        for r in got:
            if r.query_id == 0:
                assert r.score_micros == full[r.doc_id]

    def test_rescore_recovers_cap_quality_on_skew(self, spark):
        """Planted hot-term skew (the regime the cap exists for): the
        bare cap loses true top-k docs whose mass sits in a hot term's
        evicted tail; cap+rescore recovers them whenever the capped
        shortlist still surfaces the doc via any term."""
        rng = np.random.default_rng(9)
        rows = []
        # every doc shares hot term 0 (the cap evicts most of its
        # postings), plus 3 rare discriminative terms carrying the
        # mass (the idf regime): true top-k docs stay REACHABLE via
        # their uncapped rare terms, but the bare cap's scores drop
        # the hot-term contribution of every evicted doc — rescore
        # restores it
        for i in range(80):
            idx = [0] + [
                int(x) for x in np.sort(rng.choice(np.arange(1, 60), 3, False))
            ]
            w = [float(rng.uniform(0.5, 1.5))] + [
                float(x) for x in rng.uniform(2.0, 3.0, 3)
            ]
            rows.append((i, idx, w))
        df = spark.createDataFrame(
            rows, "doc_id long, indices array<int>, weights array<double>"
        )
        q = spark.createDataFrame(
            rows[:3],
            "query_id long, indices array<int>, weights array<double>",
        )
        exact = {
            (r.query_id, r.doc_id)
            for r in sparse_topk(df, q, k=10).collect()
        }
        capped = {
            (r.query_id, r.doc_id)
            for r in sparse_topk(
                df, q, k=10, max_postings_per_term=5
            ).collect()
        }
        resc = {
            (r.query_id, r.doc_id)
            for r in sparse_topk(
                df, q, k=10, max_postings_per_term=5, rescore_shortlist=40
            ).collect()
        }
        assert len(resc & exact) >= len(capped & exact)
        assert len(resc & exact) >= 25  # near-full recovery (30 pairs)


class TestSparseEncode:
    def test_encode_shape_and_sorted_indices(self, spark, documents):
        enc = sparse_from_tokens(documents, vocab_size=4096)
        rows = enc.limit(50).collect()
        assert rows
        for r in rows:
            assert len(r.indices) == len(r.weights)
            assert list(r.indices) == sorted(r.indices)
            assert len(set(r.indices)) == len(r.indices)
            assert all(w > 0 for w in r.weights)  # smoothed idf > 0

    def test_empty_text_produces_no_row(self, spark):
        df = spark.createDataFrame(
            [(0, "hello world"), (1, "???!!!")],
            "doc_id long, text string",
        )
        ids = {r.id for r in sparse_from_tokens(df).collect()}
        assert ids == {0}

    def test_vocab_validation(self, spark, documents):
        with pytest.raises(ValueError):
            sparse_from_tokens(documents, vocab_size=0)


class TestSparseSearchTokens:
    def test_query_doc_scores_itself_positively(self, spark, documents):
        q = documents.filter(F.col("doc_id") < 3)
        # full depth: "self in top-10" is NOT a tf-idf guarantee (longer
        # docs can out-dot a query's own doc); positive self-score is
        got = sparse_search_tokens(
            documents, q, k=10_000_000, query_id_col="doc_id"
        )
        rows = got.collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, {})[r.doc_id] = r.score_micros
        for qid in (0, 1, 2):
            assert qid in by_q and qid in by_q[qid]
            assert by_q[qid][qid] > 0

    def test_query_stats_come_from_corpus(self, spark):
        # a term missing from the corpus carries no mass even if the
        # query repeats it; shared terms still match
        docs = spark.createDataFrame(
            [(0, "apple banana"), (1, "apple cherry"), (2, "durian fig")],
            "doc_id long, text string",
        )
        q = spark.createDataFrame(
            [(100, "apple zzzzunknown zzzzunknown zzzzunknown")],
            "doc_id long, text string",
        )
        got = sparse_search_tokens(docs, q, k=5, query_id_col="doc_id").collect()
        hit_docs = {r.doc_id for r in got}
        assert hit_docs == {0, 1}


class TestBm25Weighting:
    def test_length_normalization_prefers_concise_doc(self, spark):
        # same tf for the query term; doc 1 is padded much longer —
        # BM25's dl/avgdl denominator must rank the concise doc first,
        # while tf-idf (no length norm) ties them
        docs = spark.createDataFrame(
            [
                (0, "needle haystack"),
                (1, "needle " + " ".join(f"pad{i}" for i in range(60))),
                (2, "other stuff entirely"),
            ],
            "doc_id long, text string",
        )
        q = spark.createDataFrame(
            [(100, "needle")], "doc_id long, text string"
        )
        got = sparse_search_tokens(
            docs, q, k=5, query_id_col="doc_id", weighting="bm25"
        ).collect()
        ranked = [r.doc_id for r in sorted(got, key=lambda r: r.rank)]
        assert ranked[0] == 0 and ranked[1] == 1
        scores = {r.doc_id: r.score_micros for r in got}
        assert scores[0] > scores[1] > 0
        assert 2 not in scores

    def test_idf_downweights_common_terms(self, spark):
        # "common" appears everywhere, "rare" once: a query with both
        # must rank the rare-term doc above a common-only doc
        docs = spark.createDataFrame(
            [
                (0, "common rare"),
                (1, "common common"),
                (2, "common filler"),
                (3, "common words"),
            ],
            "doc_id long, text string",
        )
        q = spark.createDataFrame(
            [(9, "common rare")], "doc_id long, text string"
        )
        got = sparse_search_tokens(
            docs, q, k=4, query_id_col="doc_id", weighting="bm25"
        ).collect()
        top = min(got, key=lambda r: r.rank)
        assert top.doc_id == 0

    def test_weighting_validation(self, spark, documents):
        q = documents.limit(1)
        with pytest.raises(ValueError):
            sparse_search_tokens(
                documents, q, query_id_col="doc_id", weighting="nope"
            )


class TestManifest:
    """Incremental posting-manifest rung: append-only (id, term, tf)
    postings; df/N derive from the manifest at query time."""

    def test_manifest_plus_delta_equals_full_rebuild(self, spark, documents):
        from vector_indexer_spark.operators.sparse import (
            sparse_manifest,
            sparse_search_manifest,
        )

        docs = documents.select("doc_id", "text")
        standing = sparse_manifest(docs.filter(F.col("doc_id") % 10 != 0))
        delta = sparse_manifest(docs.filter(F.col("doc_id") % 10 == 0))
        merged = standing.unionByName(delta)
        full = sparse_manifest(docs)
        q = docs.filter(F.col("doc_id") < 4)
        a = sparse_search_manifest(
            merged, q, k=10, query_id_col="doc_id"
        ).collect()
        b = sparse_search_manifest(
            full, q, k=10, query_id_col="doc_id"
        ).collect()
        key = lambda r: (r.query_id, r.rank)  # noqa: E731
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) > 0

    def test_manifest_rescore_matches_tokens_rescore(self, spark, documents):
        # the cap+rescore tier threads through both entry points with
        # identical stats derivation, so results match exactly
        from vector_indexer_spark.operators.sparse import (
            sparse_manifest,
            sparse_search_manifest,
        )

        docs = documents.select("doc_id", "text")
        q = docs.filter(F.col("doc_id") < 3)
        a = sparse_search_manifest(
            sparse_manifest(docs), q, k=8, query_id_col="doc_id",
            max_postings_per_term=20, rescore_shortlist=24,
        ).collect()
        b = sparse_search_tokens(
            docs, q, k=8, query_id_col="doc_id",
            max_postings_per_term=20, rescore_shortlist=24,
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) > 0

    def test_manifest_bm25_matches_tokens_path(self, spark, documents):
        # BM25 stats (df, N, avgdl) all come from postings on both
        # paths, so manifest search == tokens search exactly
        from vector_indexer_spark.operators.sparse import (
            sparse_manifest,
            sparse_search_manifest,
        )

        docs = documents.select("doc_id", "text")
        q = docs.filter(F.col("doc_id") < 3)
        a = sparse_search_manifest(
            sparse_manifest(docs), q, k=8, query_id_col="doc_id",
            weighting="bm25",
        ).collect()
        b = sparse_search_tokens(
            docs, q, k=8, query_id_col="doc_id", weighting="bm25"
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_delta_shaped_work(self, spark, documents):
        # the delta manifest's plan must not touch the standing corpus
        from vector_indexer_spark.operators.sparse import sparse_manifest
        from vector_indexer_spark.plans import audit

        docs = documents.select("doc_id", "text")
        delta = sparse_manifest(docs.filter(F.col("doc_id") % 10 == 0))
        # pushed to the scan: the standing 90% is never read
        assert audit.has_pushed_filter(delta, "doc_id")

    def test_empty_doc_absent_from_manifest(self, spark):
        from vector_indexer_spark.operators.sparse import sparse_manifest

        docs = spark.createDataFrame(
            [(0, "alpha beta"), (1, "")], "doc_id long, text string"
        )
        ids = {
            r.id for r in sparse_manifest(docs).select("id").collect()
        }
        assert ids == {0}

    def test_manifest_vocab_validation(self, spark, documents):
        from vector_indexer_spark.operators.sparse import sparse_manifest

        with pytest.raises(ValueError):
            sparse_manifest(documents, vocab_size=0)
