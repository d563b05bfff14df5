"""Tests for the corpus-quality operators (repetition, duplicate
n-grams) and the engine-independent LCG generator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators import text_analysis
from vector_indexer_spark.operators.text_analysis import (
    duplicate_ngram_fraction,
    gopher_quality,
    pii_stats,
    redact_pii,
    repetition_stats,
)
from vector_indexer_spark.sources.files import generate_vectors_lcg


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestRepetitionStats:
    def test_hand_computed(self, spark):
        rows = {
            r.doc_id: r
            for r in repetition_stats(
                _docs(spark, ["a a a a", "x y z", "w w", "", "solo"])
            ).collect()
        }
        # "a a a a": bigrams [a a, a a, a a] → 3 total, 1 distinct
        assert rows[0].n_ngrams == 3 and rows[0].n_distinct == 1
        assert rows[0].repetition == pytest.approx(2 / 3)
        # "x y z": all distinct
        assert rows[1].n_ngrams == 2 and rows[1].repetition == 0.0
        assert rows[2].n_ngrams == 1 and rows[2].repetition == 0.0
        # empty / single-token docs: no n-grams, repetition 0
        assert rows[3].n_ngrams == 0 and rows[3].repetition == 0.0
        assert rows[4].n_ngrams == 0 and rows[4].repetition == 0.0

    def test_tokenization_case_punct(self, spark):
        # tokens are lowercased, punctuation splits
        rows = repetition_stats(_docs(spark, ["Foo foo! FOO?"])).collect()
        assert rows[0].n_ngrams == 2 and rows[0].n_distinct == 1

    def test_n_validation(self, spark):
        with pytest.raises(ValueError):
            repetition_stats(_docs(spark, ["x"]), n=0)


class TestDuplicateNgramFraction:
    def test_hand_computed(self, spark):
        df = _docs(
            spark,
            [
                "the quick brown fox jumps",  # shares "the quick brown"+.. with doc1
                "the quick brown fox sleeps",
                "completely different words here",
                "tiny",  # < n tokens
            ],
        )
        rows = {r.doc_id: r for r in duplicate_ngram_fraction(df, n=3).collect()}
        # doc0 trigrams: [the quick brown, quick brown fox, brown fox jumps]
        # shared with doc1: first two
        assert rows[0].n_shingles == 3 and rows[0].n_shared == 2
        assert rows[0].shared_fraction == pytest.approx(2 / 3)
        assert rows[1].n_shingles == 3 and rows[1].n_shared == 2
        assert rows[2].n_shingles == 2 and rows[2].n_shared == 0
        assert rows[3].n_shingles == 0 and rows[3].shared_fraction == 0.0

    def test_duplicate_within_one_doc_not_shared(self, spark):
        # a trigram repeated inside ONE doc only is not cross-doc shared
        df = _docs(spark, ["p q r p q r", "unrelated text entirely"])
        rows = {r.doc_id: r for r in duplicate_ngram_fraction(df, n=3).collect()}
        assert rows[0].n_shared == 0

    def test_all_rows_present(self, spark, documents):
        out = duplicate_ngram_fraction(documents)
        assert out.count() == documents.count()


class TestLcgGenerator:
    def test_shape_and_range(self, spark):
        df = generate_vectors_lcg(spark, 50, 8, seed=3)
        rows = df.collect()
        assert len(rows) == 50
        for r in rows:
            assert len(r.values) == 8
            assert all(-1.0 <= v < 1.0 for v in r.values)

    def test_deterministic_and_partition_invariant(self, spark):
        a = generate_vectors_lcg(spark, 100, 4, seed=9, partitions=1).collect()
        b = generate_vectors_lcg(spark, 100, 4, seed=9, partitions=7).collect()
        am = {r.id: list(r.values) for r in a}
        bm = {r.id: list(r.values) for r in b}
        assert am == bm  # value is a pure function of (id, j, seed)

    def test_seed_changes_output(self, spark):
        a = generate_vectors_lcg(spark, 10, 4, seed=1).collect()
        b = generate_vectors_lcg(spark, 10, 4, seed=2).collect()
        assert {r.id: list(r.values) for r in a} != {
            r.id: list(r.values) for r in b
        }

    def test_rough_uniformity(self, spark):
        vals = np.array(
            [
                v
                for r in generate_vectors_lcg(spark, 500, 16, seed=5).collect()
                for v in r.values
            ]
        )
        assert abs(vals.mean()) < 0.05
        assert 0.5 < vals.std() < 0.65  # uniform(-1,1) std ≈ 0.577

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            generate_vectors_lcg(spark, 0, 4)
        with pytest.raises(ValueError):
            generate_vectors_lcg(spark, 4, 0)

    def test_buildable(self, spark, tmp_path):
        # the generated frame feeds the standard build path
        from vector_indexer_spark.operators.index_build import build_index

        df = generate_vectors_lcg(spark, 300, 8, seed=11)
        idx = build_index(df, str(tmp_path / "idx"), seed=11)
        assert idx.n_vectors == 300


def test_top_tokens_counts_and_rank(spark):
    from vector_indexer_spark.operators.text_analysis import top_tokens

    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog", "en"),
        (2, "le chat", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r.group, r.rank): (r.token, r.n_occurrences, r.n_docs)
        for r in top_tokens(df, k=3).collect()
    }
    assert got[("en", 1)] == ("the", 3, 2)   # 2x doc0 + 1x doc1
    assert got[("fr", 1)][0] in ("chat", "le")  # tie at n=1: token asc
    assert got[("fr", 1)] == ("chat", 1, 1)
    # global (ungrouped) mode
    g = {r.rank: r.token for r in top_tokens(df, k=1, by_col=None).collect()}
    assert g[1] == "the"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        top_tokens(df, k=0)


def test_chunk_documents_multi_chunk_coverage(spark):
    from vector_indexer_spark.operators.text_analysis import chunk_documents

    words = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame(
        [(0, words), (1, "short doc"), (2, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=128, overlap=32).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 300 tokens, stride 96: ceil((300-32)/96) = 3 chunks
    assert [r.chunk_idx for r in by_doc[0]] == [0, 1, 2]
    assert [r.n_tokens for r in by_doc[0]] == [128, 128, 300 - 2 * 96]
    # chunk i starts at token i*stride; overlap region repeats
    c0, c1 = by_doc[0][0].chunk_text.split(), by_doc[0][1].chunk_text.split()
    assert c1[0] == "w96" and c0[96:] == c1[:32]
    # every token covered, in order
    merged = c0 + c1[32:] + by_doc[0][2].chunk_text.split()[32:]
    assert merged == words.split()
    assert by_doc[1][0].n_tokens == 2  # short doc -> one partial chunk
    assert 2 not in by_doc  # token-less doc yields no chunks


def test_chunk_documents_validation(spark):
    from vector_indexer_spark.operators.text_analysis import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_clean_corpus_stages(spark):
    from vector_indexer_spark.operators.text_analysis import clean_corpus

    good = (
        "the cat and the dog went to the market and it was a good day "
        "for everyone that came along with them in the morning"
    )
    rows = [
        (0, good, "a"),
        (1, good, "b"),              # exact dup of 0 -> dropped
        (2, "der hund und die katze sind nicht mit der maus", "c"),  # de
        (3, "zzz 123 456 789", "d"),  # low quality -> dropped
        (4, good + " extra words here today", "e"),  # survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = sorted(r.doc_id for r in clean_corpus(df).collect())
    assert kept == [0, 4]


def test_hash_embed_properties(spark):
    from vector_indexer_spark.operators.text_analysis import hash_embed

    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma"),   # same text -> identical embedding
        (2, "totally different words here"),
        (3, ""),                   # empty -> zero vector (no NaN)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = {r.doc_id: r.embedding for r in hash_embed(df, 32).collect()}
    assert emb[0] == emb[1]
    assert emb[0] != emb[2]
    assert all(len(v) == 32 for v in emb.values())
    import math

    n0 = math.sqrt(sum(v * v for v in emb[0]))
    assert abs(n0 - 1.0) < 1e-12          # unit norm
    assert all(v == 0.0 for v in emb[3])  # empty doc stays zero, no NaN
    unnorm = {
        r.doc_id: r.embedding
        for r in hash_embed(df, 32, normalize=False).collect()
    }
    assert sum(unnorm[0]) == 3.0  # raw counts sum to token count
    with pytest.raises(ValueError, match="positive"):
        hash_embed(df, 0)


def test_hash_split_deterministic_and_proportioned(spark):
    from vector_indexer_spark.operators.splits import hash_split

    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    a = hash_split(df)
    counts = {r.split: r.cnt for r in
              a.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    n = sum(counts.values())
    assert n == 20_000
    assert abs(counts["train"] / n - 0.9) < 0.02
    assert abs(counts["val"] / n - 0.05) < 0.01
    assert abs(counts["test"] / n - 0.05) < 0.01
    # repartitioning must not change any assignment (the point of
    # hashing over randomSplit)
    b = {r.doc_id: r.split
         for r in hash_split(df.repartition(13)).collect()}
    assert all(b[r.doc_id] == r.split for r in a.collect())
    # different seed -> different assignment (some rows move)
    c = {r.doc_id: r.split for r in hash_split(df, seed=7).collect()}
    assert any(c[d] != s for d, s in b.items())


def test_hash_split_validation(spark):
    from vector_indexer_spark.operators.splits import hash_split

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(df, {})
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(df, {"a": 1.5, "b": -0.5})


def test_split_leakage_detects_cross_split_dups(spark):
    from vector_indexer_spark.operators.splits import hash_split, split_leakage

    # duplicate every doc under a shifted id: the shifted copy hashes
    # into a different split for some rows, which is exactly leakage
    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), (F.col("id") % 500).cast("string")).alias(
            "text"
        ),
    )
    leaks = split_leakage(df).collect()
    assert len(leaks) > 0
    splits = {
        r.doc_id: r.split for r in hash_split(df).collect()
    }
    for r in leaks:
        assert all(splits[i] == "train" for i in r.train_ids)
        assert all(splits[i] != "train" for i in r.eval_ids)
    # a dup-free corpus has no leakage by construction
    clean = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("text"),
    )
    assert split_leakage(clean).count() == 0


class TestPii:
    def test_detection_counts(self, spark):
        rows = {
            r.doc_id: r
            for r in pii_stats(
                _docs(
                    spark,
                    [
                        "mail me at jo.doe+x@sub.example.org thanks",
                        "server 192.168.0.1 and 10.0.0.255 up",
                        "call +1 (415) 555-0199 now",
                        "no personal data here",
                        "a@b.io or c@d.co from 8.8.8.8 dial +44 20 7946 0958",
                    ],
                )
            ).collect()
        }
        assert (rows[0].n_email, rows[0].n_ipv4, rows[0].n_phone) == (1, 0, 0)
        assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_phone) == (0, 2, 0)
        assert (rows[2].n_email, rows[2].n_ipv4, rows[2].n_phone) == (0, 0, 1)
        assert rows[3].has_pii == 0
        assert (rows[4].n_email, rows[4].n_ipv4, rows[4].n_phone) == (2, 1, 1)
        assert rows[4].has_pii == 1

    def test_redaction_replaces_every_match(self, spark):
        out = {
            r.doc_id: r.text
            for r in redact_pii(
                _docs(
                    spark,
                    [
                        "mail a@b.io and b@c.de",
                        "ip 1.2.3.4 phone +1 555 0100 end",
                    ],
                )
            ).collect()
        }
        assert out[0] == "mail <EMAIL> and <EMAIL>"
        assert out[1] == "ip <IP> phone <PHONE> end"
        # redacted output re-scanned → no remaining PII
        redacted = redact_pii(_docs(spark, list(out.values())))
        again = pii_stats(redacted.select("doc_id", "text"))
        assert all(r.has_pii == 0 for r in again.collect())


class TestGopherQuality:
    def test_signals_hand_computed(self, spark):
        rows = {
            r.doc_id: r
            for r in gopher_quality(
                _docs(
                    spark,
                    [
                        # 6 words, all alpha, mean len (3+5+3+2+3+4)/6
                        "the quick fox is the best",
                        "1 2 3 4 5 6 7 8",  # digits: alpha frac 0
                        "x ### y ... z",  # symbol-heavy
                    ],
                ),
                min_words=3,
            ).collect()
        }
        r0 = rows[0]
        assert r0.n_words == 6
        assert r0.mean_word_len == pytest.approx(20 / 6)
        assert r0.alpha_word_frac == 1.0
        assert r0.symbol_word_ratio == 0.0
        assert r0.stopword_hits == 3  # the, is, the
        assert r0.passes == 1
        assert rows[1].alpha_word_frac == 0.0 and rows[1].passes == 0
        r2 = rows[2]
        assert r2.n_words == 3  # x, y, z
        assert r2.symbol_word_ratio == pytest.approx(4 / 3)
        assert r2.passes == 0

    def test_word_count_bounds(self, spark):
        df = _docs(spark, ["the quick fox is here today", "the fox"])
        out = {r.doc_id: r.passes for r in gopher_quality(df, min_words=5).collect()}
        assert out[0] == 1 and out[1] == 0


class TestSamplingAndMixture:
    def _docs(self, spark, n=2000):
        return spark.createDataFrame(
            [(i, f"src{i % 4}") for i in range(n)],
            "doc_id long, source string",
        )

    def test_sample_rate_and_determinism(self, spark):
        from vector_indexer_spark.operators.splits import stratified_sample

        df = self._docs(spark)
        out = stratified_sample(
            df, {}, default_rate=0.3, seed=7
        )
        n = out.count()
        assert 0.25 * 2000 < n < 0.35 * 2000
        # repartition-invariant: identical surviving ids
        ids1 = {r.doc_id for r in out.collect()}
        ids2 = {
            r.doc_id
            for r in stratified_sample(
                df.repartition(13), {}, default_rate=0.3, seed=7
            ).collect()
        }
        assert ids1 == ids2

    def test_stratified_rates(self, spark):
        from vector_indexer_spark.operators.splits import stratified_sample

        df = self._docs(spark)
        out = stratified_sample(
            df, {"src0": 1.0, "src1": 0.0}, default_rate=0.5
        )
        by_src = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert by_src["src0"] == 500
        assert "src1" not in by_src
        assert 200 < by_src["src2"] < 300 and 200 < by_src["src3"] < 300

    def test_mixture_fractional_epochs(self, spark):
        from vector_indexer_spark.operators.splits import corpus_mixture

        df = self._docs(spark)
        out = corpus_mixture(df, {"src0": 2.5, "src1": 1.0}).cache()
        n0 = out.filter("source = 'src0'").count()
        # 500 docs * 2.5 epochs => ~1250, with hash noise
        assert 1150 < n0 < 1350, n0
        assert out.filter("source = 'src1'").count() == 500
        assert out.filter("source = 'src2'").count() == 0
        # copy ordinals are dense 0..n-1 per doc
        per_doc = out.filter("source = 'src0'").groupBy("doc_id").agg(
            F.count("*").alias("n"),
            F.min("copy").alias("lo"),
            F.max("copy").alias("hi"),
        )
        bad = per_doc.filter(
            (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
        ).count()
        assert bad == 0
        # every src0 doc appears at least twice (floor of 2.5)
        assert per_doc.filter("n < 2").count() == 0

    def test_validation(self, spark):
        from vector_indexer_spark.operators.splits import (
            corpus_mixture,
            sample_expr,
            stratified_sample,
        )

        df = self._docs(spark, n=10)
        with pytest.raises(ValueError):
            stratified_sample(df, {"src0": 1.5})
        with pytest.raises(ValueError):
            corpus_mixture(df, {"src0": -1.0})
        with pytest.raises(ValueError):
            sample_expr("doc_id", 2.0)


class TestPackSequences:
    def test_contiguity_and_offsets(self, spark):
        from vector_indexer_spark.operators.text_analysis import pack_sequences

        # 10 docs of 3 tokens each, one stream: budget 7 -> bins of
        # cumulative offsets 0,3,6 | 9->bin1 ...
        df = spark.createDataFrame(
            [(i, "a b c") for i in range(10)], "doc_id long, text string"
        )
        rows = sorted(
            pack_sequences(df, budget=7).collect(), key=lambda r: r.doc_id
        )
        before = 0
        for r in rows:
            assert r.n_tokens == 3
            assert r.bin_id == before // 7
            assert r.bin_offset == before % 7
            before += 3
        # bins are contiguous starting at 0
        bins = sorted({r.bin_id for r in rows})
        assert bins == list(range(bins[-1] + 1))

    def test_streams_partition_and_determinism(self, spark):
        from vector_indexer_spark.operators.text_analysis import pack_sequences

        df = spark.createDataFrame(
            [(i, "w " * (i % 5 + 1)) for i in range(200)],
            "doc_id long, text string",
        )
        a = pack_sequences(df, budget=16, n_streams=4).collect()
        b = pack_sequences(
            df.repartition(11), budget=16, n_streams=4
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        streams = {r.stream for r in a}
        assert streams <= set(range(4)) and len(streams) > 1
        # within every stream, bin offsets restart consistently:
        # doc order by id reproduces the cumsum
        from collections import defaultdict

        by_stream = defaultdict(list)
        for r in a:
            by_stream[r.stream].append(r)
        for rs in by_stream.values():
            rs.sort(key=lambda r: r.doc_id)
            before = 0
            for r in rs:
                assert r.bin_id * 16 + r.bin_offset == before
                before += r.n_tokens

    def test_validation(self, spark):
        from vector_indexer_spark.operators.text_analysis import pack_sequences

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            pack_sequences(df, budget=0)
        with pytest.raises(ValueError):
            pack_sequences(df, n_streams=0)


class TestBm25:
    def _docs(self, spark):
        return _docs(
            spark,
            [
                "spark spark spark window",
                "spark window hash",
                "nothing relevant here",
                "hash hash hash hash hash hash hash hash",
            ],
        )

    def test_ranking_and_coverage(self, spark):
        out = text_analysis.bm25_topk(
            self._docs(spark), ["spark", "window", "hash"], k=10
        ).collect()
        by_id = {r.doc_id: r for r in out}
        # doc 2 has no query term -> filtered out
        assert set(by_id) == {0, 1, 3}
        # ranks are 1..n by descending score
        ranks = sorted((r.rank, r.doc_id) for r in out)
        scores = [by_id[d].score for _, d in ranks]
        assert scores == sorted(scores, reverse=True)
        # doc 1 hits all three terms; with saturation it must beat
        # doc 0 (two terms, repeated)
        assert by_id[1].score > by_id[0].score

    def test_tf_saturation(self, spark):
        # k1 bounds the tf contribution: 8x 'hash' in a short doc
        # must score less than (k1+1)x the single-occurrence idf
        docs = _docs(spark, ["hash", "hash hash hash hash hash hash"])
        out = {
            r.doc_id: r.score
            for r in text_analysis.bm25_topk(docs, ["hash"], k=10).collect()
        }
        assert out[1] < out[0] * 2.2

    def test_validation(self, spark):
        docs = self._docs(spark)
        with pytest.raises(ValueError):
            text_analysis.bm25_topk(docs, [], k=10)
        with pytest.raises(ValueError):
            text_analysis.bm25_topk(docs, ["a", "a"], k=10)
        with pytest.raises(ValueError):
            text_analysis.bm25_topk(docs, ["a"], k=0)


class TestLengthQuantiles:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [("en", 10), ("en", 20), ("en", 30), ("en", 40), ("de", 5)],
            "lang string, n_chars long",
        )
        rows = {
            r.group: r
            for r in text_analysis.length_quantiles(
                df, probs=(0.5,)
            ).collect()
        }
        # (n-1)*q interpolation: median of 10,20,30,40 = 25
        assert rows["en"].p50 == 25.0 and rows["en"].n_docs == 4
        assert rows["de"].p50 == 5.0

    def test_validation(self, spark):
        df = _docs(spark, ["x"])
        with pytest.raises(ValueError):
            text_analysis.length_quantiles(df, len_col="doc_id", probs=())


class TestCapPerGroup:
    def test_cap_and_preference(self, spark):
        from vector_indexer_spark.operators.splits import cap_per_group

        df = spark.createDataFrame(
            [
                (1, "a", 100),
                (2, "a", 300),
                (3, "a", 200),
                (4, "b", 50),
            ],
            "doc_id long, source string, n_chars long",
        )
        out = cap_per_group(df, 2, by_col="source").collect()
        kept = {(r.source, r.doc_id): r.group_rank for r in out}
        # group a keeps its two longest docs, ranked by length desc
        assert kept == {("a", 2): 1, ("a", 3): 2, ("b", 4): 1}
        with pytest.raises(ValueError):
            cap_per_group(df, 0)


class TestOlap:
    def _facts(self, spark):
        orders = spark.createDataFrame(
            [
                (1, 10, "1-URGENT", "1996-01-10"),
                (2, 10, "5-LOW", "1996-02-10"),
                (3, 11, "1-URGENT", "1996-03-10"),
            ],
            "o_orderkey long, o_custkey long, o_orderpriority string, d string",
        ).select("*", F.col("d").cast("timestamp").alias("o_orderdate")).drop("d")
        li = spark.createDataFrame(
            [
                # order 1: one late (40 days), one on-time line
                (1, 100.0, 0.1, "1996-02-19"),
                (1, 50.0, 0.0, "1996-01-15"),
                # order 2: on-time only
                (2, 10.0, 0.0, "1996-02-15"),
                # order 3: two late lines -> still ONE late order
                (3, 20.0, 0.5, "1996-05-01"),
                (3, 30.0, 0.0, "1996-06-01"),
            ],
            "l_orderkey long, l_extendedprice double, l_discount double, d string",
        ).select("*", F.col("d").cast("timestamp").alias("l_shipdate")).drop("d")
        return orders, li

    def test_late_order_counts_semi_semantics(self, spark):
        from vector_indexer_spark.operators.olap import late_order_counts

        orders, li = self._facts(spark)
        out = {
            r.o_orderpriority: r.n_late_orders
            for r in late_order_counts(orders, li, grace_days=30).collect()
        }
        # order 3 has TWO late lines but counts once; order 2 never
        assert out == {"1-URGENT": 2}

    def test_revenue_rollup_subtotals(self, spark):
        from vector_indexer_spark.operators.olap import revenue_rollup

        orders, li = self._facts(spark)
        rows = {
            (r.yr, r.pri): r for r in revenue_rollup(orders, li).collect()
        }
        # leaf: urgent 1996 = 100*0.9 + 50 + 20*0.5 + 30 = 9000+5000+1000+3000 cents
        leaf = rows[(1996, "1-URGENT")]
        assert leaf.revenue_cents == 18000 and leaf.n_items == 4
        assert leaf.yr_total == 0 and leaf.pri_total == 0
        # year subtotal folds both priorities
        sub = rows[(1996, "ALL")]
        assert sub.revenue_cents == 19000 and sub.pri_total == 1
        # grand total
        grand = rows[(-1, "ALL")]
        assert grand.revenue_cents == 19000 and grand.yr_total == 1


class TestSaltedCounts:
    def test_matches_direct_groupby_on_skewed_keys(self, spark):
        from vector_indexer_spark.operators.skew import salted_counts

        # one hot key (90%), several cold ones
        df = spark.range(1000).select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") < 900, "hot")
            .otherwise(F.concat(F.lit("cold"), (F.col("id") % 7)))
            .alias("k"),
        )
        got = {
            r.key: r.n_rows
            for r in salted_counts(
                df, "k", n_salts=8, salt_source_col="row_id"
            ).collect()
        }
        want = {
            r.k: r["count"]
            for r in df.groupBy("k").count().collect()
        }
        assert got == want

    def test_salt_actually_fans_out(self, spark):
        from vector_indexer_spark.operators.skew import salt_expr

        df = spark.range(1000).select(
            salt_expr("id", 8).alias("s")
        )
        n = df.select("s").distinct().count()
        assert n == 8  # every salt bucket hit on 1000 rows

    def test_validation(self, spark):
        from vector_indexer_spark.operators.skew import salted_counts

        df = spark.range(2).select(F.col("id"), F.lit("a").alias("k"))
        with pytest.raises(ValueError):
            salted_counts(df, "k", salt_source_col="k")
        with pytest.raises(ValueError):
            salted_counts(df, "k", n_salts=0, salt_source_col="id")


class TestBm25Batch:
    def test_matches_single_query_ranking(self, spark):
        # the batched inverted-index formulation must rank identically
        # to the scan-local single-query operator (scores differ only
        # by the nano quantization)
        docs = _docs(
            spark,
            [
                "spark spark window",
                "spark window hash table",
                "unrelated words here",
                "hash table hash table",
                "window",
            ],
        )
        single = text_analysis.bm25_topk(docs, ["spark", "window"], k=10)
        qs = spark.createDataFrame(
            [(7, ["spark", "window"])], "query_id long, terms array<string>"
        )
        batch = text_analysis.bm25_topk_batch(docs, qs, k=10)
        s_rank = [(r.rank, r.doc_id) for r in single.collect()]
        b_rank = [
            (r.rank, r.doc_id) for r in batch.collect() if r.query_id == 7
        ]
        assert sorted(b_rank) == sorted(s_rank)

    def test_queries_isolated(self, spark):
        docs = _docs(spark, ["alpha beta", "gamma delta"])
        qs = spark.createDataFrame(
            [(0, ["alpha"]), (1, ["gamma"])],
            "query_id long, terms array<string>",
        )
        out = {
            (r.query_id, r.doc_id)
            for r in text_analysis.bm25_topk_batch(docs, qs, k=5).collect()
        }
        assert out == {(0, 0), (1, 1)}

    def test_validation(self, spark):
        docs = _docs(spark, ["x"])
        qs = spark.createDataFrame(
            [(0, ["x"])], "query_id long, terms array<string>"
        )
        with pytest.raises(ValueError):
            text_analysis.bm25_topk_batch(docs, qs, k=0)


class TestUnigramSurprisal:
    def test_rare_tokens_score_higher(self, spark):
        # corpus: 'common' appears 9x, 'rare' once; the rare-token doc
        # must out-score a same-length common-token doc
        docs = _docs(
            spark,
            ["common common common", "common common common",
             "common common common", "rare"],
        )
        out = {
            r.doc_id: (r.n_tokens, r.surprisal_micros)
            for r in text_analysis.unigram_surprisal(docs).collect()
        }
        # per-token: -ln(9/10) for common, -ln(1/10) for rare
        assert out[3][1] > out[0][1] // 3  # one rare > one common
        assert out[0] == out[1] == out[2]
        # empty-token doc handling
        empty = _docs(spark, ["...", "words here"])
        res = {
            r.doc_id: r.n_tokens
            for r in text_analysis.unigram_surprisal(empty).collect()
        }
        assert res[0] == 0

    def test_total_matches_hand_computation(self, spark):
        import math

        docs = _docs(spark, ["a a b"])
        r = text_analysis.unigram_surprisal(docs).collect()[0]
        want = 2 * math.floor(-math.log(2 / 3) * 1e6) + math.floor(
            -math.log(1 / 3) * 1e6
        )
        assert (r.n_tokens, r.surprisal_micros) == (3, want)


class TestCollocations:
    def test_hand_computed_pmi_ordering(self, spark):
        import math

        docs = _docs(
            spark,
            ["new york " * 6 + "the end", "the start the end the fin",
             "new york again the"],
        )
        out = text_analysis.collocations(docs, k=5, min_count=2).collect()
        got = {(r.tok_a, r.tok_b): (r.rank, r.n_pairs, r.pmi_micros) for r in out}
        # corpus: 24 unigrams; kept pairs (>=2): (new,york)=7,
        # (york,new)=5, (the,end)=2; n_bigrams=14
        def pmi(np_, na, nb):
            return math.floor(
                math.log((np_ / 14) / ((na / 24) * (nb / 24))) * 1e6
            )

        assert got[("new", "york")][1:] == (7, pmi(7, 7, 7))
        assert got[("the", "end")][1:] == (2, pmi(2, 5, 2))
        assert got[("york", "new")][1:] == (5, pmi(5, 7, 7))
        # PMI favors exclusivity: (the,end) > (new,york) > (york,new)
        assert [p for p, _ in sorted(got.items(), key=lambda kv: kv[1][0])] == [
            ("the", "end"), ("new", "york"), ("york", "new"),
        ]

    def test_validation(self, spark):
        docs = _docs(spark, ["a b"])
        with pytest.raises(ValueError):
            text_analysis.collocations(docs, k=0)
        with pytest.raises(ValueError):
            text_analysis.collocations(docs, min_count=0)


class TestKeywordSnippets:
    def test_window_and_case(self, spark):
        docs = _docs(
            spark,
            ["AAAA Spark BBBB", "no match here", "spark at start"],
        )
        out = {
            r.doc_id: (r.match_pos, r.snippet)
            for r in text_analysis.keyword_snippets(
                docs, "SPARK", width=3
            ).collect()
        }
        assert set(out) == {0, 2}
        # snippet keeps ORIGINAL casing; position found case-insensitively
        assert out[0] == (6, "AA Spark BB")   # ±3 chars around pos 6
        assert out[2] == (1, "spark at st")   # clamped at string start
        with pytest.raises(ValueError):
            text_analysis.keyword_snippets(docs, "")


class TestTopNgramConcentration:
    def test_hand_computed(self, spark):
        from vector_indexer_spark.operators import text_analysis

        docs = spark.createDataFrame(
            [
                # "buy now" x3 among 6 bigrams; token chars = 3+3+3+3+3+3+4 = no:
                # tokens: buy now buy now buy now cheap -> 3*6 + 5 = 23 chars
                (0, "buy now buy now buy now cheap"),
                (1, "all distinct words here"),
                (2, "one"),          # < 2 tokens: no bigram
                (3, ""),             # empty
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in text_analysis.top_ngram_concentration(docs, n=2).collect()
        }
        assert out[0].top_ngram == "buy now" and out[0].top_count == 3
        # char_frac = 3 * len("buynow") / 23
        assert out[0].char_frac == pytest.approx(3 * 6 / 23)
        # all-distinct doc: every bigram count 1, tie -> smallest gram
        assert out[1].top_count == 1
        assert out[1].top_ngram == "all distinct"
        assert out[2].top_count == 0 and out[2].char_frac == 0.0
        assert out[3].top_ngram == "" and out[3].char_frac == 0.0
        with pytest.raises(ValueError):
            text_analysis.top_ngram_concentration(docs, n=0)


def test_weighted_sample_invariance_and_clamp(spark, documents):
    from vector_indexer_spark.operators.splits import weighted_sample

    w = F.least(F.lit(1.0), F.col("n_chars").cast("double") / F.lit(300.0))
    a = {r.doc_id for r in weighted_sample(documents, w).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in weighted_sample(documents.repartition(13), w)
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < documents.count()
    # weight 0 keeps nothing, weight 1 (and clamped >1) keeps all
    assert weighted_sample(documents, F.lit(0.0)).count() == 0
    n = documents.count()
    assert weighted_sample(documents, F.lit(1.0)).count() == n
    assert weighted_sample(documents, F.lit(7.5)).count() == n
    assert weighted_sample(documents, F.lit(-3.0)).count() == 0


# --------------------------------------------------------------------------
# DSIR importance scoring (values pinned by the text_dsir_* oracles;
# here: directional behavior on a constructed corpus + contracts)
# --------------------------------------------------------------------------


def test_dsir_prefers_target_like_docs(spark):
    from vector_indexer_spark.operators.text_analysis import (
        dsir_scores,
        dsir_select,
    )

    rows = [
        (0, "physics quantum energy field theory", "web"),
        (1, "quantum field physics energy states", "web"),
        (2, "buy cheap pills discount offer now", "web"),
        (3, "cheap discount offer pills deal buy", "web"),
        (10, "quantum physics energy theory", "curated"),
        (11, "field theory quantum states", "curated"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    raw = docs.filter(F.col("source") == "web")
    target = docs.filter(F.col("source") == "curated")
    s = {
        r["doc_id"]: r["dsir_micros"] / max(r["n_tokens"], 1)
        for r in dsir_scores(raw, target).collect()
    }
    # physics-like docs must outscore spam under a physics target LM
    assert min(s[0], s[1]) > max(s[2], s[3])
    top = dsir_select(raw, target, k=2).collect()
    assert {r["doc_id"] for r in top} == {0, 1}


def test_dsir_empty_doc_scores_zero(spark):
    from vector_indexer_spark.operators.text_analysis import dsir_scores

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dsir_scores(docs, docs).collect()}
    assert got[1]["n_tokens"] == 0 and got[1]["dsir_micros"] == 0


def test_dsir_contracts(spark):
    from vector_indexer_spark.operators.text_analysis import (
        dsir_scores,
        dsir_select,
    )

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="smoothing"):
        dsir_scores(docs, docs, smoothing=0.0)
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_select(docs, docs, k=0)


def test_dsir_plan_no_cartesian_broadcast_stats(spark):
    from vector_indexer_spark.operators.text_analysis import dsir_scores
    from vector_indexer_spark.plans import audit

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = audit.plan_summary(
        dsir_scores(docs, docs.filter(F.col("source") == "src0"))
    )
    # the 1-row stats frame broadcasts; vocabulary joins hash on the
    # token key; no true cartesian anywhere
    assert s["broadcasts"] >= 1
    assert not s["cartesian"]


def test_source_drift_flags_off_distribution_feed(spark):
    from vector_indexer_spark.operators.text_analysis import (
        source_drift_kl,
    )

    rows = (
        [(i, "the quick brown fox jumps over dogs", "clean")
         for i in range(20)]
        + [(100 + i, "the quick brown fox jumps again", "steady")
           for i in range(20)]
        + [(200 + i, "zzz spam casino jackpot winner click", "drifted")
           for i in range(5)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    kl = {
        r["group"]: r["kl_nanos"]
        for r in source_drift_kl(docs).collect()
    }
    # the off-distribution feed must dominate both in-distribution ones
    assert kl["drifted"] > 3 * max(kl["clean"], kl["steady"])
    import pytest as _p

    with _p.raises(ValueError, match="smoothing"):
        source_drift_kl(docs, smoothing=0)


def test_bigram_surprisal_flags_incoherent_text(spark):
    from vector_indexer_spark.operators.text_analysis import (
        bigram_surprisal,
    )

    coherent = "the cat sat on the mat"
    rows = (
        [(i, coherent) for i in range(10)]
        # same unigrams, scrambled order — unigram filter is blind to
        # this; the bigram model must not be
        + [(100, "mat the on sat cat the")]
        + [(101, "x")]  # single token — no bigrams, scores 0
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_micros"])
        for r in bigram_surprisal(docs).collect()
    }
    per_bigram_coherent = got[0][1] / got[0][0]
    per_bigram_scrambled = got[100][1] / got[100][0]
    assert per_bigram_scrambled > 1.5 * per_bigram_coherent
    assert got[101] == (0, 0)


def test_cluster_keywords_hand_computed(spark):
    from vector_indexer_spark.operators.text_analysis import cluster_keywords

    # cluster a: 'spark' dominant and rare elsewhere; 'the' everywhere
    rows = [
        (0, "a", "spark spark spark the"),
        (1, "a", "spark shuffle the"),
        (2, "b", "duck duck duck the"),
        (3, "b", "duck oracle the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lab string, text string")
    out = cluster_keywords(
        df, cluster_col="lab", top_k=2, min_count=2
    ).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append((r.rank, r.token))
    # distinctive term ranks first in each cluster; 'the' (flat across
    # corpus, PMI ~ ln(p(the|a)/p(the)) ≈ 0) ranks below
    assert by_cluster["a"][0] == (1, "spark")
    assert by_cluster["b"][0] == (1, "duck")
    import math
    r_spark = next(r for r in out if r.cluster == "a" and r.token == "spark")
    # p(spark|a) = 4/7, p(spark) = 4/14 -> ratio exactly 2
    assert r_spark.n_in_cluster == 4
    assert r_spark.pmi_micros == math.floor(
        math.log((4 / 7) / (4 / 14)) * 1e6
    )


def test_cluster_keywords_plan_has_window_group_limit(spark, documents):
    from vector_indexer_spark.operators.text_analysis import cluster_keywords
    from vector_indexer_spark.plans import audit

    plan = audit.executed_plan(
        cluster_keywords(documents, cluster_col="lang", top_k=5, min_count=3)
    )
    assert "WindowGroupLimit" in plan


def test_dedup_lines_keeps_first_preserves_order(spark):
    from vector_indexer_spark.operators.text_analysis import dedup_lines

    df = spark.createDataFrame(
        [
            (0, "nav\nbody one\nnav\nbody two\nnav\nfooter"),
            (1, "only line"),
            (2, ""),  # empty text -> one empty line
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_lines(df).collect()}
    assert out[0].text == "nav\nbody one\nbody two\nfooter"
    assert (out[0].n_lines, out[0].n_kept) == (6, 4)
    assert out[1].text == "only line" and out[1].n_kept == 1
    assert out[2].n_lines == 1 and out[2].n_kept == 1


def test_dedup_lines_custom_separator_and_plan(spark):
    from vector_indexer_spark.operators.text_analysis import dedup_lines
    from vector_indexer_spark.plans import audit

    df = spark.createDataFrame(
        [(0, "a|b|a|c|b")], "doc_id long, text string"
    )
    row = dedup_lines(df, sep="|").collect()[0]
    assert row.text == "a|b|c"
    # scan-local: no exchange anywhere in the plan
    plan = audit.executed_plan(dedup_lines(df, sep="|"))
    assert "Exchange" not in plan


def test_select_token_budget_matches_global_greedy(spark):
    from vector_indexer_spark.operators.splits import select_token_budget

    rows = [
        (i, (i * 13) % 50 + 1, ((i * 37) % 101) / 101.0) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, quality double")
    budget = 1_500
    # brute-force reference: global (quality desc, id) prefix
    expected, cum = set(), 0
    for did, ntok, q in sorted(rows, key=lambda r: (-r[2], r[0])):
        if cum + ntok > budget:
            break
        cum += ntok
        expected.add(did)
    got = {
        r.doc_id for r in select_token_budget(df, budget).collect()
    }
    assert got == expected
    total = sum(ntok for did, ntok, _ in rows if did in got)
    assert total <= budget


def test_select_token_budget_edges(spark):
    from vector_indexer_spark.operators.splits import select_token_budget

    df = spark.createDataFrame(
        [(0, 10, 0.9), (1, 10, 0.5)], "doc_id long, n_tokens long, quality double"
    )
    assert select_token_budget(df, 0).count() == 0
    assert select_token_budget(df, 10**9).count() == 2
    # budget exactly covers the better doc; the next would cross
    got = [r.doc_id for r in select_token_budget(df, 10).collect()]
    assert got == [0]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        select_token_budget(df, -1)


def test_select_token_budget_no_unpartitioned_corpus_window(spark):
    """The whole point of the bin formulation: no window over the
    entire corpus in one partition. Every Window in the plan must be
    partitioned (the only unpartitioned one is over the bins-sized
    ledger, which Spark shows as a separate tiny aggregation input)."""
    from vector_indexer_spark.operators.splits import select_token_budget
    from vector_indexer_spark.plans import audit

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 50 + 1).alias("n_tokens"),
        ((F.col("id") * 37 % 101) / 101.0).alias("quality"),
    )
    plan = audit.executed_plan(select_token_budget(df, 5_000))
    import re as _re
    # corpus-side windows are all partitioned by __bin
    wins = _re.findall(r"Window .*", plan)
    assert wins, "expected Window operators in plan"
    unpart = [w for w in wins if "partitionBy" not in w.replace(" ", "")
              and "__bin" not in w]
    # the only allowed unpartitioned window is the bins-ledger cumsum,
    # whose input is the __bin aggregate (ledger), never raw rows
    for w in unpart:
        assert "__bin_tokens" in w


def test_bottom_k_sample_merge_algebra_and_stability(spark):
    from vector_indexer_spark.operators.splits import bottom_k_sample

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    whole = sorted(r.doc_id for r in bottom_k_sample(df, 30).collect())
    # bottom-k of parts' bottom-ks == bottom-k of the whole
    a = bottom_k_sample(df.filter("doc_id < 1000"), 30)
    b = bottom_k_sample(df.filter("doc_id >= 1000"), 30)
    merged = sorted(
        r.doc_id for r in bottom_k_sample(a.unionByName(b), 30).collect()
    )
    assert merged == whole
    # stability under growth: the 3000-row sample overlaps the
    # 2000-row one except where smaller draws displaced members
    grown = spark.range(3000).withColumnRenamed("id", "doc_id")
    g = set(r.doc_id for r in bottom_k_sample(grown, 30).collect())
    kept = [d for d in whole if d in g]
    assert len(kept) >= 15  # statistically ~20 expected; never a reshuffle
    # exact count semantics
    assert bottom_k_sample(df, 0).count() == 0
    assert bottom_k_sample(df.limit(5), 30).count() == 5


def test_select_token_budget_by_group(spark):
    import pytest as _pytest

    from vector_indexer_spark.operators.splits import (
        select_token_budget,
        select_token_budget_by_group,
    )

    rows = [
        (i, "web" if i % 2 == 0 else "code", (i * 13) % 40 + 1,
         ((i * 37) % 101) / 101.0)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long, quality double"
    )
    out = select_token_budget_by_group(
        df, {"web": 800, "code": 300}
    )
    got = {(r.doc_id, r.source) for r in out.collect()}
    # per-group keeps equal an independent per-group run
    for src, budget in (("web", 800), ("code", 300)):
        solo = {
            (r.doc_id, src)
            for r in select_token_budget(
                df.filter(F.col("source") == src), budget
            ).collect()
        }
        assert {g for g in got if g[1] == src} == solo
    # budget respected per group
    toks = {r[0]: r[2] for r in rows}
    assert sum(toks[d] for d, s in got if s == "code") <= 300
    with _pytest.raises(ValueError):
        select_token_budget_by_group(df, {})


def test_weighted_bottom_k_contract(spark):
    from vector_indexer_spark.operators.splits import weighted_bottom_k

    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    s = weighted_bottom_k(df, 30, "w", id_col="doc_id")
    got = s.collect()
    # exact k, no duplicates, key column present
    assert len(got) == 30
    assert len({r.doc_id for r in got}) == 30
    assert all(r.sample_key_nanos is not None for r in got)
    # deterministic + repartition-invariant
    again = {
        r.doc_id
        for r in weighted_bottom_k(
            df.repartition(13), 30, "w", id_col="doc_id"
        ).collect()
    }
    assert again == {r.doc_id for r in got}
    # k >= n returns every positive-weight row
    assert weighted_bottom_k(df, 500, "w", id_col="doc_id").count() == 200
    # zero/negative/null weights carry no mass
    rows2 = rows + [(900, 0.0), (901, -2.0), (902, None)]
    df2 = spark.createDataFrame(rows2, "doc_id long, w double")
    all_ids = {
        r.doc_id
        for r in weighted_bottom_k(df2, 500, "w", id_col="doc_id").collect()
    }
    assert not all_ids & {900, 901, 902}
    with pytest.raises(ValueError):
        weighted_bottom_k(df, -1, "w")
    assert weighted_bottom_k(df, 0, "w").count() == 0


def test_weighted_bottom_k_merge_algebra(spark):
    """Top-k of a union == top-k of the parts' top-ks (A-ES bottom-k
    algebra — per-partition samples merge without a rescan)."""
    from vector_indexer_spark.operators.splits import weighted_bottom_k

    rows = [(i, float(1 + (i * 13) % 11)) for i in range(300)]
    a = spark.createDataFrame(rows[:150], "doc_id long, w double")
    b = spark.createDataFrame(rows[150:], "doc_id long, w double")
    union = a.unionByName(b)
    whole = {
        r.doc_id for r in weighted_bottom_k(union, 25, "w").collect()
    }
    pa = weighted_bottom_k(a, 25, "w")
    pb = weighted_bottom_k(b, 25, "w")
    merged = {
        r.doc_id
        for r in weighted_bottom_k(pa.unionByName(pb), 25, "w").collect()
    }
    assert merged == whole


def test_weighted_bottom_k_proportional_bias(spark):
    """Heavier rows are sampled more often: give half the corpus 10x
    the weight and the sample must be dominated by the heavy half
    (the E-S inclusion-probability direction, not a statistical
    tolerance test — the draw is deterministic)."""
    from vector_indexer_spark.operators.splits import weighted_bottom_k

    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_bottom_k(df, 100, "w").collect()
    heavy = sum(1 for r in got if r.doc_id % 2 == 0)
    assert heavy > 65  # expectation ~91 of 100; far from unweighted 50


def test_prototypicality_band_is_exact_rank_band(spark, embeddings):
    from vector_indexer_spark.operators.similarity import (
        prune_by_prototypicality,
    )

    cents = (
        embeddings.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    )
    c = [[float(x) for x in r.embedding] for r in cents]
    kept = prune_by_prototypicality(
        embeddings, c, keep_lo=0.25, keep_hi=0.75
    ).collect()
    assert kept, "band must be non-empty"
    # integer band test: lo_ppm*cnt <= (rn-1)*1e6 < hi_ppm*cnt
    for r in kept:
        pos = (r.cluster_rank - 1) * 1_000_000
        assert 250_000 * r.cluster_count <= pos < 750_000 * r.cluster_count
    # full band == whole corpus (every row keeps its assignment)
    full = prune_by_prototypicality(embeddings, c, keep_lo=0.0, keep_hi=1.0)
    assert full.count() == embeddings.count()
    # drop-easy and drop-hard partition the full set with the band
    lo = prune_by_prototypicality(embeddings, c, keep_lo=0.0, keep_hi=0.25)
    hi = prune_by_prototypicality(embeddings, c, keep_lo=0.75, keep_hi=1.0)
    mid = prune_by_prototypicality(embeddings, c, keep_lo=0.25, keep_hi=0.75)
    assert lo.count() + mid.count() + hi.count() == embeddings.count()
    with pytest.raises(ValueError):
        prune_by_prototypicality(embeddings, c, keep_lo=0.5, keep_hi=0.5)
    with pytest.raises(ValueError):
        prune_by_prototypicality(embeddings, c, keep_lo=-0.1, keep_hi=1.0)


def test_prototypicality_drops_planted_outlier_and_core(spark):
    """A planted far outlier falls outside keep_hi; the centroid's own
    twin (dist2 = 0, rank 1) falls below keep_lo."""
    import numpy as np

    from vector_indexer_spark.operators.similarity import (
        prune_by_prototypicality,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(60, 8)).astype(np.float64)
    cent = base[0]
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(60)]
    rows.append((999, [float(x + 500.0) for x in cent]))  # far outlier
    rows.append((998, [float(x) for x in cent]))  # exact centroid twin
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {
        r.id
        for r in prune_by_prototypicality(
            df, [list(cent)], keep_lo=0.1, keep_hi=0.9
        ).collect()
    }
    assert 999 not in kept
    assert 998 not in kept  # rank-1 prototypical core dropped
    assert len(kept) > 40
