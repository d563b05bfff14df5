"""LLM-pipeline operators: dedup, minhash/LSH, simhash, jaccard,
embedding near-dup, text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators import dedup, multimodal, text_analysis


@pytest.fixture(scope="module")
def docs(spark, documents):
    return documents


@pytest.fixture(scope="module")
def doubled(spark, documents):
    """Every text twice: once at doc_id, once at doc_id+10000."""
    again = documents.withColumn("doc_id", F.col("doc_id") + 10_000)
    return documents.unionByName(again)


def test_exact_dup_groups(spark, doubled):
    groups = dedup.exact_dup_groups(doubled).toPandas()
    assert len(groups) == 500
    assert (groups.n_copies == 2).all()
    assert (groups.keep_id < 10_000).all()


def test_dedup_exact_keeps_min(spark, doubled):
    out = dedup.dedup_exact(doubled)
    assert out.count() == 500
    assert out.filter(F.col("doc_id") >= 10_000).count() == 0


def test_minhash_deterministic_and_identical_docs_collide(spark, doubled):
    sig = dedup.minhash_signatures(doubled).toPandas()
    sig_map = {r.doc_id: tuple(r.signature) for _, r in sig.iterrows()}
    for i in range(20):
        assert sig_map[i] == sig_map[i + 10_000]
    # distinct docs rarely share a full signature
    uniq = len({sig_map[i] for i in range(100)})
    assert uniq > 90


def test_minhash_inner_equals_reattached_filtered(spark, doubled):
    """The LSH paths skip the sentinel-reattach join (r10 optimization:
    one docs scan + one join dropped from the banding plan). That is
    only sound if the inner aggregate equals the reattached frame
    filtered on the sentinel — proven here row-for-row, including on a
    frame that CONTAINS shingle-less docs."""
    from vector_indexer_spark.functions.text import HASH_MOD

    mixed = doubled.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(90_000 + i, f"hi {i % 7}") for i in range(20)],
            "doc_id long, text string",
        )
    )
    full = dedup.minhash_sig_columns(mixed)
    inner = dedup.minhash_sig_columns(mixed, include_shingleless=False)
    filt = full.filter(F.col("s0") != F.lit(HASH_MOD))
    a = sorted(map(tuple, filt.collect()))
    b = sorted(map(tuple, inner.collect()))
    assert a == b
    # and the inner plan drops the reattach: fewer input scans and no
    # join (the reattached plan scans the input twice and left-joins)
    from vector_indexer_spark.plans import audit

    inner_plan = audit.executed_plan(inner)
    full_plan = audit.executed_plan(full)
    assert "Join" not in inner_plan
    assert full_plan.count("Join") >= 1


def test_lsh_finds_identical_pairs(spark, doubled):
    small = doubled.filter((F.col("doc_id") % 10_000) < 50)
    pairs = dedup.lsh_candidate_pairs(small).toPandas()
    found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    for i in range(50):
        assert (i, i + 10_000) in found  # identical docs must collide
    assert (pairs.id_a < pairs.id_b).all()


def test_lsh_shingleless_docs_never_band(spark):
    """1k sub-k-token docs share the sentinel signature; banding them
    would be quadratic (≈500k pairs here, 10¹⁶ on a web corpus of
    short docs). They cannot be shingle-Jaccard near-dups, so the
    operator must emit ZERO candidate pairs for them."""
    short = spark.createDataFrame(
        [(i, f"hi {i % 7}") for i in range(1_000)], "doc_id long, text string"
    )
    assert dedup.lsh_candidate_pairs(short, shingle_k=3).count() == 0


def test_lsh_bucket_cap_drops_boilerplate_bucket(spark):
    """With a small cap, a mass-duplicated boilerplate bucket is
    dropped while normal-sized buckets still pair."""
    rows = [(i, "the same boilerplate footer text repeated verbatim")
            for i in range(50)]
    rows += [(1_000, "a genuinely unique document about spark shuffles"),
             (1_001, "a genuinely unique document about spark shuffles")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.lsh_candidate_pairs(df, max_bucket_size=10).toPandas()
    found = {(a, b) for a, b in zip(capped.id_a, capped.id_b)}
    assert (1_000, 1_001) in found
    assert not any(a < 50 and b < 50 for a, b in found)
    uncapped = dedup.lsh_candidate_pairs(df, max_bucket_size=None)
    assert uncapped.count() == 50 * 49 // 2 + 1


def test_jaccard_identical_is_one(spark, doubled):
    pairs = spark.createDataFrame(
        [(i, i + 10_000) for i in range(10)], "id_a long, id_b long"
    )
    out = dedup.jaccard_pairs(doubled, pairs).toPandas()
    assert len(out) == 10
    assert (out.jaccard == 1.0).all()


def test_near_dup_minhash_end_to_end(spark, doubled):
    small = doubled.filter((F.col("doc_id") % 10_000) < 40)
    out = dedup.near_dup_minhash(small, threshold=0.99).toPandas()
    found = {(a, b) for a, b in zip(out.id_a, out.id_b)}
    assert {(i, i + 10_000) for i in range(40)} <= found


def test_simhash_identical_equal(spark, doubled):
    small = doubled.filter((F.col("doc_id") % 10_000) < 30)
    sh = dedup.simhash(small).toPandas()
    m = {r.doc_id: r.simhash for _, r in sh.iterrows()}
    for i in range(30):
        assert m[i] == m[i + 10_000]
        assert 0 <= m[i] < 2**32


def test_embedding_near_dups_blocked(spark, embeddings):
    out = dedup.embedding_near_dups(embeddings, threshold=0.95).toPandas()
    assert (out.id_a < out.id_b).all()
    assert ((out.cosine >= 0.95) & (out.cosine <= 1.0 + 1e-12)).all()
    # blocking respected: pairs share a label
    lab = {r.vec_id: r.label for r in embeddings.collect()}
    for _, r in out.iterrows():
        assert lab[r.id_a] == lab[r.id_b]


def test_text_stats_values(spark):
    df = spark.createDataFrame(
        [(0, "The cat and the dog. 42 !!")], "doc_id long, text string"
    )
    row = text_analysis.text_stats(df).collect()[0]
    assert row.n_chars == 26
    assert row.n_tokens == 6  # the cat and the dog 42 (!! drops, '42' stays)
    assert row.n_stopwords == 3  # the, and, the
    assert abs(row.digit_ratio - 2 / 26) < 1e-12
    assert 0 <= row.quality <= 1


def test_lang_id(spark):
    rows = [
        (0, "the cat is in the house and that is fine"),
        (1, "der hund ist nicht mit der katze und das ist gut"),
        (2, "le chat est dans la maison et les oiseaux pour que"),
        (3, "el perro es una mascota para los ninos con del gato"),
        (4, "xyzzy plugh 12345"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.lang_pred for r in text_analysis.language_id(df).collect()}
    assert out == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und"}


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in text_analysis.fingerprints(df).collect()}
    assert fp[0] == fp[2] != fp[1]


def test_quality_filter_passes_through_columns(spark, docs):
    out = text_analysis.quality_filter(docs, min_quality=0.0, min_tokens=1)
    assert set(out.columns) == set(docs.columns)
    assert 0 < out.count() <= docs.count()


def test_multimodal_extract_deterministic(spark, docs):
    media = multimodal.text_as_media(docs.limit(50))
    a = multimodal.extract_features(media).toPandas().sort_values("media_id")
    b = multimodal.extract_features(media).toPandas().sort_values("media_id")
    assert len(a) == 50
    assert (a.byte_len > 0).all()
    for fa, fb in zip(a.features, b.features):
        np.testing.assert_array_equal(fa, fb)
    assert all(len(f) == multimodal.FEATURE_DIM for f in a.features)


class TestRealHeaderDecode:
    """decoder='real' — pure-Python header parsing, no media libs."""

    @staticmethod
    def _png(width, height, color_type=2):
        import struct as st

        ihdr = (
            st.pack(">II", width, height) + bytes([8, color_type, 0, 0, 0])
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + st.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
        )

    @staticmethod
    def _jpeg(width, height, channels=3):
        import struct as st

        sof = st.pack(">HBHHB", 8 + 3 * channels, 8, height, width, channels)
        return (
            b"\xff\xd8"                             # SOI
            + b"\xff\xe0" + st.pack(">H", 4) + b"\0\0"  # APP0 filler
            + b"\xff\xc0" + sof + b"\0" * (3 * channels)
            + b"\xff\xd9"
        )

    @staticmethod
    def _wav(data_bytes, byte_rate=16000):
        import struct as st

        fmt = st.pack("<HHIIHH", 1, 1, 8000, byte_rate, 2, 16)
        return (
            b"RIFF" + st.pack("<I", 36 + data_bytes) + b"WAVE"
            + b"fmt " + st.pack("<I", 16) + fmt
            + b"data" + st.pack("<I", data_bytes) + b"\x00" * data_bytes
        )

    def test_image_dims_from_headers(self, spark):
        rows = [
            (0, "image", self._png(320, 200), "t"),
            (1, "image", self._jpeg(64, 48), "t"),
            (2, "image", b"GIF89a" + (17).to_bytes(2, "little")
             + (23).to_bytes(2, "little") + b"\x00" * 6, "t"),
        ]
        media = spark.createDataFrame(
            rows, "media_id long, modality string, content binary, source string"
        )
        out = {
            r.media_id: (r.width, r.height)
            for r in multimodal.extract_features(
                media, decoder="real"
            ).collect()
        }
        assert out == {0: (320, 200), 1: (64, 48), 2: (17, 23)}

    def test_wav_duration_and_histogram_features(self, spark):
        media = spark.createDataFrame(
            [(0, "audio", self._wav(32000, byte_rate=16000), "t")],
            "media_id long, modality string, content binary, source string",
        )
        row = multimodal.extract_features(media, decoder="real").collect()[0]
        assert row.duration_ms == 2000
        f = np.asarray(row.features)
        assert abs(float(f.sum()) - 1.0) < 1e-6  # L1-normalized histogram

    def test_text_payloads_decode_real(self, spark, docs):
        media = multimodal.text_as_media(docs.limit(5))
        out = multimodal.extract_features(media, decoder="real").toPandas()
        assert len(out) == 5 and (out.byte_len > 0).all()

    def test_video_real_decode_via_avi(self, spark):
        # round 4: the video branch is a real AVI demux — metadata
        # comes from avih, and a non-AVI payload fails loudly
        avi = multimodal.encode_avi([b"frame0", b"frame1"], 50000, 7, 3)
        media = spark.createDataFrame(
            [(0, "video", bytearray(avi), "t")],
            "media_id long, modality string, content binary, source string",
        )
        row = multimodal.extract_features(media, decoder="real").collect()[0]
        assert (row.width, row.height, row.duration_ms) == (7, 3, 100)
        junk = spark.createDataFrame(
            [(0, "video", b"\x00" * 64, "t")],
            "media_id long, modality string, content binary, source string",
        )
        with pytest.raises(Exception, match="RIFF/AVI"):
            multimodal.extract_features(junk, decoder="real").collect()

    def test_malformed_image_raises(self, spark):
        media = spark.createDataFrame(
            [(0, "image", b"not an image at all", "t")],
            "media_id long, modality string, content binary, source string",
        )
        with pytest.raises(Exception, match="unsupported image format"):
            multimodal.extract_features(media, decoder="real").collect()


def test_sample_frames(spark, docs):
    media = multimodal.text_as_media(docs.limit(20))
    frames = multimodal.sample_frames(media, every_n_bytes=100, max_frames=3).toPandas()
    assert frames.groupby("media_id").size().max() <= 3
    assert (frames.frame_offset == frames.frame_idx * 100).all()


def test_cosine_ann_matches_brute_top1(spark, embeddings, tmp_path_factory):
    # cosine ANN (L2-on-normalized reduction) agrees with brute cosine
    from vector_indexer_spark.operators.similarity import (
        build_cosine_index,
        cosine_topk,
        search_cosine,
    )

    path = str(tmp_path_factory.mktemp("cos") / "idx")
    idx = build_cosine_index(embeddings, path, nlist=8, seed=42)
    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query")
    )
    brute = cosine_topk(embeddings, q, k=5).toPandas()
    ann = search_cosine(spark, idx, q, k=5, n_probe=idx.nlist).toPandas()
    b1 = brute[brute["rank"] == 1].set_index("query_id")
    a1 = ann[ann["rank"] == 1].set_index("query_id")
    for qid in range(10):
        assert a1.loc[qid, "neighbor_id"] == b1.loc[qid, "neighbor_id"]
        assert abs(a1.loc[qid, "cosine"] - b1.loc[qid, "cosine"]) < 1e-5


def test_resolve_duplicate_groups(spark):
    # chain 1-2-3, pair 10-11, singleton 20 → canonical = min of component
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: r.canonical_id
        for r in dedup.resolve_duplicate_groups(docs, pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_resolve_groups_distributed_matches_driver(spark):
    # max_pairs_driver=0 forces the label-propagation path; it must
    # produce exactly the union-find answer, including the
    # filtered-id canonical anchoring
    docs = spark.createDataFrame(
        [(i,) for i in (2, 3, 10, 11, 20)], "doc_id long"  # doc 1 filtered
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: r.canonical_id
        for r in dedup.resolve_duplicate_groups(
            docs, pairs, max_pairs_driver=0
        ).collect()
    }
    assert out == {2: 2, 3: 2, 10: 10, 11: 10, 20: 20}


def test_resolve_groups_distributed_long_chain(spark):
    # a 200-link chain needs ~log2(200) pointer-jumping rounds — the
    # propagation loop, not just the initial neighbor-min
    n = 200
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = dedup.resolve_duplicate_groups(docs, pairs, max_pairs_driver=0)
    assert out.filter(F.col("canonical_id") != 0).count() == 0
    assert out.count() == n


@pytest.mark.slow
def test_resolve_groups_beyond_driver_bound(spark):
    # > 5M disjoint pairs must resolve without the old ValueError and
    # without collecting the edge list on the driver
    n = 5_000_100
    docs = spark.range(2 * n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )
    out = dedup.resolve_duplicate_groups(docs, pairs)
    bad = out.filter(
        F.col("canonical_id") != F.col("doc_id") - F.col("doc_id") % 2
    ).count()
    assert bad == 0


def test_resolve_groups_canonical_always_present(spark):
    # pairs may reference ids filtered out of df — canonical must be
    # the min surviving member, so filter(doc_id == canonical_id)
    # always keeps one doc per group
    docs = spark.createDataFrame([(2,), (3,)], "doc_id long")  # doc 1 filtered
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {
        r.doc_id: r.canonical_id
        for r in dedup.resolve_duplicate_groups(docs, pairs).collect()
    }
    assert out == {2: 2, 3: 2}


def test_bpe_token_count(spark):
    from vector_indexer_spark.functions.text import bpe_token_count_expr

    df = spark.createDataFrame(
        [(0, "tokenization works"), (1, "a b!"), (2, "12 cats")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", bpe_token_count_expr("text").alias("n")
        ).collect()
    }
    # "tokenization works" -> toke|niza|tion + work|s = 5 chunks
    assert out[0] == 5
    # "a b!" -> a, b, ! = 3
    assert out[1] == 3
    # "12 cats" -> 1, 2, cats = 3
    assert out[2] == 3


# --- random-hyperplane (cosine) LSH ---


def test_rhp_identical_vectors_always_pair(spark, embeddings):
    """Identical vectors share every signature bit, so they collide in
    every band and the verify stage reports cosine == 1."""
    from vector_indexer_spark.operators.similarity import (
        cosine_near_dup_rhp,
        sample_hyperplanes,
    )

    dup = embeddings.limit(30).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    corpus = embeddings.limit(30).select("vec_id", "embedding").union(dup)
    planes = sample_hyperplanes(embeddings, 16)
    got = cosine_near_dup_rhp(corpus, planes, threshold=0.99).collect()
    found = {(r.id_a, r.id_b) for r in got}
    for i in range(30):
        assert (i, i + 10_000) in found


def test_rhp_candidates_subset_and_recall(spark, embeddings):
    """Blocking is sound (candidates ⊆ all pairs trivially) and, on
    clustered data, catches most truly-similar pairs (cos >= 0.9)."""
    from vector_indexer_spark.functions.distance import cosine_expr
    from vector_indexer_spark.operators.similarity import (
        cosine_near_dup_rhp,
        sample_hyperplanes,
    )

    planes = sample_hyperplanes(embeddings, 16)
    got = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_rhp(
            embeddings, planes, threshold=0.9
        ).collect()
    }
    a = embeddings.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va")
    )
    b = embeddings.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb")
    )
    truth = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine_expr("__va", "__vb").alias("c")
        )
        .filter(F.col("c") >= 0.9)
        .collect()
    }
    assert got <= truth  # verify stage guarantees soundness
    if truth:
        assert len(got) / len(truth) >= 0.8  # LSH recall on near-dups


def test_rhp_bucket_cap(spark, embeddings):
    from vector_indexer_spark.operators.similarity import (
        rhp_candidate_pairs,
        sample_hyperplanes,
    )

    planes = sample_hyperplanes(embeddings, 16)
    # duplicate one vector 40x: an uncapped run pairs them quadratically,
    # the cap drops those buckets entirely
    hot = embeddings.limit(1).select("embedding")
    blown = embeddings.select("vec_id", "embedding").union(
        hot.crossJoin(spark.range(40).select(
            (F.col("id") + 50_000).alias("vec_id")
        )).select("vec_id", "embedding")
    )
    capped = rhp_candidate_pairs(
        blown, planes, max_bucket_size=10
    ).filter(F.col("id_a") >= 50_000)
    assert capped.count() == 0


def test_rhp_validation(spark, embeddings):
    from vector_indexer_spark.operators.similarity import (
        rhp_candidate_pairs,
        sample_hyperplanes,
    )

    with pytest.raises(ValueError, match="hyperplanes"):
        sample_hyperplanes(embeddings.limit(3), 16)
    planes = sample_hyperplanes(embeddings, 15)
    with pytest.raises(ValueError, match="divisible"):
        rhp_candidate_pairs(embeddings, planes, bands=4)


# --- decontamination ---


def test_decontaminate_exact_normalized(spark):
    from vector_indexer_spark.operators.dedup import decontaminate_exact

    corpus = spark.createDataFrame(
        [
            (0, "The Quick   Brown Fox", "a"),
            (1, "an innocent document", "b"),
        ],
        "doc_id long, text string, source string",
    )
    block = spark.createDataFrame(
        [("the quick brown fox",)], "text string"
    )
    kept = sorted(
        r.doc_id for r in decontaminate_exact(corpus, block).collect()
    )
    assert kept == [1]  # case/whitespace variant still caught
    kept_raw = sorted(
        r.doc_id
        for r in decontaminate_exact(corpus, block, normalize=False).collect()
    )
    assert kept_raw == [0, 1]  # byte-exact tier misses the variant


def test_decontaminate_ngram_collision_rule(spark):
    from vector_indexer_spark.operators.dedup import decontaminate_ngram

    eval_text = "one two three four five six seven eight nine ten"
    corpus = spark.createDataFrame(
        [
            # embeds an 8-gram of the eval text mid-document
            (0, "prefix words then one two three four five six seven "
                "eight and more", "a"),
            # shares only a 7-token run -> survives the 8-gram rule
            (1, "two three four five six seven eight unrelated tail", "b"),
            (2, "completely disjoint content with many words in it", "c"),
            # shorter than 8 tokens: no 8-grams, survives this tier
            (3, "one two three", "d"),
        ],
        "doc_id long, text string, source string",
    )
    block = spark.createDataFrame([(eval_text,)], "text string")
    kept = sorted(
        r.doc_id
        for r in decontaminate_ngram(corpus, block, n=8).collect()
    )
    assert kept == [1, 2, 3]
    with pytest.raises(ValueError, match="n must be"):
        decontaminate_ngram(corpus, block, n=0)


class TestEmbeddingOutliers:
    def test_top_n_and_threshold_modes(self, spark):
        import numpy as np

        from vector_indexer_spark.operators.similarity import (
            embedding_outliers,
        )

        rng = np.random.default_rng(0)
        X = rng.normal(size=(100, 8)).astype(np.float32) * 0.1
        X[7] += 50.0  # gross outlier
        X[13] += 30.0
        df = spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in range(100)],
            "vec_id long, embedding array<float>",
        )
        cents = [[0.0] * 8]
        top = embedding_outliers(df, cents, top_n=2).collect()
        assert [r.id for r in sorted(top, key=lambda r: r.outlier_rank)] == [7, 13]
        thr = embedding_outliers(df, cents, threshold=100.0)
        assert {r.id for r in thr.collect()} == {7, 13}

    def test_validation(self, spark):
        from vector_indexer_spark.operators.similarity import (
            embedding_outliers,
        )

        df = spark.createDataFrame(
            [(0, [0.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError):
            embedding_outliers(df, [[0.0]])
        with pytest.raises(ValueError):
            embedding_outliers(df, [[0.0]], top_n=1, threshold=1.0)
        with pytest.raises(ValueError):
            embedding_outliers(df, [[0.0]], top_n=0)


class TestSemDeDup:
    def test_keeps_lowest_id_exemplar(self, spark):
        from vector_indexer_spark.operators.similarity import semdedup

        # two clusters around (1,0) and (0,1); ids 0,1,2 are near-dups
        # of each other in cluster 0; id 3 is alone in cluster 1;
        # id 4 sits in cluster 0 but far from the dups (orthogonal-ish)
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (1, [0.999, 0.01]),
                (2, [0.998, -0.01]),
                (3, [0.0, 1.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        out = {
            r.vec_id: r
            for r in semdedup(
                emb, [[1.0, 0.0], [0.0, 1.0]], threshold=0.95
            ).collect()
        }
        assert out[0].kept and not out[1].kept and not out[2].kept
        assert out[3].kept and out[3].cluster_id == 1
        assert out[0].cluster_id == 0

    def test_cross_cluster_dups_not_dropped(self, spark):
        from vector_indexer_spark.operators.similarity import semdedup

        # identical vectors forced into different clusters would never
        # pair (SemDeDup's documented trade-off) — emulate by centroids
        # that split them via tie-break: identical points go to the
        # same cluster, so instead verify the blocking: near-identical
        # points in different clusters survive
        emb = spark.createDataFrame(
            [(0, [1.0, 0.05]), (1, [1.0, -0.05])],
            "vec_id long, embedding array<float>",
        )
        out = {
            r.vec_id: r.kept
            for r in semdedup(
                emb, [[1.0, 0.1], [1.0, -0.1]], threshold=0.5
            ).collect()
        }
        assert out == {0: True, 1: True}

    def test_validation(self, spark):
        from vector_indexer_spark.operators.similarity import semdedup

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError):
            semdedup(emb, [[1.0, 0.0]], threshold=2.0)

    def test_giant_cluster_capped_to_bounded_pairs(self, spark):
        """One skewed cluster must not go quadratic: with
        max_cluster_size=10, a 200-member near-identical cluster is
        salted into ~20 sub-blocks, so the pair join stays bounded
        (~20 x C(10,2)) instead of C(200,2), while dedup inside each
        sub-block still fires — mirrors LSH's max_bucket_size test."""
        from vector_indexer_spark.operators.dedup import embedding_near_dups
        from vector_indexer_spark.operators.similarity import semdedup

        n = 200
        emb = spark.createDataFrame(
            [(i, [1.0, i * 1e-6]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        uncapped = embedding_near_dups(
            emb, block_col=None, threshold=0.99, max_block_size=None
        )
        assert uncapped.count() == n * (n - 1) // 2

        capped = embedding_near_dups(
            emb, block_col=None, threshold=0.99, max_block_size=10
        ).toPandas()
        # every pair still a true near-dup, but candidate volume is
        # bounded by sub-block size: strictly fewer than quadratic,
        # and no sub-block contributes more than C(cap_actual, 2)
        # where the salt spreads ~10 per sub-block
        assert 0 < len(capped) < n * (n - 1) // 2
        assert len(capped) <= 20 * (15 * 14 // 2)  # slack for hash skew

        out = semdedup(
            emb, [[1.0, 0.0]], threshold=0.99, max_cluster_size=10
        ).toPandas()
        assert len(out) == n
        # at least one exemplar survives per sub-block; most rows drop
        kept = int(out.kept.sum())
        assert 1 <= kept <= 40  # ~20 sub-blocks, exemplar(s) each


class TestRrfFuse:
    def test_hand_computed_fusion(self, spark):
        from vector_indexer_spark.operators.similarity import rrf_fuse

        a = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
        )
        b = spark.createDataFrame(
            [(12, 1), (13, 2)], "doc_id long, rank int"
        )
        out = {r.id: (r.score, r.rank) for r in rrf_fuse(a, b, k=10).collect()}
        # doc 12 appears in both lists -> highest fused score
        s12 = 1.0 / 63 + 1.0 / 61
        assert abs(out[12][0] - s12) < 1e-12 and out[12][1] == 1
        # single-list docs score by their one term
        assert abs(out[10][0] - 1.0 / 61) < 1e-12
        assert abs(out[13][0] - 1.0 / 62) < 1e-12
        assert set(out) == {10, 11, 12, 13}
        # 10 (rank 1, list a) beats 13 (rank 2, list b)
        assert out[10][1] < out[13][1]

    def test_validation(self, spark):
        from vector_indexer_spark.operators.similarity import rrf_fuse

        df = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
        with pytest.raises(ValueError):
            rrf_fuse(df, df, k=0)
        with pytest.raises(ValueError):
            rrf_fuse(df, df, k0=0.0)


class TestMaxSim:
    def test_best_chunk_wins(self, spark):
        from vector_indexer_spark.operators.similarity import maxsim_topk

        # doc 1: one orthogonal + one aligned chunk -> max picks aligned;
        # doc 2: only orthogonal chunks -> scores 0
        cemb = spark.createDataFrame(
            [
                (1, [0.0, 1.0]),
                (1, [1.0, 0.0]),
                (2, [0.0, 1.0]),
                (2, [0.0, -1.0]),
            ],
            "doc_id long, embedding array<double>",
        )
        q = spark.createDataFrame(
            [(0, [1.0, 0.0])], "query_id long, query array<double>"
        )
        out = {
            r.doc_id: (r.rank, r.score)
            for r in maxsim_topk(cemb, q, k=10, metric="dot").collect()
        }
        assert out[1] == (1, 1.0)
        assert out[2][0] == 2 and out[2][1] == 0.0

    def test_validation(self, spark):
        from vector_indexer_spark.operators.similarity import maxsim_topk

        df = spark.createDataFrame(
            [(1, [1.0])], "doc_id long, embedding array<double>"
        )
        q = spark.createDataFrame(
            [(0, [1.0])], "query_id long, query array<double>"
        )
        with pytest.raises(ValueError):
            maxsim_topk(df, q, k=0)
        with pytest.raises(ValueError):
            maxsim_topk(df, q, metric="euclid")

    def test_multivector_sum_of_max(self, spark):
        """Full ColBERT shape: a query whose two tokens each align
        with a DIFFERENT doc's single token must rank the doc covering
        BOTH tokens above docs covering one — sum-of-max, not best
        single match. Identity bags score ~1e6 per token."""
        from vector_indexer_spark.operators.similarity import (
            maxsim_multivector,
        )

        toks = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),   # doc 1 covers token A only
                (2, [0.0, 1.0]),   # doc 2 covers token B only
                (3, [1.0, 0.0]),   # doc 3 covers both
                (3, [0.0, 1.0]),
            ],
            "doc_id long, embedding array<double>",
        )
        q = spark.createDataFrame(
            [(7, 0, [1.0, 0.0]), (7, 1, [0.0, 1.0])],
            "query_id long, qtok_id long, query array<double>",
        )
        out = {
            r.doc_id: (r.rank, r.score_micros)
            for r in maxsim_multivector(toks, q, k=10).collect()
        }
        assert out[3][0] == 1 and out[3][1] >= 2_000_000 - 2
        # one aligned token + one orthogonal -> ~1e6
        assert out[1][0] in (2, 3) and 999_998 <= out[1][1] <= 1_000_000
        assert out[2][1] == out[1][1]  # symmetric coverage, tie by id
        assert out[1][0] < out[2][0]

        with pytest.raises(ValueError):
            maxsim_multivector(toks, q, k=0)

    def test_arrow_equals_native_bit_exact(self, spark, embeddings):
        """The r10 arrow scoring path (pairwise_cosine_foldexact +
        partition-local maxima) must be BIT-identical to the native
        crossJoin fold-expression chain — same micros, same ranks —
        on a real float32 embedding corpus."""
        from vector_indexer_spark.operators.similarity import (
            maxsim_multivector,
        )

        toks = embeddings.select(
            F.expr("vec_id div 4").alias("doc_id"),
            F.col("embedding"),
        )
        q = embeddings.filter(F.col("vec_id") < 12).select(
            F.expr("vec_id div 4").alias("query_id"),
            F.col("vec_id").alias("qtok_id"),
            F.col("embedding").alias("query"),
        )
        a = sorted(
            map(tuple, maxsim_multivector(toks, q, k=7).collect())
        )
        n = sorted(
            map(
                tuple,
                maxsim_multivector(toks, q, k=7, method="native").collect(),
            )
        )
        assert a == n

    def test_pairwise_cosine_foldexact_matches_rowwise(self):
        """Kernel unit: every cell of the pairwise fold-exact cosine
        equals the rowwise fold-exact kernel on the same pair — the
        bitwise contract the maxsim arrow path relies on."""
        import numpy as np

        from vector_indexer_spark.functions.kernels import (
            pairwise_cosine_foldexact,
            rowwise_cosine_foldexact,
        )

        rng = np.random.default_rng(7)
        a = rng.normal(size=(13, 9)).astype(np.float32)
        b = rng.normal(size=(5, 9)).astype(np.float32)
        full = pairwise_cosine_foldexact(a, b)
        for j in range(b.shape[0]):
            row = rowwise_cosine_foldexact(
                a, np.repeat(b[j][None, :], a.shape[0], axis=0)
            )
            assert (full[:, j] == row).all()


    def test_arrow_empty_query_batch_returns_empty(self, spark):
        """An empty query_tokens frame must yield an empty result on
        the arrow path (it used to crash stack_arrays([]) inside
        executors where the native path returned empty)."""
        from vector_indexer_spark.operators.similarity import (
            maxsim_multivector,
        )

        toks = spark.createDataFrame(
            [(1, [1.0, 0.0])], "doc_id long, embedding array<double>"
        )
        q = spark.createDataFrame(
            [], "query_id long, qtok_id long, query array<double>"
        )
        assert maxsim_multivector(toks, q, k=5).count() == 0

    def test_string_ids_fall_back_to_native(self, spark):
        """Non-integral id columns can't ride the long-id arrow kernel;
        the default must auto-route to the native chain and still
        return correct rows."""
        from vector_indexer_spark.operators.similarity import (
            maxsim_multivector,
        )

        toks = spark.createDataFrame(
            [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
            "doc_id string, embedding array<double>",
        )
        q = spark.createDataFrame(
            [("q1", "t0", [1.0, 0.0])],
            "query_id string, qtok_id string, query array<double>",
        )
        rows = maxsim_multivector(toks, q, k=1).collect()
        assert [(r.query_id, r.doc_id) for r in rows] == [("q1", "a")]

    def test_query_broadcast_reused_across_calls(self, spark, embeddings):
        """Repeated calls with the same query batch must reuse ONE
        executor broadcast (the bench re-invokes a pair 4+ times); a
        different batch replaces (and unpersists) the cached one."""
        from vector_indexer_spark.operators import similarity as sim

        toks = embeddings.limit(40).select(
            F.expr("vec_id div 4").alias("doc_id"), F.col("embedding")
        )
        q1 = embeddings.filter(F.col("vec_id") < 4).select(
            F.expr("vec_id div 4").alias("query_id"),
            F.col("vec_id").alias("qtok_id"),
            F.col("embedding").alias("query"),
        )
        sim.maxsim_multivector(toks, q1, k=3).count()
        bc_first = sim._MAXSIM_QBC["bc"]
        sim.maxsim_multivector(toks, q1, k=3).count()
        assert sim._MAXSIM_QBC["bc"] is bc_first
        q2 = embeddings.filter(F.col("vec_id") < 8).select(
            F.expr("vec_id div 4").alias("query_id"),
            F.col("vec_id").alias("qtok_id"),
            F.col("embedding").alias("query"),
        )
        sim.maxsim_multivector(toks, q2, k=3).count()
        assert sim._MAXSIM_QBC["bc"] is not bc_first


class TestMaxSimAnn:
    def test_full_candidates_equal_brute_maxsim(
        self, spark, embeddings, tmp_path
    ):
        """token_k >= corpus tokens at full probe makes every doc a
        candidate, so the ANN path must equal brute maxsim_multivector
        row-for-row; a tight token_k must still rank each query's own
        source doc first (its tokens are their own nearest)."""
        from vector_indexer_spark.operators.index_build import build_index
        from vector_indexer_spark.operators.similarity import (
            maxsim_multivector,
            maxsim_multivector_ann,
        )

        toks = embeddings.filter(F.col("vec_id") < 120).select(
            F.expr("vec_id div 4").alias("doc_id"),
            F.col("vec_id").alias("tok_id"),
            "embedding",
        )
        idx = build_index(
            toks.select(
                F.col("tok_id").alias("id"),
                F.col("embedding").alias("values"),
            ),
            str(tmp_path / "maxsim_ann_idx"),
            nlist=8,
            seed=7,
        )
        q = embeddings.filter(F.col("vec_id").isin(0, 1, 2, 3, 40, 41, 42, 43)).select(
            F.expr("vec_id div 4").alias("query_id"),
            F.col("vec_id").alias("qtok_id"),
            F.col("embedding").alias("query"),
        )

        def rows(df):
            return sorted(
                (r.query_id, r.rank, r.doc_id, r.score_micros)
                for r in df.collect()
            )

        ann_full = maxsim_multivector_ann(
            spark, toks, q, idx, k=5, token_k=120, n_probe=idx.nlist
        )
        brute = maxsim_multivector(
            toks, q, k=5, doc_col="doc_id", vec_col="embedding"
        )
        assert rows(ann_full) == rows(brute)

        pruned = maxsim_multivector_ann(
            spark, toks, q, idx, k=5, token_k=4, n_probe=idx.nlist
        ).collect()
        top1 = {r.query_id: r.doc_id for r in pruned if r.rank == 1}
        assert top1 == {0: 0, 10: 10}

        with pytest.raises(ValueError):
            maxsim_multivector_ann(spark, toks, q, idx, k=0)
        with pytest.raises(ValueError):
            maxsim_multivector_ann(spark, toks, q, idx, token_k=0)


class TestMrlSearch:
    def test_full_prefix_degenerates_to_exact(self, spark, embeddings):
        """prefix_dims = d makes the shortlist pass exact, so the
        refined result must equal exact kNN row-for-row; a 16-dim
        prefix with generous refine must still recover most of the
        true top-10 (prefix ranking is a valid coarse filter even on
        non-MRL-trained vectors)."""
        from vector_indexer_spark.operators.knn import knn_exact
        from vector_indexer_spark.operators.similarity import mrl_search

        q = embeddings.filter(F.col("vec_id") % 37 == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query"),
        )
        d = len(embeddings.first()["embedding"])
        full = sorted(
            (r.query_id, r.rank, r.neighbor_id, r.dist2)
            for r in mrl_search(
                embeddings, q, k=5, prefix_dims=d, refine_factor=1
            ).collect()
        )
        exact = sorted(
            (r.query_id, r.rank, r.neighbor_id, r.dist2)
            for r in knn_exact(
                embeddings, q, k=5, id_col="vec_id", vec_col="embedding",
                method="native",
            ).collect()
        )
        assert full == exact

        # these embeddings are NOT MRL-trained, so a 16-of-32 prefix is
        # a noisy coarse filter — a deep shortlist (100 of ~500) must
        # still recover well over half the true top-5; the exactness
        # contract above is the real lock
        got = mrl_search(
            embeddings, q, k=5, prefix_dims=16, refine_factor=20
        ).collect()
        want = {(t[0], t[2]) for t in exact}
        hits = sum(1 for r in got if (r.query_id, r.neighbor_id) in want)
        assert hits / len(want) >= 0.6, hits / len(want)
        # refined distances are TRUE full-width distances
        exact_d = {(r[0], r[2]): r[3] for r in exact}
        for r in got:
            key = (r.query_id, r.neighbor_id)
            if key in exact_d:
                assert r.dist2 == exact_d[key]

    def test_validation(self, spark, embeddings):
        from vector_indexer_spark.operators.similarity import mrl_search

        q = embeddings.limit(1).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query"),
        )
        with pytest.raises(ValueError):
            mrl_search(embeddings, q, k=0)
        with pytest.raises(ValueError):
            mrl_search(embeddings, q, prefix_dims=0)
        with pytest.raises(ValueError):
            mrl_search(embeddings, q, refine_factor=0)

    def test_ann_full_probe_equals_brute_mrl(
        self, spark, embeddings, tmp_path
    ):
        """mrl_search_ann at full probe finds the identical exact
        prefix-space shortlist, and the refine stage is shared — so it
        must equal brute mrl_search row-for-row. A pruned probe must
        still return k true-distance-ranked rows per query."""
        from vector_indexer_spark.operators.index_build import build_index
        from vector_indexer_spark.operators.similarity import (
            mrl_search,
            mrl_search_ann,
        )

        idx = build_index(
            embeddings.select(
                F.col("vec_id").alias("id"),
                F.slice(F.col("embedding"), 1, 16).alias("values"),
            ),
            str(tmp_path / "mrl_idx"),
            nlist=8,
            seed=11,
        )
        q = embeddings.filter(F.col("vec_id") % 53 == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query"),
        )

        def rows(df):
            return sorted(
                (r.query_id, r.rank, r.neighbor_id, r.dist2)
                for r in df.collect()
            )

        ann = mrl_search_ann(
            spark, embeddings, q, idx, k=5, prefix_dims=16,
            refine_factor=4, n_probe=idx.nlist,
        )
        brute = mrl_search(
            embeddings, q, k=5, prefix_dims=16, refine_factor=4
        )
        assert rows(ann) == rows(brute)

        pruned = mrl_search_ann(
            spark, embeddings, q, idx, k=5, prefix_dims=16,
            refine_factor=4, n_probe=2,
        ).collect()
        nq = q.count()
        assert len(pruned) == 5 * nq
        # dist2 is the TRUE full-width distance, ascending per query
        per_q = {}
        for r in sorted(pruned, key=lambda r: (r.query_id, r.rank)):
            per_q.setdefault(r.query_id, []).append(r.dist2)
        for ds in per_q.values():
            assert ds == sorted(ds)

        with pytest.raises(ValueError):
            mrl_search_ann(spark, embeddings, q, idx, k=0)
        with pytest.raises(ValueError):
            # index dimension (16) != prefix_dims
            mrl_search_ann(spark, embeddings, q, idx, prefix_dims=32)


def test_hard_negatives_excludes_self_handles_duplicates(spark, embeddings, tmp_path):
    from vector_indexer_spark.operators.index_build import build_index
    from vector_indexer_spark.operators.similarity import (
        mine_hard_negatives,
    )

    # corpus where id 1000 duplicates id 0 exactly
    dup = embeddings.filter(F.col("vec_id") == 0).select(
        F.lit(1000).alias("vec_id"), "embedding", "label"
    )
    corpus = embeddings.select("vec_id", "embedding", "label").union(dup)
    anchors = corpus.filter(F.col("vec_id").isin(0, 1000))
    out = mine_hard_negatives(corpus, anchors=anchors, k=3).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for aid, other in ((0, 1000), (1000, 0)):
        rows = sorted(by_anchor[aid], key=lambda r: r.rank)
        assert len(rows) == 3
        assert all(r.negative_id != aid for r in rows)
        # the exact duplicate is the hardest negative, at distance 0
        assert rows[0].negative_id == other and rows[0].dist2 == 0.0

    # ANN path at full probe matches brute force
    vec = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("values")
    )
    idx = build_index(vec, str(tmp_path / "hnidx"), nlist=8, seed=42)
    a5 = embeddings.filter(F.col("vec_id") < 5)
    brute = {
        (r.anchor_id, r.rank): r.negative_id
        for r in mine_hard_negatives(embeddings, anchors=a5, k=4).collect()
    }
    ann = {
        (r.anchor_id, r.rank): r.negative_id
        for r in mine_hard_negatives(
            embeddings, anchors=a5, k=4, index=idx, n_probe=idx.nlist
        ).collect()
    }
    assert ann == brute


def test_mmr_rerank_diversity_and_degenerate_lambda(spark):
    from vector_indexer_spark.operators.similarity import mmr_rerank

    # candidates: two near-duplicates with top relevance + two
    # orthogonal lower-relevance docs. Pure relevance ranks the dupes
    # 1-2; at λ=0.5 the near-dup's similarity penalty (~0.5) exceeds
    # its relevance edge, so BOTH orthogonal docs outrank it.
    rows = [
        (0, 1, [1.0, 0.0, 0.0], 1.00),
        (0, 2, [0.999, 0.01, 0.0], 0.99),   # near-dup of cand 1
        (0, 3, [0.0, 1.0, 0.0], 0.80),      # orthogonal
        (0, 4, [0.0, 0.0, 1.0], 0.10),
    ]
    cands = spark.createDataFrame(
        rows, "query_id long, cand_id long, vec array<double>, score double"
    )
    out = mmr_rerank(cands, k=3, lambda_mult=0.5).collect()
    order = [r.cand_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [1, 3, 4]
    # λ=1 degenerates to pure relevance order
    out1 = mmr_rerank(cands, k=4, lambda_mult=1.0).collect()
    order1 = [r.cand_id for r in sorted(out1, key=lambda r: r.rank)]
    assert order1 == [1, 2, 3, 4]
    # k > n returns all candidates, ranks dense
    assert len(mmr_rerank(cands, k=10).collect()) == 4
    with pytest.raises(ValueError, match="positive"):
        mmr_rerank(cands, k=0)
    with pytest.raises(ValueError, match="lambda"):
        mmr_rerank(cands, k=1, lambda_mult=1.5)


def test_mmr_rerank_matches_local_reference(spark, embeddings):
    import numpy as np

    from vector_indexer_spark.operators.similarity import mmr_rerank

    # candidates = 20 embeddings per query with synthetic relevance
    cands = (
        embeddings.filter(F.col("vec_id") < 20)
        .crossJoin(spark.range(2).withColumnRenamed("id", "query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").cast("array<double>").alias("vec"),
            (1.0 / (F.col("vec_id") + F.col("query_id") + 1.0)).alias(
                "score"
            ),
        )
    )
    got = {
        (r.query_id, r.rank): r.cand_id
        for r in mmr_rerank(cands, k=5, lambda_mult=0.7).collect()
    }

    rows = cands.collect()
    for qid in (0, 1):
        sub = [r for r in rows if r.query_id == qid]
        ids = np.array([r.cand_id for r in sub])
        rel = np.array([r.score for r in sub])
        mat = np.array([r.vec for r in sub], dtype=np.float64)
        unit = mat / np.linalg.norm(mat, axis=1)[:, None]
        avail = np.ones(len(ids), bool)
        max_sim = np.zeros(len(ids))
        picked = []
        for r in range(5):
            mmr = 0.7 * rel - 0.3 * (max_sim if picked else 0.0)
            mmr = np.where(avail, mmr, -np.inf)
            tied = np.flatnonzero(avail & (np.abs(mmr - mmr.max()) < 1e-15))
            j = tied[np.argmin(ids[tied])]
            picked.append(j)
            avail[j] = False
            max_sim = np.maximum(max_sim, unit @ unit[j])
            assert got[(qid, r + 1)] == ids[j]


def test_boilerplate_paragraph_removal(spark):
    from vector_indexer_spark.operators.dedup import (
        remove_boilerplate_paragraphs,
    )

    footer = "subscribe to our newsletter today"
    rows = [
        (i, f"unique sentence number {i} here. {footer}. closing thought {i}")
        for i in range(10)
    ] + [(100, "a document with no boilerplate at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_paragraphs(df, max_docs=5).collect()
    }
    for i in range(10):
        # the 10x-repeated footer is stripped; order preserved
        assert out[i].text == (
            f"unique sentence number {i} here. closing thought {i}"
        )
        assert out[i].n_removed == 1
    assert out[100].text == "a document with no boilerplate at all"
    assert out[100].n_removed == 0
    # short repeated fragments are exempt (min_chars)
    short = spark.createDataFrame(
        [(i, f"ok. real content for document {i}") for i in range(10)],
        "doc_id long, text string",
    )
    res = remove_boilerplate_paragraphs(short, max_docs=5).collect()
    assert all(r.text.startswith("ok. ") and r.n_removed == 0 for r in res)


def test_decontaminate_semantic_drops_self_and_near(spark):
    from vector_indexer_spark.operators.dedup import (
        decontaminate_semantic,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of eval vector
        (2, [0.0, 1.0, 0.0]),      # orthogonal — survives
        (3, [0.0, 0.0, 1.0]),      # orthogonal — survives
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>"
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "eid long, embedding array<double>"
    )
    kept = decontaminate_semantic(corpus, ev, threshold=0.95)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    # all columns pass through
    assert kept.columns == corpus.columns


def test_decontaminate_semantic_threshold_contract(spark):
    import pytest as _pytest

    from vector_indexer_spark.operators.dedup import (
        decontaminate_semantic,
    )

    df = spark.createDataFrame(
        [(0, [1.0])], "doc_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="threshold"):
        decontaminate_semantic(df, df, threshold=0.0)


def test_decontaminate_semantic_broadcasts_eval_side(spark):
    from vector_indexer_spark.operators.dedup import (
        decontaminate_semantic,
    )
    from vector_indexer_spark.plans import audit

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    out = decontaminate_semantic(
        emb, emb.limit(5), threshold=0.9, id_col="vec_id"
    )
    plan = audit.executed_plan(out)
    # the only nested-loop is against the broadcast eval set; the
    # corpus side never exchanges on a data-sized key
    assert "BroadcastNestedLoopJoin" in plan
    assert not audit.has_cartesian(out)


def test_jaccard_join_hand_case_boundary(spark):
    from vector_indexer_spark.operators.dedup import (
        jaccard_similarity_join,
    )

    rows = [
        (0, "a b c d"),       # {a,b,c,d}
        (1, "a b c e"),       # jacc(0,1) = 3/5 = 0.6
        (2, "a b"),           # jacc(0,2) = 2/4 = 0.5 (boundary)
        (3, "x y z"),         # disjoint
        (4, ""),              # empty — never pairs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_int"], r["n_union"])
        for r in jaccard_similarity_join(docs, threshold=0.5).collect()
    }
    assert got == {(0, 1): (3, 5), (0, 2): (2, 4), (1, 2): (2, 4)}
    # strictly above 0.5: the boundary pairs drop, 0.6 survives
    got6 = {
        (r["id_a"], r["id_b"])
        for r in jaccard_similarity_join(docs, threshold=0.51).collect()
    }
    assert got6 == {(0, 1)}


def test_jaccard_join_matches_bruteforce_random(spark):
    import itertools
    import random

    from vector_indexer_spark.operators.dedup import (
        jaccard_similarity_join,
    )

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randint(1, 12))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        got = {
            (r["id_a"], r["id_b"])
            for r in jaccard_similarity_join(docs, threshold=t).collect()
        }
        sets = {i: set(s.split()) for i, s in rows}
        tm = int(round(t * 1_000_000))
        want = set()
        for a, b in itertools.combinations(range(60), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * 1_000_000 >= tm * union:
                want.add((a, b))
        assert got == want, f"threshold {t}"


def test_jaccard_join_threshold_contract(spark):
    from vector_indexer_spark.operators.dedup import (
        jaccard_similarity_join,
    )

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    import pytest as _p

    with _p.raises(ValueError, match="threshold"):
        jaccard_similarity_join(docs, threshold=0.0)


def test_edit_distance_verify_hand_case(spark):
    from vector_indexer_spark.operators.dedup import (
        edit_distance_verify,
    )

    docs = spark.createDataFrame(
        [(0, "kitten"), (1, "sitting"), (2, "kitten"), (3, "zzzzzz")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in edit_distance_verify(
            pairs, docs, max_distance=3
        ).collect()
    }
    assert got == {(0, 1): 3, (0, 2): 0}  # (0,3) is 6 edits — dropped
    import pytest as _p

    with _p.raises(ValueError, match="max_distance"):
        edit_distance_verify(pairs, docs, max_distance=-1)


# ---------------------------------------------------------------------------
# Incremental (delta-vs-corpus) dedup
# ---------------------------------------------------------------------------


def test_incremental_exact_survivors(spark):
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta"), (2, "eta theta")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),       # exact corpus dup -> dropped
            (11, "brand new content one"),  # survives
            (12, "brand new content one"),  # intra-batch dup of 11 -> dropped
            (13, "brand new content two"),  # survives
        ],
        "doc_id long, text string",
    )
    manifest = dedup.content_hash_manifest(corpus)
    kept = sorted(
        r.doc_id
        for r in dedup.dedup_incremental_exact(delta, manifest).collect()
    )
    assert kept == [11, 13]


def test_incremental_exact_bloom_path_is_exact(spark, docs):
    """The Bloom-prefiltered manifest join must return EXACTLY the
    plain anti-join's survivors (no false negatives by construction,
    false positives removed by the join)."""
    corpus = docs.filter(F.col("doc_id") < 300)
    delta = docs.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" new"))
        ).otherwise(F.col("text")).alias("text"),
    )
    manifest = dedup.content_hash_manifest(corpus)
    plain = {
        r.doc_id
        for r in dedup.dedup_incremental_exact(delta, manifest).collect()
    }
    bloomed = {
        r.doc_id
        for r in dedup.dedup_incremental_exact(
            delta, manifest, bloom_bits=1 << 14
        ).collect()
    }
    assert bloomed == plain
    # only the perturbed half survives
    assert plain == {10_000 + i for i in range(0, 100, 2)}


def test_incremental_lsh_matches_batch_cross_pairs(spark, docs):
    """Incremental candidates against a banded manifest must equal the
    from-scratch batch LSH run over corpus ∪ delta, restricted to
    cross (delta, corpus) pairs — the incremental path may never see
    different buckets than a full re-run."""
    corpus = docs.filter(F.col("doc_id") < 40).select("doc_id", "text")
    delta = corpus.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    manifest = dedup.banded_signatures(corpus)
    incr = {
        (r.new_id, r.corpus_id)
        for r in dedup.incremental_lsh_candidates(delta, manifest).collect()
    }
    batch = dedup.lsh_candidate_pairs(corpus.unionByName(delta)).collect()
    cross = {
        (b, a) for a, b in ((r.id_a, r.id_b) for r in batch)
        if a < 10_000 <= b
    }
    assert incr == cross
    for i in range(40):  # identical texts must match their original
        assert (i + 10_000, i) in incr


def test_incremental_lsh_bucket_cap_spans_both_sides(spark):
    """A boilerplate bucket that is oversized only in corpus+delta
    UNION must be dropped — the cap has to count both sides, or an
    incremental run would emit pairs a from-scratch run suppresses."""
    boiler = "the same boilerplate footer text repeated verbatim"
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(8)]
        + [(100, "a genuinely unique document about spark shuffles")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(1_000 + i, boiler) for i in range(8)]
        + [(1_100, "a genuinely unique document about spark shuffles")],
        "doc_id long, text string",
    )
    manifest = dedup.banded_signatures(corpus)
    capped = {
        (r.new_id, r.corpus_id)
        for r in dedup.incremental_lsh_candidates(
            delta, manifest, max_bucket_size=10
        ).collect()
    }
    # 8 + 8 = 16 > cap: boilerplate suppressed; unique doc still pairs
    assert capped == {(1_100, 100)}
    uncapped = dedup.incremental_lsh_candidates(
        delta, manifest, max_bucket_size=None
    ).count()
    assert uncapped == 8 * 8 + 1


def test_incremental_near_verifies_jaccard(spark):
    corpus = spark.createDataFrame(
        [
            (0, "one two three four five six seven eight nine ten"),
            (1, "completely different words in this corpus document here"),
        ],
        "doc_id long, text string",
    )
    # near-dup of doc 0 (one token appended), plus an unrelated doc
    delta = spark.createDataFrame(
        [
            (10, "one two three four five six seven eight nine ten eleven"),
            (11, "nothing shared with anything at all whatsoever kept apart"),
        ],
        "doc_id long, text string",
    )
    manifest = dedup.banded_signatures(corpus)
    out = dedup.dedup_incremental_near(
        delta, corpus, manifest, threshold=0.5
    ).collect()
    matches = {(r.new_id, r.corpus_id): r.jaccard for r in out}
    assert set(matches) == {(10, 0)}
    # 8 shared shingles of 9+1 distinct-union -> 8/11... compute exactly:
    # shingles(10 tokens, k=3) = 8; shingles(11 tokens) = 9; shared = 8
    assert matches[(10, 0)] == pytest.approx(8 / 9)


def test_resolve_keep_best_picks_argmax_quality(spark):
    df = spark.createDataFrame(
        [
            (0, 1.0), (1, 5.0), (2, 5.0),   # group {0,1,2}: 1 wins (tie 1<2)
            (3, 2.0), (4, 1.0),             # group {3,4}: 3 wins
            (9, 0.5),                       # singleton keeps itself
        ],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: (r.canonical_id, r.keep_id)
        for r in dedup.resolve_keep_best(df, pairs).collect()
    }
    assert out == {
        0: (0, 1), 1: (0, 1), 2: (0, 1),
        3: (3, 3), 4: (3, 3),
        9: (9, 9),
    }


def test_containment_catches_quote_inclusion(spark):
    from vector_indexer_spark.operators.dedup import containment_pairs

    small = "one two three four five six"
    big = "zero prefix words here " + small + " and a long suffix tail " \
          "with many additional tokens to dilute the union further"
    df = spark.createDataFrame(
        [(0, small), (1, big)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    row = containment_pairs(df, pairs).collect()[0]
    # every shingle of the small doc appears in the big one
    assert row.containment_a == 1.0
    assert row.containment_b < 0.5
    assert row.jaccard < 0.5  # Jaccard alone would miss this dup


# ---------------------------------------------------------------------------
# Substring-level dedup: duplicate spans
# ---------------------------------------------------------------------------


def test_duplicate_spans_finds_shared_boilerplate(spark):
    from vector_indexer_spark.operators.dedup import (
        duplicate_spans,
        span_dup_stats,
    )

    boiler = "all rights reserved contact the legal office"
    rows = [
        (0, f"alpha beta gamma {boiler} delta epsilon"),
        (1, f"zeta eta theta iota {boiler} kappa"),
        (2, "completely unrelated words without any overlap here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_end): r.n_grams
        for r in duplicate_spans(df, k=3, min_df=2).collect()
    }
    # boiler is 7 tokens -> 5 grams; doc 0 offset 3, doc 1 offset 4
    assert spans == {(0, 3, 9): 5, (1, 4, 10): 5}

    stats = {r.doc_id: r for r in span_dup_stats(df, k=3, min_df=2).collect()}
    assert stats[0].dup_tokens == 7 and stats[0].total_tokens == 12
    assert stats[1].dup_tokens == 7
    assert stats[2].dup_tokens == 0 and stats[2].dup_fraction == 0.0
    assert abs(stats[0].dup_fraction - 7 / 12) < 1e-12

    # identical docs -> one full-doc span each, full coverage
    two = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")], "doc_id long, text string"
    )
    full = duplicate_spans(two, k=3, min_df=2).collect()
    assert {(r.doc_id, r.span_start, r.span_end, r.n_grams) for r in full} == {
        (0, 0, 4, 3), (1, 0, 4, 3)
    }
    fs = span_dup_stats(two, k=3, min_df=2).collect()
    assert all(r.dup_fraction == 1.0 for r in fs)

    # min_df above corpus multiplicity -> nothing flagged
    assert duplicate_spans(two, k=3, min_df=3).count() == 0

    # overlapping runs within k-1 tokens are not double-counted
    # docs share grams "a b c" and "c d e" but not "b c d"
    ov = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x a b c y c d e z")],
        "doc_id long, text string",
    )
    st = {r.doc_id: r for r in span_dup_stats(ov, k=3, min_df=2).collect()}
    assert st[0].dup_tokens == 5  # union of [0,2] and [2,4], not 6

    import pytest as _pytest

    with _pytest.raises(ValueError):
        duplicate_spans(df, k=0)
    with _pytest.raises(ValueError):
        span_dup_stats(df, min_df=0)


def test_embedding_near_dups_arrow_native_bitexact(spark, embeddings):
    from vector_indexer_spark.operators.dedup import embedding_near_dups

    sub = embeddings.limit(120)
    kwargs = dict(block_col=None, threshold=0.0, max_block_size=None)
    nat = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_dups(sub, method="native", **kwargs)
        .collect()
    }
    arr = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_dups(sub, method="arrow", **kwargs)
        .collect()
    }
    assert nat == arr  # bit-identical doubles

    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        embedding_near_dups(sub, method="simd", **kwargs)


def test_rowwise_cosine_foldexact_matches_sequential_fold():
    import math

    import numpy as np

    from vector_indexer_spark.functions.kernels import (
        rowwise_cosine_foldexact,
    )

    rng = np.random.default_rng(7)
    a = (rng.normal(0, 1, (300, 17)) * 10.0 ** rng.integers(
        -5, 5, (300, 17))).astype(np.float32)
    b = (rng.normal(0, 1, (300, 17)) * 10.0 ** rng.integers(
        -5, 5, (300, 17))).astype(np.float32)
    got = rowwise_cosine_foldexact(a, b)
    for i in range(300):
        dot = na = nb = 0.0
        for j in range(17):
            x, y = float(a[i, j]), float(b[i, j])
            dot += x * y
            na += x * x
            nb += y * y
        assert got[i] == dot / (math.sqrt(na) * math.sqrt(nb))


def test_embedding_near_dups_graph_finds_planted_pairs(spark):
    import numpy as np

    from vector_indexer_spark.operators.dedup import (
        embedding_near_dups_graph,
    )

    rng = np.random.default_rng(41)
    base = rng.normal(0, 10, (60, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant 5 near-dups: tiny perturbations of existing points
    for j in range(5):
        rows.append(
            (100 + j, [float(x) + 0.001 for x in base[j * 7]])
        )
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_near_dups_graph(
        vecs, threshold2=0.01, k=4, iterations=3,
        id_col="vec_id", vec_col="embedding",
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert {(j * 7, 100 + j) for j in range(5)} <= pairs
    # nothing else is that close in a spread Gaussian cloud
    assert len(pairs) == 5
    assert all(r.dist2 <= 0.01 for r in got)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="threshold2"):
        embedding_near_dups_graph(vecs, threshold2=-1.0)
