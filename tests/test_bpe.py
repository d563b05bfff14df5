"""BPE tokenizer induction + distributed apply (operators/bpe.py).

The trainer is verified against a hand-computable corpus and a pure
reference re-implementation; the distributed apply is verified to
round-trip every document exactly."""

from __future__ import annotations

import pytest

from vector_indexer_spark.operators.bpe import (
    END,
    bpe_decode_tokens,
    bpe_encode_word,
    bpe_tokenize,
    bpe_train,
    bpe_train_local,
)


def test_train_local_hand_computed():
    # classic Sennrich example shape: "low" x5, "lowest" x2
    freqs = {"low": 5, "lowest": 2}
    merges = bpe_train_local(freqs, 10)
    # first merge must be the highest-count adjacent pair: ('l','o') 7
    assert merges[0] == ("l", "o")
    # 'lo'+'w</w>' (5) beats 'lo'+'w' (2) next
    assert merges[1] == ("lo", "w" + END)
    # encoding uses ranks: "low" collapses fully
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert bpe_encode_word("low", ranks) == ["low" + END]


def test_train_determinism_and_tie_break():
    freqs = {"ab": 3, "cd": 3}
    m1 = bpe_train_local(freqs, 2)
    m2 = bpe_train_local(dict(reversed(list(freqs.items()))), 2)
    assert m1 == m2  # dict order must not matter


def test_encode_unseen_word_falls_back_to_chars():
    merges = bpe_train_local({"low": 5}, 5)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    toks = bpe_encode_word("xyz", ranks)
    assert toks == ["x", "y", "z" + END]
    assert bpe_decode_tokens(toks) == "xyz"


def test_spark_train_and_tokenize_roundtrip(spark, documents):
    merges = bpe_train(documents, n_merges=100, seed=42)
    assert 0 < len(merges) <= 100
    out = bpe_tokenize(documents, merges)
    rows = {r.doc_id: r for r in out.collect()}
    src = {r.doc_id: r.text for r in documents.select("doc_id", "text").collect()}
    assert set(rows) == set(src)
    for did, r in rows.items():
        # exact detokenization: whitespace-normalized text round-trips
        assert bpe_decode_tokens(list(r.tokens)) == " ".join(src[did].split())
        assert r.n_tokens == len(r.tokens)
    # merges compress: learned tokenization is shorter than characters
    total_tokens = sum(r.n_tokens for r in rows.values())
    total_chars = sum(len(t.replace(" ", "")) for t in src.values())
    assert total_tokens < total_chars


def test_spark_apply_matches_local_reference(spark, documents):
    merges = bpe_train(documents, n_merges=50, seed=42)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sample = documents.limit(20).select("doc_id", "text").collect()
    got = {
        r.doc_id: list(r.tokens)
        for r in bpe_tokenize(
            documents.limit(20), merges
        ).collect()
    }
    for r in sample:
        want = []
        for w in r.text.split():
            want.extend(bpe_encode_word(w, ranks))
        assert got[r.doc_id] == want


def test_train_validation(spark, documents):
    with pytest.raises(ValueError, match="positive"):
        bpe_train(documents, n_merges=0)
