"""Byte-pair-encoding tokenizer induction + distributed apply.

The real tokenizer-training op of an LLM data pipeline (Sennrich et
al. 2016; the GPT-2 byte-level variant simplified to visible
characters): learn a merge list from the corpus, then tokenize the
whole corpus with it.

Spark-first shape — the same split the quantizer trainers use
(operators/pq.py, kmeans sample init):

- **Train on a bounded seeded sample** collected to the driver. BPE
  training is inherently sequential (merge i+1 depends on merge i),
  and every production tokenizer trains on a corpus sample; the
  sample cap bounds driver memory exactly like ``_collect_sample``
  does for k-means init.
- **Apply distributed**: the learned merge ranks broadcast (a small
  dict), and encoding runs per-document inside ``mapInPandas`` Arrow
  batches — embarrassingly parallel, zero shuffles, the 100 TB path.

Word pre-tokenization is whitespace splitting with a word-end marker
(``</w>``) appended to each word's final symbol, so merges never
cross word boundaries and detokenization is exact concatenation —
``bpe_decode_tokens`` round-trips to the original text, which the
tests assert verbatim.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"

BPE_TRAIN_SAMPLE_CAP = 50_000  # documents; mirrors KMEANS_INIT_SAMPLE_CAP


def _words(text: str) -> list[str]:
    return text.split()


def _word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence: characters, last one carrying the
    word-end marker (``low`` → ``l o w</w>``)."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + END
    return tuple(chars)


def bpe_train_local(word_freqs: dict, n_merges: int) -> list[tuple[str, str]]:
    """The sequential core: greedy highest-count pair merging over a
    ``{word: freq}`` table. Ties break lexicographically so the merge
    list is deterministic for a given corpus sample. Returns the
    ordered merge list (the entire tokenizer model)."""
    vocab = {_word_symbols(w): f for w, f in word_freqs.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freq
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:  # nothing left worth merging
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Tokenize one word with the learned merge ranks — the standard
    lowest-rank-first merge loop (the apply side of Sennrich §3)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    *,
    text_col: str = "text",
    sample_cap: int = BPE_TRAIN_SAMPLE_CAP,
    max_vocab: int = 1_000_000,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from a corpus DataFrame.

    The distributed part is the word-frequency aggregation (one
    explode + one count shuffle over the sampled docs); the merge loop
    itself runs on the driver over the aggregated ``{word: freq}``
    table. That table is vocabulary-sized, and at 100 TB even the
    sampled vocabulary can be web-scale, so the collect is doubly
    bounded: ``sample_cap`` documents AND the ``max_vocab`` most
    frequent words (a distributed top-k, deterministic via the
    (freq desc, word) sort). Dropping the Zipf tail barely moves the
    learned merges — the pair counts that decide them live in the
    head — and unseen words still tokenize (character fallback).
    """
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    docs = df.select(text_col)
    n = docs.count()
    if n > sample_cap:
        docs = docs.sample(fraction=min(1.0, sample_cap * 1.1 / n), seed=seed)
    freq_rows = (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(max_vocab)
        .collect()
    )
    return bpe_train_local({r.word: r.freq for r in freq_rows}, n_merges)


def bpe_tokenize(
    df: DataFrame,
    merges: list,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed apply: ``(doc_id, tokens ARRAY<STRING>, n_tokens)``
    per document. The merge-rank dict broadcasts inside the Arrow
    workers (closure capture — it is merge-list-sized); encoding is
    per-word memoized within each batch, so repeated words (the Zipf
    bulk of any corpus) tokenize once per partition."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            all_tokens = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in _words(text or ""):
                    got = cache.get(w)
                    if got is None:
                        got = bpe_encode_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
                all_tokens.append(toks)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "tokens": all_tokens,
                    "n_tokens": [len(t) for t in all_tokens],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        _tok, "doc_id long, tokens array<string>, n_tokens long"
    )


def bpe_decode_tokens(tokens: list) -> str:
    """Exact detokenization: concatenate, turning each word-end marker
    back into a space (inverse of the pre-tokenizer up to whitespace
    normalization)."""
    return "".join(tokens).replace(END, " ").rstrip()
