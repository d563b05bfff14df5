"""Text-analysis expressions for the training-data pipeline extensions.

These are post-parity operators (SURVEY §7 Phase 6 / BASELINE north
star): language-ID, quality scoring, token counting, and document
fingerprinting over a string column — all as **native Catalyst
expressions** (no Python in the hot path), deliberately restricted to
primitives with bit-identical DuckDB equivalents so every operator is
oracle-checkable:

- tokenization: ``lower`` + ASCII regexp split (portable; a
  production system would plug a real tokenizer into the same shape)
- token hashing: first 8 hex chars of md5 → int (32-bit), the one
  string-hash primitive both engines share
- ratios: double division of regexp character counts
- fingerprint: fold-left polynomial rolling hash mod 2^31-1

At 100 TB each of these is a scan-local projection — no shuffle, no
UDF, full whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"
HASH_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)

# Small marker-word lists for the lang-id heuristic. Deterministic and
# documented — this is an n-gram/stopword heuristic, not a trained model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with", "for", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"),
    "es": ("el", "los", "las", "es", "una", "para", "con", "por", "del", "se"),
}
STOPWORDS_EN = LANG_MARKERS["en"] + ("it", "on", "as", "are", "this", "be", "at")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(col: Column | str) -> Column:
    """Lowercased ASCII tokens, empties removed."""
    return F.filter(
        F.split(F.lower(_c(col)), TOKEN_SPLIT), lambda t: t != F.lit("")
    )


def token_count_expr(col: Column | str) -> Column:
    """Whitespace/punct token count (the "token counting" op)."""
    return F.size(tokens_expr(col)).cast("long")


BPE_ISH_PATTERN = "[a-z]{1,4}|[0-9]|[^a-z0-9 \\t\\n\\x0B\\f\\r]"


def bpe_token_count_expr(col: Column | str) -> Column:
    """BPE-ish subword count estimate: lowercased text split into
    letter chunks of ≤4 chars, single digits, and non-space symbols —
    the regex approximation of byte-pair tokenizer output volume
    (restricted to RE2-compatible constructs so the DuckDB oracle can
    mirror it; real learned BPE merges would be a Pandas-UDF stage).

    Whitespace is an EXPLICIT char class, not ``\\s``: Java regex
    (Spark) counts \\x0B as whitespace, RE2 (DuckDB) does not, so
    ``\\s`` would make counts diverge on texts containing a vertical
    tab. The explicit class pins identical semantics in both engines.
    """
    return F.size(
        F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_ISH_PATTERN), F.lit(0))
    ).cast("long")


def char_count_expr(col: Column | str, char_class: str) -> Column:
    """Count of characters matching a regexp class."""
    return F.length(F.regexp_replace(_c(col), f"[^{char_class}]", "")).cast(
        "long"
    )


def digit_ratio_expr(col: Column | str) -> Column:
    return char_count_expr(col, "0-9").cast("double") / F.length(_c(col)).cast(
        "double"
    )


def space_ratio_expr(col: Column | str) -> Column:
    return char_count_expr(col, " ").cast("double") / F.length(_c(col)).cast(
        "double"
    )


def alpha_ratio_expr(col: Column | str) -> Column:
    return char_count_expr(col, "a-zA-Z").cast("double") / F.length(
        _c(col)
    ).cast("double")


def stopword_count_expr(col: Column | str, words=STOPWORDS_EN) -> Column:
    toks = tokens_expr(col)
    wset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wset, t))).cast(
        "long"
    )


def stopword_ratio_expr(col: Column | str, words=STOPWORDS_EN) -> Column:
    n = token_count_expr(col)
    return F.when(n > 0, stopword_count_expr(col, words).cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score_expr(col: Column | str) -> Column:
    """Heuristic document quality in [0, 1]: length saturation,
    alphabetic purity, and stopword plausibility, equally weighted.
    (The shape of the reference-free quality filters used by LLM data
    pipelines; weights are documented constants.)"""
    n_tok = token_count_expr(col).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    alpha_score = alpha_ratio_expr(col)
    stop_score = F.least(
        stopword_ratio_expr(col) * F.lit(4.0), F.lit(1.0)
    )
    return (len_score + alpha_score + stop_score) / F.lit(3.0)


def lang_id_expr(col: Column | str) -> Column:
    """Marker-stopword argmax language ID with deterministic tie-break
    (declaration order: en, de, fr, es); 'und' when nothing matches."""
    counts = {
        lang: stopword_count_expr(col, words)
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when(
            (best > 0) & (counts[lang] == best), F.lit(lang)
        ).otherwise(out)
    return out


def token_hash_expr(token: Column) -> Column:
    """Portable 32-bit token hash: first 8 hex chars of md5 → bigint.
    (Both engines share md5; Spark's murmur ``hash()`` does not exist
    in DuckDB, so it can't anchor oracle-checked operators.)"""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")


def shingles_expr(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles (k consecutive tokens joined by a space)."""
    toks = tokens_expr(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0)))
    return F.when(n >= k, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )).otherwise(F.array().cast("array<string>"))


def shingle_hashes_expr(col: Column | str, k: int = 3) -> Column:
    """Distinct hashed k-shingles (input to MinHash / Jaccard)."""
    return F.transform(
        F.array_distinct(shingles_expr(col, k)),
        lambda s: token_hash_expr(s) % F.lit(HASH_MOD),
    )


def fingerprint_expr(col: Column | str) -> Column:
    """Rolling polynomial hash over tokens, mod 2^31-1: the document
    fingerprint (order-sensitive — re-ordered tokens change it)."""
    toks = tokens_expr(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + token_hash_expr(t) % F.lit(HASH_MOD))
        % F.lit(HASH_MOD),
    )


# --------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing stage).
#
# Patterns are deliberately RE2-compatible (no lookaround, no
# backreferences) so the same literal pattern runs in Spark's Java
# regex engine and in the DuckDB oracle. Word-boundary \b is supported
# by both.
# --------------------------------------------------------------------------

PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 ()-]{6,}[0-9]"

# Redaction order matters: emails first (an address can contain
# digit runs a phone pattern would then mangle), then IPs (dotted
# digits would otherwise partially match the phone pattern), then
# phones. Detection counts use the same precedence on both engines.
PII_PATTERNS = (
    ("email", PII_EMAIL, "<EMAIL>"),
    ("ipv4", PII_IPV4, "<IP>"),
    ("phone", PII_PHONE, "<PHONE>"),
)


def pii_count_expr(col: Column | str, pattern: str) -> Column:
    """Number of matches of one PII pattern (codegen, scan-local)."""
    return F.regexp_count(_c(col), F.lit(pattern)).cast("long")


def redact_pii_expr(col: Column | str) -> Column:
    """Replace every PII match with its placeholder tag, applying the
    patterns in ``PII_PATTERNS`` precedence order."""
    out = _c(col)
    for _, pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out
