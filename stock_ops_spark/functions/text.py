"""Text-analysis column helpers for the documents table.

All JVM-side built-ins (split/regexp/transform/aggregate) — no Python UDFs
— so at 100 TB these run inside whole-stage codegen over the parquet scan.
These are extension operators beyond the reference surface (BASELINE.json
north star): token counting, quality scoring, language-ID, fingerprinting,
shingling for near-dup detection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword sets for the n-gram/stopword language
# heuristic.  Deliberately tiny and deterministic (public common words).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "des", "une", "que"),
    "es": ("el", "la", "los", "que", "es", "una", "por", "con"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty tokens removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_tokens(text: Column) -> Column:
    """BPE-ish word/punctuation tokenization: letter-digit runs OR single
    non-space punctuation — a deterministic approximation of subword
    tokenizer pre-splitting."""
    return F.filter(
        F.split(F.lower(text), r"([^\p{L}\p{N}]+)"), lambda t: t != F.lit("")
    )


def char_ngrams(text: Column, n: int = 8, pre_lowered: bool = False) -> Column:
    """All character n-gram shingles of lowercased text (array<string>).

    Built from ``sequence`` + ``transform`` + ``substring`` — pure Catalyst
    expressions, vectorizable, no UDF.

    PERF: pass an already-lowercased *projected column* with
    ``pre_lowered=True`` whenever possible — an inline ``lower(text)``
    lands inside the transform lambda and is re-evaluated once PER SHINGLE
    (≈ length(text) times per row).  A separate projection stays staged
    because the attribute is multi-referenced, so lower() runs once per row.
    """
    lowered = text if pre_lowered else F.lower(text)
    length = F.length(lowered)
    starts = F.sequence(F.lit(1), F.greatest(length - F.lit(n - 1), F.lit(1)))
    return F.when(length >= n, F.transform(starts, lambda i: F.substring(lowered, i, n))).otherwise(
        F.array(lowered)
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not letter/digit/space."""
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    toks = F.transform(tokens(text), F.lower)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Deterministic document-quality heuristic in [0, 1]: rewards moderate
    token length, penalizes punctuation soup and stopword-free strings."""
    tl = mean_token_len(text)
    len_ok = F.when((tl >= 2.5) & (tl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(text) * 2, F.lit(1.0))
    return F.round(len_ok * punct_pen, 6)


def lang_stopword_hits(toks: Column) -> dict[str, Column]:
    """Per-language stopword hit count (the language-ID signal).

    ``toks`` must be a lowercased token array — pass a *projected column*
    (e.g. ``lower_tokens(text)`` materialized via ``withColumn``) so the
    expensive split/lower runs once, not once per language; replicating the
    split per language quadruples the expression tree and codegen time.
    """

    def hit_counter(words: tuple[str, ...]):
        sw = F.array(*[F.lit(w) for w in words])
        # single-arg lambda: a two-arg lambda would bind (element, index)
        return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))

    return {lang: hit_counter(words) for lang, words in LANG_STOPWORDS.items()}


def lower_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens — shared input for language-ID."""
    return F.transform(tokens(text), F.lower)


def stopword_hits_regex(text: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens ∈ ``words`` via a single compiled regex scan.

    ~100× faster than the higher-order-function token filter (HOF lambdas
    are interpreted per element and trip whole-stage-codegen pathologies),
    and RE2-compatible for the DuckDB oracle: whitespace runs are doubled
    before matching ``' (w1|w2|…) '`` so adjacent stopwords don't share a
    separator (RE2 has no lookahead).  Verified equal to token-based
    counting on the test corpus.
    """
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(text), r"\s+", "  "), F.lit(" ")
    )
    alt = "|".join(words)
    return F.regexp_count(padded, F.lit(f" ({alt}) "))


def lang_guess_from_hits(en: Column, de: Column, fr: Column, es: Column) -> Column:
    """Argmax with ties to the earliest language in (en, de, fr, es);
    'und' when all hit counts are zero.

    Pass *projected columns* for the hit counts (via ``withColumn`` on the
    output of ``lang_stopword_hits``): inlining the count expressions into
    an iterative best/best_n CASE chain duplicates each subtree
    exponentially and blows up codegen.
    """
    m = F.greatest(en, de, fr, es)
    return (
        F.when(m == 0, F.lit("und"))
        .when(en == m, F.lit("en"))
        .when(de == m, F.lit("de"))
        .when(fr == m, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def normalized_text(text: Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint = md5 of normalized text (exact-dup key)."""
    return F.md5(normalized_text(text))


def fingerprint64(text: Column) -> Column:
    """64-bit rolling-hash-style fingerprint (xxhash64 of normalized text)."""
    return F.xxhash64(normalized_text(text))
