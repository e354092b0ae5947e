"""Text-analysis column functions for the training-data pipeline surface
(BASELINE.json north star): tokenization, shingling, quality metrics,
language-ID heuristics, fingerprinting.

Everything here is built-in higher-order functions (split / transform /
filter / aggregate) — JVM-side, codegen'd, no Python UDFs — so the same
expressions run unchanged over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic default stopword list for quality scoring / language-ID.
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents.text is single-spaced)."""
    return F.split(text, " ")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column, stopwords=STOPWORDS) -> Column:
    """Exact count of tokens that are stopwords (lambda filter, no UDF)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def word_shingles(token_array: Column, k: int = 3) -> Column:
    """All k-word shingles of a token array (order-preserving, with dups).

    ``transform(sequence(1, size-k+1), i -> concat_ws(' ', slice(w, i, k)))``
    — caller must guard size >= k (sequence() would descend otherwise).
    """
    return F.transform(
        F.sequence(F.lit(1), F.size(token_array) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(token_array, i, k)),
    )


def top_token_count(token_array: Column) -> Column:
    """Occurrence count of the most frequent token — the Gopher-style
    "most common word fraction" numerator, computed entirely inside the
    array (nested lambda count, no explode/shuffle). O(n²) per doc in
    token count; natural-language docs are short enough that this beats
    an explode + groupBy + max re-join, which would shuffle the corpus
    twice. For book-length documents switch to the exploded form.
    """
    return F.array_max(
        F.transform(token_array, lambda t: F.size(F.filter(token_array, lambda x: x == t)))
    )


def dup_ngram_fraction(token_array: Column, n: int) -> Column:
    """Fraction of n-gram positions occupied by a repeated n-gram
    (1 - distinct/total) — the repetition signal quality filters cut on
    (high value = boilerplate / degenerate text). Caller guards
    ``size(token_array) >= n``.
    """
    grams = word_shingles(token_array, n)
    return F.lit(1) - F.size(F.array_distinct(grams)) / F.size(grams)


def md5_fingerprint(text: Column) -> Column:
    """Exact document fingerprint (content hash)."""
    return F.md5(text)


def rolling_hash_fingerprint(token_array: Column, window: int = 4, mod: int = 1 << 31) -> Column:
    """Winnowing-style fingerprint: min polynomial rolling hash over
    ``window``-token shingles. Deterministic, engine-internal (no SQL
    oracle — DuckDB lacks the same hash), covered by unit tests.
    """
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(token_array) - (window - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(token_array, i, window)),
    )
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(mod)))
    return F.array_min(hashes)
