"""Data-quality / filtering column functions for training-data curation.

The published curation pipelines (C4, Gopher, RefinedWeb) filter web
text with cheap per-document heuristics: word-count bounds, mean word
length, alphabetic-word fraction, stopword presence, and repeated
n-gram fractions. All of them are expressible as pure JVM expressions
(split / higher-order array functions / regexp), so they run inside
whole-stage codegen with zero Python in the hot path and scale
linearly with executors — exactly what you want for a 100 TB
first-pass filter where the filter itself must be cheaper than the
data motion.

Every function here has an exact DuckDB rendering (list_transform /
list_filter / list_distinct mirror Spark's transform / filter /
array_distinct), so the oracle gate verifies semantics bit-for-bit.

Extensions beyond the reference (no text analysis there; see
SURVEY.md §2.8 — its only string work is filename interpolation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Gopher-style "must contain ≥2 of these" stopword list.
STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")


def words(text: Column | str) -> Column:
    """Whitespace-split word array; NULL/blank -> empty array."""
    t = F.trim(F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_ngrams(ws: Column, n: int) -> Column:
    """Space-joined word n-grams (order preserved, duplicates kept).

    1-based index arithmetic chosen to mirror DuckDB exactly:
    ``list_transform(range(1, len(w) - n + 2), i -> w[i] || ' ' || ...)``.
    Empty when the doc has fewer than ``n`` words (guarded — Spark's
    ``sequence(1, 0)`` would count DOWN, not produce an empty array).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    size = F.size(ws)

    def gram(i: Column) -> Column:
        parts = [F.element_at(ws, (i + j).cast("int")) for j in range(n)]
        return F.concat_ws(" ", *parts)

    return F.when(size < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), size - n + 1), gram)
    )


def dup_ngram_fraction(ws: Column, n: int) -> Column:
    """Fraction of word n-grams that are repeats of an earlier one:
    ``(total - distinct) / total``, 0.0 when no n-grams. The Gopher
    repetition filter (dup 2-gram / 3-gram char fraction, simplified
    to gram counts) — high values mean boilerplate or degenerate text.
    """
    grams = word_ngrams(ws, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        (total - distinct) / total.cast("double")
    )


def frac_alpha_words(ws: Column) -> Column:
    """Fraction of words containing at least one ASCII letter
    (C4 keeps only mostly-alphabetic text); 0.0 for empty docs."""
    total = F.size(ws)
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    return F.when(total <= 0, F.lit(0.0)).otherwise(alpha / total.cast("double"))


def stopword_hits(ws: Column, stops: tuple[str, ...] = STOPWORDS) -> Column:
    """How many DISTINCT stopwords from ``stops`` appear (Gopher's
    "contains at least 2 stop words" signal). Case-insensitive."""
    lowered = F.transform(ws, F.lower)
    return F.size(F.array_intersect(lowered, F.array(*[F.lit(s) for s in stops])))


#: Portable regexes — restricted to syntax with identical semantics in
#: Java regex (Spark) and RE2 (DuckDB): classes, bounded repeats, \b \d.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def hash_bucket(key: Column | str, buckets: int = 1000) -> Column:
    """Deterministic, engine-portable bucket in [0, buckets): first 8
    hex digits of md5(key) parsed as an integer, mod buckets.

    The primitive behind reproducible sampling/splits at 100 TB: no
    RNG state, no ordering dependence, stable under repartitioning,
    and any engine (DuckDB, Presto, pandas) can recompute it to audit
    which rows were kept. Complements operators/split.py (same idea,
    different field widths).
    """
    k = F.col(key) if isinstance(key, str) else key
    hex8 = F.substring(F.md5(k.cast("string")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % buckets).cast("int")


#: DuckDB mirror of :func:`words` over ``lower(text)`` — THE canonical
#: oracle rendering of the tokenizer. Every plans-module oracle must
#: use this single constant (importing it) rather than re-spelling the
#: CASE expression: a tokenizer change then propagates to every oracle
#: atomically instead of silently diverging per module.
WORDS_SQL_LOWER = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END"
)
