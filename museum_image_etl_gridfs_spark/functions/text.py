"""Text-analysis column functions for the training-data pipeline.

All pure JVM-side expressions (regexp / string builtins) — no Python
UDFs in the hot path, so they stay inside whole-stage codegen and
scale linearly with executors. Each has an exact ANSI-SQL rendering
so the DuckDB oracle can verify it.

Extensions beyond the reference (which does no text analysis; its
only string ops are f-string filename building, ``src/ingestion.py:65``):
language-ID heuristic, quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword marker sets for the n-gram/stopword
#: language heuristic. Chosen to be discriminative and regex-safe.
#: ASCII punctuation stripped from token EDGES before marker compare
#: (lang_guess) — identical char-set trim semantics in Spark btrim
#: and DuckDB trim(x, chars). Interior punctuation ("don't") stays.
PUNCT_CHARS = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "y"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(text: Column | str) -> Column:
    """Whitespace token count; empty/NULL -> 0."""
    t = F.trim(_col(text))
    return (
        F.when(t.isNull() | (t == ""), F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("int")
    )


def char_count(text: Column | str) -> Column:
    return F.coalesce(F.length(_col(text)), F.lit(0)).cast("int")


def punct_count(text: Column | str) -> Column:
    """Count of sentence punctuation [.!?,;:]."""
    t = F.coalesce(_col(text), F.lit(""))
    return F.length(t) - F.length(F.regexp_replace(t, r"[.!?,;:]", ""))


def digit_ratio(text: Column | str) -> Column:
    t = F.coalesce(_col(text), F.lit(""))
    n = F.length(t)
    digits = n - F.length(F.regexp_replace(t, r"[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(digits / n)


def uppercase_ratio(text: Column | str) -> Column:
    t = F.coalesce(_col(text), F.lit(""))
    n = F.length(t)
    uppers = n - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(uppers / n)


def mean_token_len(text: Column | str) -> Column:
    """Average token length = chars-without-spaces / tokens."""
    t = F.trim(F.coalesce(_col(text), F.lit("")))
    toks = token_count(t)
    solid = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.when(toks == 0, F.lit(0.0)).otherwise(solid / toks)


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0, 1].

    Rewards sentence punctuation density near ~1/20 chars and mean
    token length in [3, 12]; penalizes digit- and shouting-heavy text.
    Deliberately simple arithmetic so the oracle can replicate it.
    """
    t = F.coalesce(_col(text), F.lit(""))
    n = F.greatest(F.length(t), F.lit(1))
    punct_density = punct_count(t) / n
    mtl = mean_token_len(t)
    len_ok = F.when((mtl >= 3) & (mtl <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_density <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    digit_pen = digit_ratio(t)
    upper_pen = uppercase_ratio(t)
    raw = (
        F.lit(0.4) * len_ok
        + F.lit(0.3) * punct_ok
        - F.lit(0.2) * digit_pen
        - F.lit(0.1) * upper_pen
        + F.lit(0.3)
    )
    return F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))


def fingerprint(text: Column | str) -> Column:
    """Normalized content fingerprint: md5 over lowercase,
    whitespace-collapsed text. Identical hex output in DuckDB."""
    t = F.coalesce(_col(text), F.lit(""))
    normalized = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return F.md5(normalized)


def lang_guess(text: Column | str) -> Column:
    """Stopword-marker language heuristic over LANG_MARKERS.

    Scores each language by the count of whitespace TOKENS equal to
    one of its markers (case-insensitive) and returns the argmax,
    'und' (undetermined) on an all-zero tie. Ties between languages
    break by the dict order above (greatest() keeps the first max via
    strict > comparison).

    The text is tokenized ONCE (the canonical quality.words split);
    each language then counts marker-token equality over the shared
    array. The previous form ran a word-bounded regexp SPLIT of the
    full string per marker — 20 full-document regex scans + array
    materializations per row, measured at 13.7 s (lang_id) / ~15 s
    (lang_confusion_matrix) solo at sf1 vs ~2 s for this shape.
    Punctuation-glued markers ("the,", "(is") count via an ASCII
    punctuation btrim of each token before the marker compare
    (ADVICE r9 — bare token equality dropped them on punctuated
    prose); btrim(token, set) has identical semantics in DuckDB's
    trim(x, chars), so the oracle mirrors it exactly.
    """
    from .quality import words

    ws = words(F.lower(F.coalesce(_col(text), F.lit(""))))
    langs = list(LANG_MARKERS)

    # ONE tokenize + ONE btrim pass + ONE counting pass (r12): the
    # previous per-language F.filter shape referenced the ``ws``
    # expression from every score, and every score twice more
    # (greatest + the tie chain) — expression references re-evaluate
    # their whole subtree, so the split ran ~10× per row and each
    # filter walked the tokens again (the NOTES round-12 HOF lesson:
    # only lambda-bound variables are free). Here the trimmed token
    # array is the aggregate's INPUT (evaluated once), the per-token
    # step updates all language counters in one walk, and the argmax
    # runs inside the finish lambda where ``acc`` is a bound variable.
    # Tie semantics identical: array_max == greatest over the counts,
    # the when-chain keeps the earliest dict entry, all-zero → 'und'.
    zero = F.array(*[F.lit(0) for _ in langs])

    def step(acc: Column, w: Column) -> Column:
        return F.array(
            *[
                F.element_at(acc, i + 1)
                + F.when(w.isin(*LANG_MARKERS[lang]), 1).otherwise(0)
                for i, lang in enumerate(langs)
            ]
        )

    def finish(acc: Column) -> Column:
        best = F.array_max(acc)
        result = F.lit("und")
        # reversed so that earlier dict entries win ties
        for i in reversed(range(len(langs))):
            result = F.when(
                F.element_at(acc, i + 1) == best, F.lit(langs[i])
            ).otherwise(result)
        return F.when(best <= 0, F.lit("und")).otherwise(result)

    trimmed = F.transform(ws, lambda w: F.btrim(w, F.lit(PUNCT_CHARS)))
    return F.aggregate(trimmed, zero, step, finish)
