"""Byte-Pair Encoding merge LEARNING (Sennrich et al., ACL 2016).

The tokenizer-training half of the BPE story (``bpe_token_stats``
already covers application-side token counting with a fixed regex):
learn the merge table itself from the corpus. The industrial-scale
shape — what HuggingFace ``tokenizers`` and SentencePiece do — is
WORD-COUNT COMPRESSION: the corpus collapses to a (word, count)
relation ONCE (one distributed groupBy with map-side combine; ~
millions of rows at 100 TB, not trillions), and every Lloyd-like
merge iteration then runs over that small relation:

1. pair counts: explode each distinct word's current symbol
   segmentation into adjacent pairs, weight by word count, groupBy
   pair — map-side combined, output ≤ |vocab of pairs| rows;
2. winner: max weighted count, ties to the lexicographically first
   pair — one O(1)-row collect (orderBy count desc, pair; limit 1);
3. re-segment: apply (a, b) → ab to every word's symbol list — an
   Arrow-batched pandas pass over the WORD table (vocab-sized, never
   the corpus).

Deterministic end to end (integer counts, total tie-break, no RNG):
reruns are bit-identical, so the merge table is golden-pinnable —
iterative argmax has no SQL oracle.

Scale: the corpus is touched exactly once (step 0's word count).
Every iteration's cost is bound by the distinct-word relation, which
grows sublinearly with corpus size (Heaps' law); driver state is one
(pair, count) row per iteration.

Reference parity: no text pipeline in the reference
(/root/reference/src/) — extension surface; the published algorithm
is the specification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread
from .lifecycle import release_df, tracked_local_checkpoint


def word_counts(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over lowercased whitespace tokens — the one
    corpus-wide pass; everything after runs on this relation."""
    from ..functions.quality import words

    return (
        docs.select(
            F.explode(words(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _apply_merge(left: str, right: str):
    """Arrow-batched re-segmentation: merge every adjacent (left,
    right) symbol pair, leftmost-first (the published greedy order)."""

    def run(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                merged, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    return run


def learn_bpe_merges(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    end_of_word: str = "</w>",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    [(step, left, right, weighted_count), ...] in merge order.

    Stops early when no pair occurs twice (weighted) — a merge that
    fires once buys nothing. The ``end_of_word`` sentinel follows the
    original formulation so merges cannot cross word boundaries and
    word-final units stay distinct from word-internal ones.
    """
    wc = word_counts(docs, text_col=text_col).withColumn(
        "syms",
        F.concat(
            # drop the empty fragments Spark's empty-pattern split
            # appends around the characters
            F.expr("filter(split(word, ''), x -> x <> '')"),
            F.array(F.lit(end_of_word)),
        ),
    )
    # materialize ONCE: recomputing word_counts each iteration would
    # rescan the corpus; the checkpoint is tracked so
    # lifecycle.release_checkpoints frees the blocks after the query
    wc = tracked_local_checkpoint(spread(wc, "word"), eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        pairs = (
            wc.select(
                "cnt",
                F.expr(
                    "zip_with(slice(syms, 1, greatest(size(syms)-1, 0)), "
                    "slice(syms, 2, greatest(size(syms)-1, 0)), "
                    "(a, b) -> struct(a AS l, b AS r))"
                ).alias("ps"),
            )
            .select("cnt", F.explode("ps").alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("wcnt"))
        )
        top = pairs.orderBy(
            F.col("wcnt").desc(), F.col("l"), F.col("r")
        ).first()
        if top is None or top["wcnt"] < 2:
            break
        left, right, cnt = top["l"], top["r"], int(top["wcnt"])
        merges.append((step, left, right, cnt))
        nxt = wc.mapInPandas(
            _apply_merge(left, right),
            "word string, cnt long, syms array<string>",
        )
        old = wc
        wc = tracked_local_checkpoint(spread(nxt, "word"), eager=True)
        release_df(old)  # free the previous iteration's blocks now
    return merges
