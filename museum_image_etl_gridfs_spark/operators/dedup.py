"""Deduplication operators.

Reference semantics (the one real query in the reference):
``src/transform_load.py:47-70`` groups ``artwork_metadata`` by
``object_id``, keeps groups with count > 1 (a MongoDB aggregation
pipeline), then deletes all but the first document of each group.
"Arrival order" there is nondeterministic; we pin keep-first with an
explicit ordering (SURVEY.md A3).

Scale notes:
- ``duplicate_groups`` / ``dedup_keep_first`` are single-shuffle hash
  aggregations / windows on the group key. At 100 TB the only risk is
  key skew, which AQE skew-join/partition-split handles; no
  driver-side materialization anywhere (the reference's
  ``list(coll.aggregate(...))`` pulls all duplicate groups into the
  client — we never do).
- MinHash/SimHash near-dup live here too: shingle -> sketch ->
  band -> self-join on (band, signature) buckets. The band self-join
  is the classic LSH trick that turns O(n^2) pair comparison into a
  bucket-local join — the only scalable shape at 100 TB.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..partitioning import spread


def duplicate_groups(
    df: DataFrame, keys: Sequence[str], min_count: int = 2
) -> DataFrame:
    """Groups appearing more than once: key cols + ``dup_count``.

    Spark form of the reference's $group/$match pipeline
    (``src/transform_load.py:48-50``): partial (map-side) + final hash
    aggregate, then a HAVING filter — one shuffle on the keys.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") >= min_count)
    )


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep exactly one row per key group: the first under ``order_by``.

    Deterministic version of the reference's ``docs_list[0]`` keep /
    ``[1:]`` delete (``src/transform_load.py:57-70``) — the reference
    keeps arbitrary arrival order; we order explicitly (include a
    unique tiebreaker in ``order_by`` for full determinism).
    One shuffle; executed as a window row_number + filter, which AQE
    can skew-split. Equivalent to a left-anti of losers (S9/W1).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal on ``columns`` (default: all).

    Hash-groupBy dedup — Spark plans ``dropDuplicates`` as a partial
    + final aggregate, so most duplicate elimination happens map-side
    before the shuffle.
    """
    return df.dropDuplicates(list(columns) if columns else None)


# ---------------------------------------------------------------------------
# Near-duplicate detection (training-data pipeline extensions)
# ---------------------------------------------------------------------------

# Mersenne prime 2^31-1: keeps a*h + b < 2^62, inside int64 even with
# ANSI overflow checking (Spark 4 default).
_MERSENNE = (1 << 31) - 1


def _rand_coeffs(n: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for universal hashing, via a simple
    LCG so results are reproducible without numpy on executors."""
    coeffs = []
    state = seed & 0x7FFFFFFF or 1
    for _ in range(n):
        state = (1103515245 * state + 12345) % (1 << 31)
        a = state | 1  # odd, nonzero
        state = (1103515245 * state + 12345) % (1 << 31)
        b = state
        coeffs.append((a, b))
    return coeffs


def shingles(text_col, k: int = 3) -> "F.Column":
    """Word k-shingle set of normalized text, as array<string>.

    Whitespace-split lowercase tokens, sliding window of k words
    (Broder '97 used word shingles). Word shingles keep the set size
    ~n_tokens (vs ~n_chars for char shingles), which matters because
    higher-order array expressions are interpreted, not codegen'd.
    """
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.coalesce(text_col, F.lit("")))), r"\s+", " "),
        " ",
    )
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
        )
    )


def shingle_hashes(shingle_col) -> "F.Column":
    """xxhash64 of each shingle, reduced mod the Mersenne prime.

    Materialize this ONCE as its own column before fanning out to the
    per-permutation mins — otherwise each of the ``num_hashes``
    expressions re-hashes every shingle (a 64× blowup that Catalyst's
    CollapseProject is prevented from reintroducing because the
    reference is non-cheap).
    """
    return F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))


def minhash_signature(hash_col, num_hashes: int = 64, seed: int = 42) -> "F.Column":
    """MinHash signature array<long> over pre-hashed shingles.

    sig_i = min over shingles of (a_i * h + b_i) mod p — cheap affine
    passes over an already-hashed long array; a*h+b stays < 2^62 so
    ANSI int64 arithmetic cannot overflow.
    """
    coeffs = _rand_coeffs(num_hashes, seed)

    def affine(a: int, b: int):
        # factory so the Column lambda keeps a 1-arg signature
        # (PySpark maps lambda arity onto HOF arity)
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE)

    return F.array(
        *[F.array_min(F.transform(hash_col, affine(a, b))) for a, b in coeffs]
    )


def _minhash_band_rows(
    id_field, k: int, num_hashes: int, bands: int, seed: int
):
    """mapInPandas worker: (id, text) batches -> one row per (doc,
    band): (id, sig array<long>, band, band_hash).

    Vectorized numpy per document: shingle the token list, crc32 each
    shingle (deterministic across workers/runs, unlike PYTHONHASHSEED
    hashing), then all ``num_hashes`` affine mins in ONE numpy
    broadcast — a ~50-100x constant-factor win over evaluating the
    same arithmetic as interpreted Catalyst higher-order functions,
    and with none of their janino codegen cost on first run.
    """
    import zlib

    import numpy as np
    import pandas as pd

    coeffs = _rand_coeffs(num_hashes, seed)
    a = np.array([c[0] for c in coeffs], dtype=np.uint64)[:, None]
    b = np.array([c[1] for c in coeffs], dtype=np.uint64)[:, None]
    p = np.uint64(_MERSENNE)
    rpb = num_hashes // bands

    def fn(batches):
        for pdf in batches:
            ids, sigs, band_ids, band_hashes = [], [], [], []
            for doc_id, text in zip(pdf["id"], pdf["text"]):
                toks = (text or "").lower().split()
                if len(toks) < k:
                    sh = {" ".join(toks)}
                else:
                    sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                h = np.fromiter(
                    (zlib.crc32(s.encode("utf-8")) for s in sh),
                    dtype=np.uint64,
                    count=len(sh),
                )
                # a*h+b < 2^62: exact in uint64, no overflow wrap
                sig = ((a * h[None, :] + b) % p).min(axis=1).astype(np.int64)
                sig_list = sig.tolist()
                for band in range(bands):
                    ids.append(doc_id)
                    sigs.append(sig_list)
                    band_ids.append(band)
                    band_hashes.append(
                        zlib.crc32(sig[band * rpb : (band + 1) * rpb].tobytes())
                    )
            yield pd.DataFrame(
                {"id": ids, "sig": sigs, "band": band_ids, "band_hash": band_hashes}
            )

    schema = (
        f"id {id_field.dataType.simpleString()}, sig array<long>, "
        "band int, band_hash long"
    )
    return fn, schema


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    min_jaccard: float = 0.5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Pipeline: shingle -> signature -> band hashes (one Arrow-batched
    mapInPandas stage, see :func:`_minhash_band_rows`) -> groupBy the
    band bucket -> bucket-local pair generation -> Jaccard estimate
    from full signatures -> filter. Returns (id_a, id_b, jaccard_est)
    with id_a < id_b.

    Scale: the only shuffles are an up-front spread of the input and
    the bucket groupBy; candidate pairs are band-local so cost tracks
    true-duplicate density, not n^2.

    Sketching is CPU-bound, not IO-bound: parallelism must track
    cores, not input bytes. A small input (one parquet row group)
    would otherwise run the whole sketch on a single core — and AQE
    won't help, since it coalesces by byte size. ``spread`` adds the
    exchange ONLY in that under-split case; at 100 TB the scan's own
    splits provide the parallelism and no shuffle of (id, text) is
    emitted at all.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")

    src = spread(df, id_col, target=num_partitions).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    fn, schema = _minhash_band_rows(
        src.schema["id"], k, num_hashes, bands, seed
    )
    banded = src.mapInPandas(fn, schema)

    # Bucket-local pair generation: one groupBy instead of a self-join,
    # so the signature stage above is evaluated ONCE (a self-join
    # would recompute it for each side). Only buckets with >1 member
    # survive the filter — a tiny fraction of rows — so the pairwise
    # expansion runs over candidate-dense data only.
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.collect_list(F.struct("id", "sig")).alias("ms"))
        .filter(F.size("ms") > 1)
    )

    id_type = banded.schema["id"].dataType.simpleString()

    def pair_fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            id_a, id_b, est = [], [], []
            for ms in pdf["ms"]:
                members = sorted(ms, key=lambda m: m["id"])
                sig_mat = np.array([np.asarray(m["sig"]) for m in members])
                for i in range(len(members)):
                    eq = (sig_mat[i + 1 :] == sig_mat[i]).mean(axis=1)
                    for j, e in enumerate(eq, start=i + 1):
                        if e >= min_jaccard:
                            id_a.append(members[i]["id"])
                            id_b.append(members[j]["id"])
                            est.append(float(e))
            yield pd.DataFrame({"id_a": id_a, "id_b": id_b, "jaccard_est": est})

    pairs = buckets.mapInPandas(
        pair_fn, f"id_a {id_type}, id_b {id_type}, jaccard_est double"
    )
    return pairs.dropDuplicates(["id_a", "id_b"])


def simhash(text_col, bits: int = 64) -> "F.Column":
    """64-bit SimHash of whitespace tokens (Charikar '02).

    Per-token xxhash64; for each bit position sum +1/-1 weighted by
    the bit, take the sign. All JVM-side expressions.
    """
    tokens = F.split(
        F.regexp_replace(F.lower(F.trim(F.coalesce(text_col, F.lit("")))), r"\s+", " "),
        " ",
    )
    hashes = F.transform(tokens, lambda tok: F.xxhash64(tok))

    def bit_contrib(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for i in range(bits):
        contrib = F.aggregate(hashes, F.lit(0), bit_contrib(i))
        bit_cols.append(
            F.when(contrib > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    total = bit_cols[0]
    for c in bit_cols[1:]:
        total = total + c
    return total


def hamming64(a, b) -> "F.Column":
    """Hamming distance between two int64 simhashes (bit_count of xor)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)) if isinstance(a, str) else a.bitwiseXOR(b))


def ngram_jaccard(a_tokens, b_tokens) -> "F.Column":
    """Exact Jaccard similarity of two token arrays."""
    inter = F.size(F.array_intersect(a_tokens, b_tokens))
    union = F.size(F.array_union(a_tokens, b_tokens))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
