"""Remaining training-data-pipeline operators from the north star:
embedding-cosine near-dup pairs, BPE-ish regex tokenization, and
rolling-hash document fingerprints — each exact-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import quality as _WQ
from ..partitioning import spread
from .registry import query

_COS_THRESHOLD = 0.4

#: word-ish / number / single-symbol pieces — the shape of a BPE
#: pre-tokenizer's coarse split (identical regex both engines)
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_ROLL_P = 2147483647  # 2^31-1: h*31+c stays < 2^36, exact in int64


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {_COS_THRESHOLD}
    """,
    tags=("dedup", "similarity", "extension"),
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the exact-verification
    stage of embedding dedup (brute-force here as the correctness
    baseline; the LSH-bucketed variant in queries_vector is the
    recall-oriented 100 TB path that would feed candidate pairs into
    exactly this scoring).

    Block-matrix execution (operators/ann.py::cosine_pairs_blocked):
    each hash block packs into one row, block pairs cross-join, and
    numpy does each block-pair as a single matmul — a vectorized
    ~50x constant factor over the naive pair join's interpreted dot
    products, with task memory bounded by the block size.
    """
    from ..operators.ann import cosine_pairs_blocked

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    return cosine_pairs_blocked(
        emb, threshold=_COS_THRESHOLD, round_to=4
    )


@query(
    "bpe_learn_merges", oracle=None, tags=("text", "tokenizer", "extension")
)
def bpe_learn_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the BPE merge TABLE from the corpus (Sennrich ACL'16 —
    the training half of the tokenizer story; ``bpe_token_stats`` is
    the application half). Word-count compression first (the ONLY
    corpus-wide pass), then each merge iteration runs over the
    vocab-sized (word, cnt, symbols) relation: weighted pair counts
    via one map-side-combined groupBy, argmax with a total tie-break,
    Arrow-batched re-segmentation. Deterministic (no RNG) —
    golden-pinned; hand-computed merge sequences in
    tests/test_bpe.py. Returns (step, left, right, weighted_count).
    """
    from ..operators.bpe import learn_bpe_merges

    docs = load(spark, "documents", sf_dir)
    merges = learn_bpe_merges(docs, n_merges=8)
    return spark.createDataFrame(
        merges or [],
        "step int, left string, right string, weighted_count long",
    )


@query(
    "bpe_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(coalesce(text,''), '{_BPE_RE}')) AS INTEGER)
               AS n_bpe_pieces,
           CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INTEGER)
               AS n_ws_tokens
    FROM documents
    """,
    tags=("text", "tokenize", "extension"),
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish regex
    pieces (letter runs / digit runs / single symbols — a byte-pair
    pre-tokenizer's coarse segmentation). Both JVM regex expressions;
    the piece count upper-bounds real BPE token counts, which is the
    quantity data-mixing pipelines budget on."""
    from ..functions.text import token_count

    docs = load(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.coalesce(F.col("text"), F.lit("")),
                                    F.lit(_BPE_RE), 0)).alias("n_bpe_pieces"),
        token_count("text").alias("n_ws_tokens"),
    )


@query(
    "rolling_fingerprints",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(7::BIGINT,
                   list_transform(
                       regexp_split_to_array(
                           regexp_replace(lower(trim(coalesce(text,''))),
                                          '\\s+', ' ', 'g'), ''),
                       x -> unicode(x)::BIGINT)),
               (h, c) -> (h * 31 + c) % {_ROLL_P}) AS fp
    FROM documents
    """,
    tags=("text", "fingerprint", "extension"),
)
def rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint (h = h*31 + c mod 2³¹-1)
    over normalized text — the incremental-hash primitive behind
    shingling/Rabin-Karp, computed as a JVM fold (F.aggregate) with
    arithmetic identical to the DuckDB oracle's list_reduce."""
    docs = load(spark, "documents", sf_dir)
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+", " "
    )
    chars = F.split(norm, "")
    fp = F.aggregate(
        chars,
        F.lit(7).cast("long"),
        lambda h, c: (h * 31 + F.ascii(c)) % F.lit(_ROLL_P),
    )
    return spread(docs, "doc_id").select("doc_id", fp.alias("fp"))


#: DuckDB mirror of operators/shards.py::shard_key for doc_id, salt v1:
#: first-8-hex md5 of 'doc_id:v1' folded to a BIGINT by hex digits.
_SQL_SHARD_POS = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(regexp_split_to_array("
    "substr(md5(CAST(doc_id AS VARCHAR) || ':v1'), 1, 8), ''), "
    "c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), "
    "(h, c) -> h * 16 + c)"
)


@query(
    "training_shards",
    oracle=f"""
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(shard_pos) AS first_pos,
           MAX(shard_pos) AS last_pos,
           CAST(SUM(n_chars) AS BIGINT) AS shard_chars
    FROM (
        SELECT CAST({_SQL_SHARD_POS} % 16 AS INTEGER) AS shard,
               {_SQL_SHARD_POS} AS shard_pos,
               n_chars
        FROM documents
    )
    GROUP BY shard
    """,
    tags=("traindata", "layout", "extension"),
)
def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-shard training layout over ``documents`` —
    per-shard row counts, hash-position range, and payload size.
    The shard/position assignment (operators/shards.py) is a narrow
    md5 projection: reproducible across engines (this oracle
    recomputes it in DuckDB digit-by-digit), uniform across shards,
    and free of any global sort. See write_training_shards for the
    clustered partitioned write."""
    from ..operators.shards import assign_shards

    docs = load(spark, "documents", sf_dir)
    return (
        assign_shards(docs, "doc_id", 16, salt="v1")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("shard_pos").alias("first_pos"),
            F.max("shard_pos").alias("last_pos"),
            F.sum("n_chars").alias("shard_chars"),
        )
    )


#: lowercased whitespace word array (canonical mirror of
#: functions/quality.words — single shared constant)
_SQL_WORDS_CURATE = _WQ.WORDS_SQL_LOWER


@query(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, text,
               len({_SQL_WORDS_CURATE}) AS n_words,
               length(regexp_replace(trim(coalesce(text, '')), '\\s+', '', 'g'))
                   AS solid
        FROM documents),
    q AS (
        SELECT * FROM w
        WHERE n_words >= 10
          AND solid * 1.0 / n_words BETWEEN 3 AND 12),
    d AS (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM q),
    k AS (SELECT * FROM d WHERE rn = 1),
    s AS (
        SELECT doc_id, n_words,
               CASE WHEN CAST((((((doc_id) + 42) * 2654435761) % 4294967296 + 4294967296) % 4294967296) % 100 AS INTEGER) < 64 THEN 'train' WHEN CAST((((((doc_id) + 42) * 2654435761) % 4294967296 + 4294967296) % 4294967296) % 100 AS INTEGER) < 80 THEN 'validation' ELSE 'test' END AS split,
               CAST(list_reduce(list_prepend(0::BIGINT, list_transform(regexp_split_to_array(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''), c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), (h, c) -> h * 16 + c) % 1000 AS INTEGER) % 20 AS shard
        FROM k)
    SELECT split, shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words
    FROM s GROUP BY split, shard
    """,
    tags=("traindata", "pipeline", "flagship", "extension"),
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation as ONE composed lazy plan — the
    full training-data path a user of this engine runs nightly:

    1. quality gate: 10 <= n_words, mean solid-char word length in
       [3, 12] (C4-style degenerate-text cut);
    2. exact dedup: keep-first by md5(text) group (doc_id order);
    3. reproducible 64/16/20 split (portable md5 bucket of doc_id);
    4. shard assignment within split (md5 bucket % 20);
    5. rollup: docs + token mass per (split, shard).

    Every stage reuses a verified operator (``Q.words``/quality
    fragments, ``dedup_keep_first``, ``assign_split``,
    ``Q.hash_bucket``) and the whole chain still optimizes as one
    DAG: scan-side projection/filter, ONE dedup window shuffle, then
    a 60-group aggregate. The oracle replays the identical pipeline
    in SQL from the shared mirrors.
    """
    from ..functions import quality as Q
    from ..operators.dedup import dedup_keep_first
    from ..operators.split import assign_split

    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    w = Q.words(F.lower(F.col("text")))
    solid = F.length(
        F.regexp_replace(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+", "")
    )
    q = (
        docs.withColumn("n_words", F.size(w))
        .withColumn("mean_wlen", solid / F.col("n_words"))
        .filter(
            (F.col("n_words") >= 10)
            & F.col("mean_wlen").between(3, 12)
        )
    )
    deduped = dedup_keep_first(
        q.withColumn("fp", F.md5("text")), ["fp"], ["doc_id"]
    )
    assigned = assign_split(deduped, "doc_id").withColumn(
        "shard", Q.hash_bucket("doc_id", 1000) % 20
    )
    return (
        assigned.groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
        )
    )


#: DuckDB mirror of operators/sampling.py::wrs_key for doc_id, salt
#: v1: fold the first 8 md5 hex digits of 'doc_id:wrs:v1' to a BIGINT
#: (≡ Spark conv(...,16,10)), shift into (0,1), ln, divide by weight.
_SQL_WRS_U32 = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(regexp_split_to_array("
    "substr(md5(CAST(doc_id AS VARCHAR) || ':wrs:v1'), 1, 8), ''), "
    "c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), "
    "(h, c) -> h * 16 + c)"
)


@query(
    "weighted_sample_by_source",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ln(({_SQL_WRS_U32} + 0.5) / 4294967296.0)
                   / CAST(n_chars + 1 AS DOUBLE) AS k
        FROM documents
        -- mirror of the engine's non-positive-weight EXCLUSION
        -- (operators/sampling.py: rows with w <= 0 are ineligible,
        -- never reservoir filler); vacuous here since n_chars >= 0
        WHERE n_chars + 1 > 0
    ),
    ranked AS (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY k DESC, doc_id
               ) AS INTEGER) AS wrs_rank
        FROM keyed
    )
    SELECT doc_id, source, n_chars, wrs_rank
    FROM ranked WHERE wrs_rank <= 5
    """,
    tags=("sampling", "extension"),
)
def weighted_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional reservoir sample, 5 docs per source,
    weighted by document length (n_chars + 1) — Efraimidis–Spirakis
    A-ES with a hash-derived uniform, so the sample is a pure
    function of the data: order-, partitioning-, and seed-free
    (operators/sampling.py)."""
    from ..operators.sampling import weighted_reservoir_sample

    docs = load(spark, "documents", sf_dir)
    return weighted_reservoir_sample(
        docs.select("doc_id", "source", "n_chars"),
        id_col="doc_id",
        group_col="source",
        weight=F.col("n_chars") + F.lit(1),
        n=5,
    )
