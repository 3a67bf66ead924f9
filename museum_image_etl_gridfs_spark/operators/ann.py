"""IVF-style approximate nearest neighbor (scale path for similarity
search, alongside the LSH-bucketed variant in queries_vector).

Classic inverted-file ANN: partition the corpus into Voronoi cells
around K centroids, then search only the ``n_probe`` cells nearest
the query. Recall/cost trades on n_probe; brute force is the
n_probe=K degenerate case.

Spark-first shape:
- centroids are a deterministic sample (first K by id — the fixture
  embeddings are i.i.d., so this is as good as kmeans++ seeding for
  cell balance and keeps the operator fully deterministic/testable;
  swap in MLlib KMeans fits for production skew);
- cell assignment is a broadcast-nested-loop min over K centroids —
  corpus never shuffles to assign;
- a query probes its n_probe nearest cells; scoring happens only
  inside probed cells (a broadcast semi-filter + the same JVM cosine
  as the brute-force baseline).

At 100 TB: the corpus is written PARTITIONED BY cell (partition
pruning turns a probe into reading n_probe/K of the data); here the
cell filter plays that role in-plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..partitioning import spread
from .topk import grouped_topk


def _np_id_dtype(spark_type: str) -> str:
    """numpy dtype for an EMPTY id column matching a Spark type.

    The per-batch empty sentinel frames must carry the dataset's
    actual id dtype — hardcoding int64 against a string id schema is
    a silent Arrow type mismatch waiting on a serializer change.
    """
    return {
        "bigint": "int64",
        "int": "int32",
        "smallint": "int16",
        "tinyint": "int8",
        "double": "float64",
        "float": "float32",
    }.get(spark_type, "object")


def _blocks_for(n_rows: int, target_rows: int, *, floor: int) -> int:
    """Block count so blocks stay ≈ ``target_rows`` rows — the
    derive-from-measured-input rule shared by the blocked pair
    kernels (a count tuned at one SF is a memory cliff at the next:
    the quadratic per-cell matrices scale with (rows/blocks)²)."""
    return max(floor, -(-n_rows // max(target_rows, 1)))


def _sub_blocks_for(
    max_rows: int, n_keys: int, parallelism: int, target_rows: int
) -> int:
    """Sub-block count for :func:`jaccard_pairs_blocked`: the memory
    ceiling (≈ ``target_rows`` rows per sub-block) joined with a
    parallelism floor (≈ 4 cells per core across all blocking keys:
    n_keys·subs²/2 ≥ 4·parallelism ⇒ subs ≥ √(8·para/n_keys))."""
    mem = _blocks_for(max_rows, target_rows, floor=2)
    par = math.ceil(math.sqrt(8 * max(parallelism, 1) / max(n_keys, 1)))
    return max(mem, min(par, max(max_rows, 1)))


def assign_cells(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Return (centroids, corpus-with-cell).

    Centroids: the K lowest-id vectors. Cell = argmax cosine to a
    centroid, computed via a broadcast join + per-row window min —
    the corpus is touched once, no shuffle for assignment itself.
    """
    centroids = (
        emb.orderBy(id_col)
        .limit(k_cells)
        .select(
            F.col(id_col).alias("cell_id"), F.col(vec_col).alias("centroid")
        )
    )
    scored = (
        spread(emb, id_col)
        .join(F.broadcast(centroids))
        .select(
            id_col,
            vec_col,
            "cell_id",
            cosine(F.col(vec_col), F.col("centroid")).alias("__sim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cell_id"))
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "cell_id")
    )
    return centroids, assigned


def cosine_pairs_blocked(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    n_blocks: int | None = None,
    round_to: int = 4,
    target_block_rows: int = 4096,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via block-matrix products.

    The naive pair join evaluates O(n²) interpreted dot products; this
    packs each of ``n_blocks`` hash blocks into ONE row (ids + L2-
    normalized matrix), cross-joins the upper-triangular block pairs
    (n_blocks·(n_blocks+1)/2 rows), and lets numpy do each block-pair
    as a single matmul. No driver collect; memory per task =
    2 · (n/n_blocks) · dim doubles for the operands PLUS the
    (n/n_blocks)² sim matrix — the sim matrix is the term that grows
    QUADRATICALLY with block size, so ``n_blocks`` must scale with
    the corpus. By default it is DERIVED from a count so blocks stay
    ≈ ``target_block_rows`` rows (sim ≈ 134 MB at the 4096 default):
    a fixed block count that was fine at one SF turns into multi-GB
    per-task matrices at 3× (measured 417 s at sf3 with the old
    fixed 8; the count is one cheap column-pruned job at build time —
    the same build-time-measurement precedent as the simjoin's
    occurrence-derived partition count). Callers that must stay LAZY
    at plan-construction time (explain-only plan audits) pass
    ``n_blocks`` explicitly — that parameter IS the
    precomputed-count path and skips the build-time job. Total work stays O(n²), as
    all-pairs must; the win is a vectorized constant factor and
    BOUNDED task memory.

    Returns (id_a, id_b, cos_sim) with id_a < id_b. ``threshold``
    must be > 0: diagonal cells keep each unordered pair once by
    ZEROING the id_a ≥ id_b entries (an id-based mask — order-
    independent across the self-join's two collect_list branches), so
    a non-positive threshold would re-admit the zeroed entries (and
    an all-pairs run at threshold ≤ 0 is the full quadratic output
    anyway).
    """
    if threshold <= 0:
        raise ValueError("cosine_pairs_blocked: threshold must be > 0")
    if n_blocks is None:
        n_rows = emb.select(id_col).count()
        n_blocks = _blocks_for(n_rows, target_block_rows, floor=8)
    blocked = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    packed = blocked.groupBy("blk").agg(
        F.collect_list(F.struct("id", "v")).alias("ms")
    )
    # Round-robin the O(blocks²) pair rows across cores: the join's
    # output inherits hash-partitioning on blk (n_blocks rows), so
    # without this the CPU-bound matmul stage runs ~n_blocks-wide on
    # any machine — the exact ceiling measured and fixed on
    # jaccard_pairs_blocked (8/32 cores busy, 40 s → 15 s solo sf1).
    para = emb.sparkSession.sparkContext.defaultParallelism
    pairs = (
        packed.alias("a")
        .join(packed.alias("b"), F.col("a.blk") <= F.col("b.blk"))
        .select(
            F.col("a.blk").alias("blk_a"),
            F.col("b.blk").alias("blk_b"),
            F.col("a.ms").alias("ms_a"),
            F.col("b.ms").alias("ms_b"),
        )
        .repartition(max(para, n_blocks))
    )

    id_type = blocked.schema["id"].dataType.simpleString()
    score = _cosine_score_fn(threshold, round_to, _np_id_dtype(id_type))
    return pairs.mapInPandas(
        score, f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )


def _cosine_score_fn(threshold: float, round_to: int, id_np: str):
    """Batch kernel for :func:`cosine_pairs_blocked` (module-level so
    the diagonal id-mask is directly testable against PERMUTED packed
    lists — local-mode end-to-end runs can't exercise permutation)."""

    def score(batches):
        import numpy as np
        import pandas as pd

        def unpack(ms):
            ids = np.array([m["id"] for m in ms])
            mat = np.array([np.asarray(m["v"], dtype=np.float64) for m in ms])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            return ids, mat / norms

        for pdf in batches:
            for blk_a, blk_b, ms_a, ms_b in zip(
                pdf["blk_a"], pdf["blk_b"], pdf["ms_a"], pdf["ms_b"]
            ):
                ia, ma = unpack(ms_a)
                ib, mb = unpack(ms_b)
                sim = np.round(ma @ mb.T, round_to)
                if blk_a == blk_b and sim.size:
                    # diagonal cell: keep each unordered pair once by
                    # masking on the IDS (id_a < id_b), never on array
                    # INDEX (np.triu): the self-join's two branches
                    # each recompute the collect_list, whose element
                    # order is not guaranteed identical across
                    # executors/retries/AQE — an index triangle would
                    # silently drop or duplicate pairs when the lists
                    # are permuted relative to each other. The id mask
                    # is order-independent, so the output stays
                    # duplicate-free by construction (each id lives in
                    # exactly one block) without a dropDuplicates
                    # shuffle of the quadratic pair stream.
                    sim = np.where(ia[:, None] < ib[None, :], sim, 0.0)
                ai, bj = np.nonzero(sim >= threshold)
                if not ai.size:
                    continue
                # vectorized emit: a python per-pair append loop was
                # the sf3 wall (hundreds of millions of hits)
                xa, yb, sv = ia[ai], ib[bj], sim[ai, bj]
                keep = xa != yb
                xa, yb, sv = xa[keep], yb[keep], sv[keep]
                lo = np.where(xa < yb, xa, yb)
                hi = np.where(xa < yb, yb, xa)
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "cos_sim": sv.astype(np.float64)}
                )
            yield pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": []}
            ).astype({"id_a": id_np, "id_b": id_np, "cos_sim": "float64"})

    return score


def jaccard_pairs_blocked(
    docs: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    block_col: str | None = None,
    threshold: float = 0.5,
    n_sub_blocks: int | None = None,
    target_sub_rows: int = 2048,
) -> DataFrame:
    """All-pairs exact token-set Jaccard ≥ threshold, block-matrix
    style (same shape as :func:`cosine_pairs_blocked`).

    Each (block, sub-block) packs into one row; block-local sub-block
    pairs cross-join; per pair numpy builds incidence matrices over
    the pair's token vocabulary and gets ALL intersection counts from
    one integer matmul (|A∩B| = Ia @ Ib.T; |A∪B| = |a|+|b|-∩).
    ``block_col`` is the blocking key (e.g. source) — pairs across
    blocks are never considered, exactly like the blocked SQL join.
    ``threshold`` must be > 0 (diagonal cells zero their id_a ≥ id_b
    entries — see :func:`cosine_pairs_blocked`).

    ``n_sub_blocks`` is DERIVED by default from ONE measured
    aggregate (max blocking-group size + group count) under two
    constraints — the same rule :func:`cosine_pairs_blocked` adopted
    after its fixed block count turned into a 2.8 GB-per-task / 417 s
    cliff at sf3:

    - memory ceiling: sub-blocks stay ≈ ``target_sub_rows`` rows —
      the inter/union/jac matrices grow QUADRATICALLY with sub-block
      size (~20 B per pair entry across the three ⇒ ~84 MB bounded
      at the 2048 default), so any count tuned at one SF is a memory
      cliff at the next;
    - parallelism floor: enough (block, sub-pair) cells to give every
      core ~4, i.e. n_keys·subs²/2 ≳ 4·defaultParallelism — a
      memory-only derivation picked subs=2 at sf1 (60 cells / 32
      cores) and ran 35 s where subs=4 ran 4.5 s; packed-row
      replication grows linearly with subs, so the floor targets
      cells-per-core, not a fixed count.

    The derivation is one cheap column-pruned aggregate at build
    time; callers that must stay lazy (explain-only plan audits) pass
    ``n_sub_blocks`` explicitly — that parameter IS the
    precomputed-count path.
    """
    if threshold <= 0:
        raise ValueError("jaccard_pairs_blocked: threshold must be > 0")
    blk = F.col(block_col) if block_col else F.lit(0)
    if n_sub_blocks is None:
        mx, nk = (
            docs.select(blk.alias("__blk"))
            .groupBy("__blk")
            .count()
            .agg(F.max("count"), F.count(F.lit(1)))
            .first()
        )
        para = docs.sparkSession.sparkContext.defaultParallelism
        n_sub_blocks = _sub_blocks_for(
            mx or 0, nk or 1, para, target_sub_rows
        )
    packed = (
        docs.select(
            F.col(id_col).alias("id"),
            F.array_distinct(F.col(tokens_col)).alias("ts"),
            blk.alias("blk"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_sub_blocks)).alias("sub"),
        )
        .groupBy("blk", "sub")
        .agg(F.collect_list(F.struct("id", "ts")).alias("ms"))
    )
    # Round-robin the O(blocks × sub²) pair rows across cores: the
    # join's output inherits hash-partitioning on blk (a handful of
    # sources), so without this the CPU-bound matmul stage runs
    # |blocks|-wide on any machine (measured 8/32 cores busy, 40 s →
    # 17 s solo at sf1). The extra exchange moves the packed rows
    # once more — cheap next to the numpy stage it parallelizes.
    para = docs.sparkSession.sparkContext.defaultParallelism
    pairs = (
        packed.alias("a")
        .join(
            packed.alias("b"),
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.sub") <= F.col("b.sub")),
        )
        .select(
            (F.col("a.sub") == F.col("b.sub")).alias("diag"),
            F.col("a.ms").alias("ms_a"),
            F.col("b.ms").alias("ms_b"),
        )
        .repartition(max(para, n_sub_blocks))
    )

    id_type = docs.schema[id_col].dataType.simpleString()
    score = _jaccard_score_fn(threshold, _np_id_dtype(id_type))
    return pairs.mapInPandas(
        score, f"id_a {id_type}, id_b {id_type}, jaccard double"
    )


def _jaccard_score_fn(threshold: float, id_np: str):
    """Batch kernel for :func:`jaccard_pairs_blocked` (module-level so
    the diagonal id-mask is directly testable against PERMUTED packed
    lists — see :func:`_cosine_score_fn`)."""

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for diag, ms_a, ms_b in zip(pdf["diag"], pdf["ms_a"], pdf["ms_b"]):
                # Vectorized incidence build (r12, guide §4.2): the
                # token sets arrive ALREADY distinct (array_distinct
                # runs JVM-side in the packing projection), so the
                # per-doc Python set()s and the per-token vocab-dict
                # loop the first draft used were pure interpreter
                # overhead — one pd.factorize over the cell's
                # concatenated token stream plus one fancy-index
                # scatter replaces every Python-level token touch
                # (measured: the scoring stage's Python time dominated
                # the near_dup_components_exact run at sf0.1).
                toks_a = [np.asarray(m["ts"], dtype=object) for m in ms_a]
                toks_b = [np.asarray(m["ts"], dtype=object) for m in ms_b]
                na, nb = len(toks_a), len(toks_b)
                len_a = np.fromiter(
                    (t.size for t in toks_a), dtype=np.int64, count=na
                )
                len_b = np.fromiter(
                    (t.size for t in toks_b), dtype=np.int64, count=nb
                )
                total_a = int(len_a.sum())
                flat = (
                    np.concatenate(toks_a + toks_b)
                    if total_a + int(len_b.sum())
                    else np.empty(0, dtype=object)
                )
                codes, uniques = pd.factorize(flat)
                vsize = len(uniques)
                # a None/NaN token factorizes to code -1, and the
                # scatter below would silently write vocab column -1
                # (the LAST column), corrupting intersection counts —
                # fail loudly instead (ADVICE r12; array_distinct
                # upstream preserves a null element, so this is
                # reachable if a caller ever feeds null tokens)
                if codes.size and codes.min() < 0:
                    raise ValueError(
                        "jaccard kernel: null token in a packed token "
                        "set — filter nulls in the packing projection"
                    )
                # float32 incidence, NOT int32: numpy integer matmul
                # has no BLAS path (a naive triple loop — measured
                # 99.8 s vs 1.3 s on a 1500×1500×30k-vocab cell), while
                # the float product runs through BLAS. Exact by
                # construction: every partial sum is an integer ≤ the
                # larger set size, and float32 represents integers
                # exactly up to 2^24 (float64 guard above that).
                fdt = (
                    np.float32
                    if max(len_a.max(initial=0), len_b.max(initial=0)) < 2**24
                    else np.float64
                )
                ia = np.zeros((na, vsize), dtype=fdt)
                ib = np.zeros((nb, vsize), dtype=fdt)
                ia[np.repeat(np.arange(na), len_a), codes[:total_a]] = 1
                ib[np.repeat(np.arange(nb), len_b), codes[total_a:]] = 1
                inter = (ia @ ib.T).astype(np.int64)
                size_a = len_a[:, None]
                size_b = len_b[None, :]
                union = size_a + size_b - inter
                with np.errstate(divide="ignore", invalid="ignore"):
                    jac = np.where(union == 0, 0.0, inter / union)
                aid = np.array([m["id"] for m in ms_a])
                bid = np.array([m["id"] for m in ms_b])
                if diag and jac.size:
                    # a diagonal cell pairs a sub-block with ITSELF:
                    # keep each unordered pair exactly once by masking
                    # on the IDS (id_a < id_b), never on array INDEX
                    # (np.triu) — the self-join's two collect_list
                    # branches are recomputed independently and their
                    # element order is not guaranteed to match across
                    # executors/retries/AQE; an index triangle would
                    # silently drop or duplicate pairs under
                    # permutation. Id masking keeps the output
                    # duplicate-free BY CONSTRUCTION (every doc lives
                    # in exactly one (block, sub)) with no
                    # dropDuplicates — a full shuffle of the
                    # output-quadratic pair stream (10 GB at sf3).
                    jac = np.where(aid[:, None] < bid[None, :], jac, 0.0)
                xi, yj = np.nonzero(jac >= threshold)
                if not xi.size:
                    continue
                # vectorized emit (the per-pair python loop was the
                # sf3 wall: 400M list appends dominated the stage)
                xa, yb, jv = aid[xi], bid[yj], jac[xi, yj]
                keep = xa != yb
                xa, yb, jv = xa[keep], yb[keep], jv[keep]
                lo = np.where(xa < yb, xa, yb)
                hi = np.where(xa < yb, yb, xa)
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "jaccard": jv.astype(np.float64)}
                )
            yield pd.DataFrame(
                {"id_a": [], "id_b": [], "jaccard": []}
            ).astype({"id_a": id_np, "id_b": id_np, "jaccard": "float64"})

    return score


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    k_cells: int = 16,
    n_probe: int = 4,
    top_k: int = 5,
) -> DataFrame:
    """Approximate cosine top-k: probe the ``n_probe`` cells nearest
    each query, score only within them. Returns (qid, neighbor_id,
    score) — same shape as the brute-force baseline so recall is
    directly measurable (tests/test_ann.py).

    INPUT CONTRACT: ``queries`` must have UNIQUE ``qid_col`` rows
    (like the threshold>0 contract on the blocked kernels). The
    no-dedup candidate path below relies on it: duplicate qid rows
    would make the probe window emit the same cell more than once per
    qid, and the duplicated (qid, neighbor) candidates could occupy
    multiple top-k slots. Duplicate qids with DIFFERENT vectors are
    ambiguous anyway — no dedup here could pick the right one.
    """
    centroids, assigned = assign_cells(
        emb, id_col=id_col, vec_col=vec_col, k_cells=k_cells
    )

    q_cells = (
        queries.join(F.broadcast(centroids))
        .select(
            qid_col,
            qvec_col,
            "cell_id",
            cosine(F.col(qvec_col), F.col("centroid")).alias("__sim"),
        )
    )
    wq = Window.partitionBy(qid_col).orderBy(F.col("__sim").desc(), F.col("cell_id"))
    probes = (
        q_cells.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select(qid_col, qvec_col, "cell_id")
    )

    # Score only inside probed cells (the partition-pruning analog).
    # (qid, neighbor) pairs are distinct BY CONSTRUCTION — cell
    # assignment is argmin-unique per vector (row_number == 1 above)
    # and probes are distinct cells per query — so no dedup shuffle
    # of the candidate stream is needed.
    cand = assigned.join(
        F.broadcast(probes), on="cell_id"
    ).filter(F.col(id_col) != F.col(qid_col))
    scored = cand.select(
        qid_col,
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(qvec_col), F.col(vec_col)), 4).alias("score"),
    )
    # final rank via the two-phase partial top-k merge: a per-qid
    # row_number window would funnel ~n_probe/K of the corpus through
    # one task per query at scale — the shape grouped_topk exists to
    # kill (same routing as cosine_topk / l2_nearest).
    return grouped_topk(
        scored, [qid_col], [("score", False), ("neighbor_id", True)], top_k
    )
