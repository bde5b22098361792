"""Top-k similarity search — the reference's core capability.

Reference: ``collection.query(query_texts=[q], n_results=5)``
(/root/reference/src/chroma.py:97-100) and ``index.query(vector=...,
top_k=5)`` (/root/reference/src/pineconeDB.py:127-131), one query at a
time over an HNSW index.

Spark-first design (exact path):
  - the query batch is SMALL (the reference uses ~500 queries); the
    corpus is BIG (100 TB target). So: broadcast the queries, keep the
    corpus partitioned in place — the join is a BroadcastNestedLoopJoin
    that streams corpus partitions once, no corpus shuffle.
  - cosine is a pure codegen expression (functions/vector.py).
  - per-query top-k = rank() window + filter; Spark >= 3.5 rewrites this
    into WindowGroupLimit, which applies a PARTIAL top-k inside each map
    task before the shuffle, so only ~k rows per query per partition
    move — the shuffle is O(queries * k * partitions), independent of
    corpus size.
  - ties break by id ascending so results are deterministic and match
    the SQL oracle.

The approximate/ANN path (LSH-bucketed) lives in operators/ann.py; this
exact operator is its correctness oracle, same relationship as
brute-force vs HNSW in the reference stores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import cosine_from_parts, cosine_sim, dot, l2_norm


def _col_norms(T):
    """L2 norms of the COLUMNS of a (d, n) transposed matrix, with the
    engine's dimension-sequential IEEE accumulation order."""
    import numpy as np

    sq = T[0] * T[0]
    for j in range(1, T.shape[0]):
        sq = sq + T[j] * T[j]
    return np.sqrt(sq)


def _sims_matrix(L, RT, rnorm):
    """(n_l, n_r) cosine matrix between row matrix ``L`` (n_l, d) and
    transposed matrix ``RT`` (d, n_r) with precomputed right norms.

    ONE home for the bit-identity invariant every vectorized kernel
    (blocked top-k, grid top-k, blocked pairs, grid pairs) and their
    SQL oracles share: dots and both squared norms accumulate
    dimension-sequentially (vectorized across pairs, sequential across
    dims — the exact IEEE-754 addition order of the unrolled JVM
    expression and DuckDB's list fold), and zero-norm denominators
    yield sim 0.0, matching functions/vector.cosine_sim."""
    import numpy as np

    d = RT.shape[0]
    dots = L[:, [0]] * RT[[0], :]
    for j in range(1, d):
        dots += L[:, [j]] * RT[[j], :]
    lsq = L[:, 0] * L[:, 0]
    for j in range(1, d):
        lsq = lsq + L[:, j] * L[:, j]
    denom = np.sqrt(lsq)[:, None] * rnorm[None, :]
    zeros = denom == 0.0
    return np.where(zeros, 0.0, dots / np.where(zeros, 1.0, denom))


def _topk_order(col, lids):
    """Candidate index order for the kernel-local top-k:
    (sim DESC, id ASC) with NaN treated as greatest (Spark's in-plan
    convention) — np.lexsort on the raw negated column would sort NaN
    LAST and silently drop such rows from the local candidate set.

    Honest scope note: a NaN sim (only possible from non-finite vector
    ELEMENTS — zero norms map to 0.0) cannot survive the Arrow
    boundary as NaN: pandas uses NaN as its null sentinel, so the
    emitted row reaches the final JVM window as sim NULL and ranks
    LAST there, while the all-JVM path ranks the same row FIRST
    (NaN-is-greatest). The bit-identity contract between the kernel
    and JVM paths therefore covers finite vector elements; non-finite
    elements are out of contract (quarantine-at-ingest), and this
    ordering merely guarantees the row is carried, never silently
    dropped."""
    import numpy as np

    key = np.where(np.isnan(col), np.inf, col)
    return np.lexsort((lids, -key))


def label_centroids(
    vectors: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean vector (class prototypes) in exploded form.

    The standard training-data diagnostic: class prototypes feed
    nearest-centroid baselines, outlier scoring (distance-to-own-
    centroid), and drift monitoring between corpus snapshots.

    Returns (label, dim, centroid, n_vectors) — one row per label per
    dimension. Exploded output is deliberate: a per-dimension DOUBLE
    column is hashable/portable across engines, whereas array columns
    make oracle comparison engine-specific.

    Plan: posexplode → groupBy(label, dim) avg — map-side partial, one
    shuffle keyed (label, dim) whose cardinality is |labels| x dim, so
    reducers never see skew even when one label dominates the corpus
    (the partial aggregate absorbs it). The avg is a shuffled float
    aggregate → rounded to 9 dp per the cross-engine policy.
    """
    ex = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "__x"),
    )
    return (
        ex.groupBy("label", "dim")
        .agg(
            F.round(F.avg(F.col("__x").cast("double")), 9).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


def similarity_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    filter_expr: Column | str | None = None,
    exclude_self: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k cosine search of ``queries`` against ``corpus``.

    Returns (query_id, rank, <corpus_id>, sim, dist) with 1-based rank,
    ordered by similarity desc, ties by corpus id asc.

    ``filter_expr`` is the metadata-filter surface the reference stores
    advertise but never use (SURVEY.md V6); applied pre-join so Catalyst
    pushes it into the corpus scan.

    ``exclude_self`` drops corpus rows whose id equals the query id
    (self-match suppression when queries are drawn from the corpus).

    ``dim`` (the embedding dimension, when known — it almost always is)
    switches the cosine to the statically-unrolled codegen form AND
    factors each side's L2 norm below the join, so norms are computed
    once per corpus row / once per query row instead of once per
    (query, corpus) pair — at 100 TB that's the difference between
    O(corpus) and O(corpus x queries) array passes.
    """
    from .util import spread

    c = corpus
    if filter_expr is not None:
        c = c.filter(filter_expr)
    # The scoring loop parallelizes over CORPUS partitions (the query
    # side is broadcast): a small corpus arriving as 1-2 parquet splits
    # would serialize O(|corpus| x |queries|) flops on as many cores.
    # No-op at scale, where the corpus already has >= parallelism splits.
    c = spread(c)

    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
    )

    if dim is not None:
        # Norms computed under the join (Project below Join survives
        # Catalyst — CollapseProject does not cross a Join boundary).
        c = c.select(
            F.col(corpus_id), l2_norm(corpus_vec, dim).alias("__cnorm"),
            F.col(corpus_vec),
        )
        q = q.select("__qid", "__qvec", l2_norm("__qvec", dim).alias("__qnorm"))

    joined = c.join(F.broadcast(q), how="cross")
    if exclude_self:
        joined = joined.filter(F.col(corpus_id) != F.col("__qid"))

    if dim is not None:
        sim = cosine_from_parts(
            dot("__qvec", corpus_vec, dim), F.col("__qnorm"), F.col("__cnorm")
        )
    else:
        sim = cosine_sim("__qvec", corpus_vec)
    scored = joined.select(
        F.col("__qid").alias("query_id"),
        F.col(corpus_id),
        sim.alias("sim"),
    )
    # Unscorable rows (NULL vectors -> null sim) never enter the
    # ranking — otherwise they'd fill trailing top-k slots. Zero-NORM
    # vectors are scorable by contract: cosine_sim maps them to 0.0
    # (identically in the SQL twin), so they legitimately outrank
    # negative-sim neighbors.
    scored = scored.filter(F.col("sim").isNotNull())

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            corpus_id,
            F.col("sim"),
            (F.lit(1.0) - F.col("sim")).alias("dist"),
        )
    )


def similarity_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    filter_expr: Column | str | None = None,
    exclude_self: bool = False,
    block_rows: int = 4096,
) -> DataFrame:
    """Exact top-k cosine search via an Arrow-batched vectorized kernel —
    the measured-fast form of :func:`similarity_topk`, bit-identical
    output for FINITE vector elements (same dot/norm IEEE addition
    order via the shared _sims_matrix kernel, same (sim desc, id asc)
    total order, and the same NULL-vector quarantine the JVM path's
    isNotNull sim filter gives). Non-finite elements are out of the
    bit-identity contract — see _topk_order for why NaN sims can't
    cross the Arrow boundary intact.

    Two-phase top-k, the same shape WindowGroupLimit gives the JVM path:
    each corpus partition emits its LOCAL top-k per query under the full
    (sim desc, id asc) order — any global top-k row is necessarily in
    its partition's local top-k — then one exact row_number window ranks
    the O(partitions x queries x k) candidates. The query batch is
    collected and broadcast (it is small by contract); corpus partitions
    stream once, no corpus shuffle.
    """
    import numpy as np

    from .util import spread

    spark = corpus.sparkSession
    # NULL query vectors can never score (the JVM path's null sim is
    # filtered before ranking, so such a query returns no rows there);
    # dropping them here gives the same result instead of a numpy
    # object-array TypeError.
    qrows = [
        r
        for r in queries.select(
            F.col(query_id).alias("id"), F.col(query_vec).alias("v")
        ).collect()
        if r.v is not None
    ]
    qids = np.array([r.id for r in qrows], dtype=np.int64)
    Q = np.array([r.v for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((qids, Q))

    c = corpus
    if filter_expr is not None:
        c = c.filter(filter_expr)

    def gen(batches):
        import pandas as pd

        qids_b, Q_b = bc.value
        QT = np.ascontiguousarray(Q_b.T)  # (d, nq)
        qnorm = _col_norms(QT)
        nq = len(qids_b)
        for pdf in batches:
            for s in range(0, len(pdf), block_rows):
                blk = pdf.iloc[s : s + block_rows]
                lids = blk["id"].to_numpy(dtype=np.int64)
                L = np.array(list(blk["v"]), dtype=np.float64)
                sims = _sims_matrix(L, QT, qnorm)
                out_q, out_id, out_sim = [], [], []
                for qi in range(nq):
                    col = sims[:, qi]
                    # full (sim desc, id asc) order so boundary ties keep
                    # the id-ascending winner, exactly like the window
                    order = _topk_order(col, lids)
                    if exclude_self:
                        order = order[lids[order] != qids_b[qi]]
                    top = order[:k]
                    out_q.append(np.full(len(top), qids_b[qi], dtype=np.int64))
                    out_id.append(lids[top])
                    out_sim.append(col[top])
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "cid": np.concatenate(out_id),
                        "sim": np.concatenate(out_sim),
                    }
                )

    # spread BEFORE the projection: if corpus_vec is a computed column
    # (e.g. an embedding expression), projecting first would evaluate it
    # on the unspread input's few partitions. NULL corpus vectors are
    # quarantined exactly like the JVM path's isNotNull sim filter.
    src = spread(c).select(
        F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("v")
    ).filter(F.col("v").isNotNull())
    cand = src.mapInPandas(gen, schema="query_id bigint, cid bigint, sim double")

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cid").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("cid").alias(corpus_id),
            F.col("sim"),
            (F.lit(1.0) - F.col("sim")).alias("dist"),
        )
    )


def pairwise_similarity(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float | None = None,
    upper_triangle: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """All-pairs cosine similarity (optionally thresholded).

    ``upper_triangle=True`` keeps only left_id < right_id — the standard
    near-duplicate-pair shape. The threshold filter sits directly on the
    join output so AQE can size the shuffle; for genuinely huge inputs
    use the LSH path in operators/ann.py instead of all-pairs.

    With ``dim`` set, each side's norm is computed once per row below
    the join (not once per pair) and the dot is statically unrolled —
    bit-identical results, ~3x less array math on the O(n^2) side.
    """
    l = left.select(F.col(left_id).alias("id_a"), F.col(vec_col).alias("vec_a"))
    r = right.select(F.col(right_id).alias("id_b"), F.col(vec_col).alias("vec_b"))
    if dim is not None:
        l = l.select("id_a", "vec_a", l2_norm("vec_a", dim).alias("norm_a"))
        r = r.select("id_b", "vec_b", l2_norm("vec_b", dim).alias("norm_b"))
        sim = cosine_from_parts(
            dot("vec_a", "vec_b", dim), F.col("norm_a"), F.col("norm_b")
        )
    else:
        sim = cosine_sim("vec_a", "vec_b")
    cond = F.col("id_a") < F.col("id_b") if upper_triangle else F.lit(True)
    # no_pushdown keeps the threshold out of the join condition, where
    # the whole cosine would be evaluated per pair on the interpreted
    # predicate path and re-evaluated for survivors (r09; measured on
    # the IVF self-join: 4.5 s -> 0.17 s). Value bit-identical.
    from .util import no_pushdown

    out = l.join(r, on=cond, how="inner").select(
        "id_a", "id_b", no_pushdown(sim).alias("sim")
    )
    if min_sim is not None:
        out = out.filter(F.col("sim") >= min_sim)
    return out


def pairwise_similarity_blocked(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float | None = None,
    upper_triangle: bool = True,
    block_rows: int = 1024,
) -> DataFrame:
    """All-pairs cosine via an Arrow-batched vectorized kernel — the
    measured-fast form of :func:`pairwise_similarity` (12x at sf0.1).

    Same semantics and BIT-IDENTICAL results: the kernel accumulates the
    dot product and norms dimension-by-dimension (vectorized across
    pairs, sequential across dims), which reproduces the exact IEEE-754
    addition order of the unrolled JVM expression and of DuckDB's
    list_dot_product — so this path keeps the full value-hash oracle.

    Plan shape: the right side is collected and broadcast (the same
    constraint the exact JVM path's BroadcastNestedLoopJoin has — the
    build side must fit in memory); left partitions stream through
    mapInPandas. For inputs where neither side fits, use the LSH or IVF
    paths — all-pairs is the wrong algorithm there regardless of kernel.
    """
    import numpy as np

    from .util import spread

    spark = left.sparkSession
    # NULL vectors are quarantined on both sides: the JVM path's null
    # sim fails every threshold anyway, and the numpy kernel would
    # otherwise TypeError on the object array.
    rrows = [
        r
        for r in right.select(
            F.col(right_id).alias("id"), F.col(vec_col).alias("v")
        ).collect()
        if r.v is not None
    ]
    rids = np.array([r.id for r in rrows], dtype=np.int64)
    R = np.array([r.v for r in rrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((rids, R))

    want_min = min_sim
    want_upper = upper_triangle

    def gen(batches):
        import pandas as pd

        rids_b, R_b = bc.value
        RT = np.ascontiguousarray(R_b.T)  # (d, m)
        rnorm = _col_norms(RT)
        for pdf in batches:
            n = len(pdf)
            for s in range(0, n, block_rows):
                blk = pdf.iloc[s : s + block_rows]
                lids = blk["id"].to_numpy(dtype=np.int64)
                L = np.array(list(blk["v"]), dtype=np.float64)  # (b, d)
                sims = _sims_matrix(L, RT, rnorm)
                mask = (
                    sims >= want_min
                    if want_min is not None
                    else np.ones(sims.shape, dtype=bool)
                )
                if want_upper:
                    mask &= lids[:, None] < rids_b[None, :]
                ia, ib = np.nonzero(mask)
                yield pd.DataFrame(
                    {"id_a": lids[ia], "id_b": rids_b[ib], "sim": sims[ia, ib]}
                )

    src = spread(left).select(
        F.col(left_id).alias("id"), F.col(vec_col).alias("v")
    ).filter(F.col("v").isNotNull())
    return src.mapInPandas(gen, schema="id_a bigint, id_b bigint, sim double")


def _grid_replicate(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    own_blocks: int,
    other_blocks: int,
    own_name: str,
    other_name: str,
    side: str,
) -> DataFrame:
    """Tag each row with its own hash-block and replicate it across all
    blocks of the OTHER side: row i of side L lands in every grid cell
    (block(i), *). One narrow explode — no driver round-trip. NULL
    vectors are quarantined here (both grid kernels would TypeError on
    a numpy object array; the JVM twin's null sims never pass a
    threshold or enter a ranking either)."""
    spark = df.sparkSession
    other = F.broadcast(
        spark.range(other_blocks).select(F.col("id").cast("int").alias(other_name))
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(own_blocks))
            .cast("int")
            .alias(own_name),
        )
        .filter(F.col("v").isNotNull())
        .join(other, how="cross")
        .withColumn("side", F.lit(side))
    )


def pairwise_similarity_grid(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float | None = None,
    upper_triangle: bool = True,
    blocks: int = 8,
) -> DataFrame:
    """All-pairs cosine via a GRID-BLOCKED shuffle — fully distributed:
    neither side is ever collected to the driver (the scale limit of
    :func:`pairwise_similarity_blocked`, whose build side must fit in
    one process). Both sides hash into ``blocks`` buckets; every
    (left-bucket, right-bucket) grid cell is one shuffle group scored by
    the same Arrow/numpy kernel with the same dimension-sequential
    accumulation order — so results stay BIT-IDENTICAL to the broadcast
    kernel, the JVM expression, and the DuckDB oracle.

    Communication: each side is replicated ``blocks`` times (O(n * B)
    shuffle for B^2-way parallelism) — the classic distributed
    all-pairs trade; pick B ~ sqrt(cluster cores), keep per-cell data
    (2 * n/B rows) inside executor memory. At 100 TB all-pairs is the
    wrong algorithm regardless — use the LSH/IVF candidate paths — but
    when an exact O(n^2) sweep is the job, this shape is the one that
    runs: per-cell work is embarrassingly parallel and the driver holds
    nothing.
    """
    import numpy as np

    lrep = _grid_replicate(
        left, left_id, vec_col,
        own_blocks=blocks, other_blocks=blocks,
        own_name="lb", other_name="rb", side="L",
    )
    rrep = _grid_replicate(
        right, right_id, vec_col,
        own_blocks=blocks, other_blocks=blocks,
        own_name="rb", other_name="lb", side="R",
    )
    both = lrep.select("lb", "rb", "side", "id", "v").unionByName(
        rrep.select("lb", "rb", "side", "id", "v")
    )

    want_min = min_sim
    want_upper = upper_triangle

    def cell(pdf):
        import pandas as pd

        lmask = pdf["side"].to_numpy() == "L"
        lpdf, rpdf = pdf[lmask], pdf[~lmask]
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame(
                {"id_a": np.array([], dtype=np.int64),
                 "id_b": np.array([], dtype=np.int64),
                 "sim": np.array([], dtype=np.float64)}
            )
        rids = rpdf["id"].to_numpy(dtype=np.int64)
        R = np.array(list(rpdf["v"]), dtype=np.float64)
        RT = np.ascontiguousarray(R.T)
        rnorm = _col_norms(RT)
        lids = lpdf["id"].to_numpy(dtype=np.int64)
        L = np.array(list(lpdf["v"]), dtype=np.float64)
        sims = _sims_matrix(L, RT, rnorm)
        mask = (
            sims >= want_min
            if want_min is not None
            else np.ones(sims.shape, dtype=bool)
        )
        if want_upper:
            mask &= lids[:, None] < rids[None, :]
        ia, ib = np.nonzero(mask)
        return pd.DataFrame(
            {"id_a": lids[ia], "id_b": rids[ib], "sim": sims[ia, ib]}
        )

    return both.groupBy("lb", "rb").applyInPandas(
        cell, schema="id_a bigint, id_b bigint, sim double"
    )


def similarity_topk_grid(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = False,
    q_blocks: int = 8,
    c_blocks: int = 8,
) -> DataFrame:
    """Exact top-k cosine when the QUERY side is itself corpus-sized
    (kNN-graph builds: every vector is a query) — fully distributed,
    no driver collect. Queries hash into ``q_blocks`` buckets, corpus
    into ``c_blocks``; each grid cell emits its LOCAL top-k per query
    under the full (sim desc, id asc) order (any global winner is in
    its cell's local top-k), then one exact window ranks the
    O(c_blocks * k) candidates per query. Kernel arithmetic matches
    :func:`similarity_topk_blocked` accumulation-for-accumulation, so
    the result is bit-identical to the broadcast and JVM paths.

    Shuffle: corpus replicated q_blocks times, queries c_blocks times —
    O(n_c * B_q + n_q * B_c) instead of a driver-held query matrix; the
    candidate shuffle into the final window is O(n_q * B_c * k).
    """
    import numpy as np

    qrep = _grid_replicate(
        queries, query_id, query_vec,
        own_blocks=q_blocks, other_blocks=c_blocks,
        own_name="qb", other_name="cb", side="Q",
    )
    crep = _grid_replicate(
        corpus, corpus_id, corpus_vec,
        own_blocks=c_blocks, other_blocks=q_blocks,
        own_name="cb", other_name="qb", side="C",
    )
    both = qrep.select("qb", "cb", "side", "id", "v").unionByName(
        crep.select("qb", "cb", "side", "id", "v")
    )

    def cell(pdf):
        import pandas as pd

        qmask = pdf["side"].to_numpy() == "Q"
        qpdf, cpdf = pdf[qmask], pdf[~qmask]
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame(
                {"query_id": np.array([], dtype=np.int64),
                 "cid": np.array([], dtype=np.int64),
                 "sim": np.array([], dtype=np.float64)}
            )
        qids = qpdf["id"].to_numpy(dtype=np.int64)
        Q = np.array(list(qpdf["v"]), dtype=np.float64)
        QT = np.ascontiguousarray(Q.T)  # (d, nq)
        qnorm = _col_norms(QT)
        lids = cpdf["id"].to_numpy(dtype=np.int64)
        L = np.array(list(cpdf["v"]), dtype=np.float64)
        sims = _sims_matrix(L, QT, qnorm)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(qids)):
            col = sims[:, qi]
            order = _topk_order(col, lids)
            if exclude_self:
                order = order[lids[order] != qids[qi]]
            top = order[:k]
            out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
            out_id.append(lids[top])
            out_sim.append(col[top])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "cid": np.concatenate(out_id),
                "sim": np.concatenate(out_sim),
            }
        )

    cand = both.groupBy("qb", "cb").applyInPandas(
        cell, schema="query_id bigint, cid bigint, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cid").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("cid").alias(corpus_id),
            F.col("sim"),
            (F.lit(1.0) - F.col("sim")).alias("dist"),
        )
    )


def centroid_outliers(
    vectors: DataFrame,
    k: int = 3,
    *,
    dim: int,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding outliers: the k vectors farthest (L2) from
    their own label's centroid — the standard mislabeled-sample /
    corpus-drift diagnostic over a labeled embedding corpus.

    Determinism across engines: centroids are the per-(label, dim)
    shuffled avg ROUNDED to 9 dp (the same policy label_centroids
    uses), collected into a dim-ordered array; the distance is then a
    statically-unrolled fixed-order expression over (vector, rounded
    centroid) — bit-identical everywhere — and rounded once more for
    the output column. Ranking ties break by id ascending.

    Plan at scale: one posexplode aggregate for centroids (shuffle
    cardinality |labels| x dim), centroid ARRAY table is |labels| rows
    -> broadcast; per-vector distance is a map-only unrolled
    expression; per-label top-k is WindowGroupLimit (partial top-k
    before the one tiny shuffle). No corpus-sized shuffle anywhere.
    """
    ex = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("d", "__x"),
    )
    cent = (
        ex.groupBy("label", "d")
        .agg(F.round(F.avg(F.col("__x").cast("double")), 9).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("d"), F.col("c")))
                ),
                lambda s: s["c"],
            ).alias("__cv")
        )
    )
    sq = " + ".join(
        f"((CAST(`{vec_col}`[{i}] AS DOUBLE) - `__cv`[{i}])"
        f" * (CAST(`{vec_col}`[{i}] AS DOUBLE) - `__cv`[{i}]))"
        for i in range(dim)
    )
    d = (
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("label"),
            F.col(vec_col),
        )
        .join(F.broadcast(cent), on="label")
        .select(
            "label", "vec_id", F.sqrt(F.expr(sq)).alias("__dist")
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("__dist").desc(), F.col("vec_id").asc()
    )
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "label", "rank", "vec_id", F.round("__dist", 9).alias("dist")
        )
    )


def knn_label_vote(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """k-NN majority-vote classification over a labeled vector corpus
    — the classic embedding-space label propagation a curation
    pipeline uses to spread a small set of human labels (spam/quality/
    domain tags) across the whole corpus. With queries drawn from the
    corpus and ``exclude_self``, this is leave-one-out evaluation.

    Per query: (query_id, pred_label, n_votes, top_sim). Prediction =
    the modal label among the k nearest neighbors; ties break by vote
    count DESC, then best-similarity-within-label DESC, then label ASC
    — a total order, so the answer (and its SQL twin) is
    deterministic.

    Scale shape: one top-k search (whatever strategy fits the corpus
    size — exact here; callers can feed any (query_id, rank, id, sim)
    frame from the ANN paths instead), one equi-join on the corpus id
    for labels (k rows per query), one k-row-per-query aggregate, one
    per-query window. Nothing beyond the search touches the corpus.
    """
    topk = similarity_topk(
        corpus, queries, k,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        exclude_self=exclude_self, dim=dim,
    )
    labels = corpus.select(
        F.col(corpus_id), F.col(label_col).alias("__nbr_label")
    )
    votes = (
        topk.join(labels, corpus_id)
        .groupBy("query_id", "__nbr_label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_votes"),
            F.max("sim").alias("top_sim"),
        )
    )
    # asc_nulls_last: Spark's bare ASC sorts NULLs FIRST while DuckDB
    # defaults to NULLS LAST — a NULL-labeled neighbor (the NULL
    # hostile tier ships one) must tie-break identically in both.
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(),
        F.col("top_sim").desc(),
        F.col("__nbr_label").asc_nulls_last(),
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "query_id",
            F.col("__nbr_label").alias("pred_label"),
            "n_votes",
            "top_sim",
        )
    )
