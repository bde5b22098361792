"""BM25 full-text retrieval — the lexical complement to the engine's
vector search (extension surface; the reference delegates all retrieval
to vector ANN, /root/reference/src/chroma.py:97-100).

Classic inverted-index shape, expressed relationally:

  postings   (term, doc, tf)   — one groupBy over exploded tokens
  doc norms  (doc, |d|)        — same scan, second aggregate
  term stats (term, df)        — aggregate OVER the postings (already
                                 one row per (term, doc), so df=count)
  query terms EQUI-JOIN the postings table — candidate (query, doc)
  pairs are exactly the docs containing >= 1 query term, never a
  cartesian; scoring is Okapi BM25 (k1/b), top-k per query by the
  row_number window (WindowGroupLimit partial top-k).

At 100 TB the postings build is two hash aggregates with map-side
combine over the token explosion; N and avgdl are a 1-row broadcast;
the hot-term skew on the postings join (stop words) is AQE skew-split
territory — or pre-drop stop terms with a df ceiling, the IR-native
mitigation (``max_df_ratio``).

Cross-engine determinism: tf/df/N/dl are integers, avgdl = int-sum /
int-count (one exact division). ln() may differ by 1 ulp between
engines, so scores are rounded to 9 decimals BEFORE ranking and ties
break by doc id — the repo's standard float policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import shingle_rows


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 5,
    *,
    query_id: str = "query_id",
    id_col: str = "doc_id",
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of per-query rankings (hybrid retrieval:
    lexical + vector, the modern RAG default). Each input needs
    (query_id, id_col, rank); fused score = Σ 1/(rrf_k + rank).

    Determinism: scores are built from INTEGER ranks only — every term
    is bit-identical in any engine, and with TWO rankings the per-key
    sum is a single commutative IEEE add, so no rounding is needed
    (fuse 3+ rankings -> round before ranking; association order of a
    shuffled sum is not fixed). Plan: union + one groupBy (tiny:
    queries x pool-depth rows) + WindowGroupLimit top-k.
    """
    parts = [
        r.select(
            F.col(query_id).alias("__qid"),
            F.col(id_col).alias("__id"),
            (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias("__term"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("__qid", "__id").agg(F.sum("__term").alias("rrf_score"))
    w = Window.partitionBy("__qid").orderBy(
        F.col("rrf_score").desc(), F.col("__id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            "rank",
            F.col("__id").alias(id_col),
            "rrf_score",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Top-k BM25 retrieval of ``queries`` against ``docs``.

    Returns (query_id, rank, doc_id, score) — score rounded to 9
    decimals, rank ties by doc id ascending. Query terms are DISTINCT
    (query term frequency weight 1, the common simplification).
    ``max_df_ratio`` drops terms appearing in more than that fraction
    of docs (stop-term pruning; also the skew mitigation).
    """
    toks = shingle_rows(
        docs, id_col=id_col, text_col=text_col, n=1, distinct=False
    )
    postings = toks.groupBy("id", "s").agg(F.count(F.lit(1)).alias("tf"))
    # DOCUMENT-SHARDED index, cached once: repartition by doc id (the
    # shard layout of every production search engine), then persist —
    # persist (unlike localCheckpoint) keeps the HashPartitioning(id)
    # metadata, so the scoring groupBy(query, id) below needs NO
    # exchange of the candidate set (all rows of one doc live in one
    # partition; partial aggregation completes there). The cache also
    # makes the tokenize+explode pipeline run once, not once per
    # consumer. Measured on the sf0.1 query path: 5.5 s -> 1.3 s.
    spark = docs.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    postings = postings.repartition(p, "id").persist()
    postings.count()  # materialize eagerly (index-build boundary)
    # dl = sum of term frequencies — same value as counting raw token
    # rows, but computed over the much smaller postings table.
    dl = postings.groupBy("id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = postings.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # Collection-level constants (n_docs, avgdl) are INDEX METADATA:
    # two scalars computed once at index-build time and embedded as
    # literals, exactly as a stored inverted index keeps them in its
    # header. Leaving them as a 1-row DataFrame made every consumer
    # (the stop-term filter AND the scoring join) re-evaluate the
    # whole dl-aggregate subtree — Spark does not share common
    # subtrees across joins (measured: the pruned variant paid ~0.4 s
    # extra at sf0.1 re-aggregating postings).
    trow = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = trow["n_docs"], trow["avgdl"]

    qt = queries.select(
        F.col(query_id).alias("__qid"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.trim(F.col(query_col))), r"\s+"),
                    lambda x: x != "",
                )
            )
        ).alias("s"),
    )

    if max_df_ratio is not None:
        # Apply the stop-term ceiling to the TERM TABLE, before any
        # postings row is touched: a term in >ratio of docs contributes
        # ~zero IDF but df x |queries| candidate rows (measured: the
        # top stop terms alone are most of a 9M-row candidate set at
        # sf0.1). Explicit pre-join pruning — not a post-join filter
        # the optimizer may or may not sink. n_docs is a literal, so
        # this is a plain pushable comparison on the term table.
        stats = stats.filter(
            F.col("df") <= F.lit(n_docs) * max_df_ratio
        ).select("s", "df")

    # IMPACT-SCORED INDEX: the BM25 term weight idf*tf*(k1+1)/denom
    # depends only on (term, doc) — query term frequency is weight 1 —
    # so score it on the POSTINGS table (O(index) rows) instead of the
    # query-expanded candidate set (O(sum df over query terms) rows,
    # ~12x larger at sf0.1). This is Lucene's precomputed-impact-list
    # design expressed relationally; the query path then only equi-joins
    # and sums slim (qid, doc, w) rows. dl attaches via a window over
    # the postings' own doc key (one shuffle, no join); df via the term
    # table (vocab-sized, broadcast; past the broadcast budget you'd
    # attach df via a term-sharded pass at index build instead). The dl
    # join is CO-PARTITIONED: dl is grouped from the id-sharded
    # postings, so neither side moves. Everything here is O(index)
    # rows, never O(candidates).
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    impacts = (
        postings.join(dl, on="id")
        .join(F.broadcast(stats), on="s")
        .select("s", "id", (idf * tf * F.lit(k1 + 1.0) / denom).alias("w"))
    )
    # Queries are small by contract — broadcast them so candidates are
    # generated in place on the id-sharded index partitions and the
    # groupBy completes without moving a single candidate row.
    scored = (
        F.broadcast(qt).join(impacts, on="s")
        .select(F.col("__qid").alias(query_id), F.col("id").alias(id_col),
                F.col("w"))
        .groupBy(query_id, id_col)
        .agg(F.round(F.sum("w"), 9).alias("score"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", id_col, "score")
    )


def tfidf_topterms(
    docs: DataFrame,
    k: int = 3,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the standard corpus-level
    keyword/topic extraction pass of a training-data pipeline (and the
    classic lexical twin of per-doc embedding summaries).

    score(t, d) = tf(t, d) * ln(N / df(t)), rounded to 9 decimals
    BEFORE ranking (the repo's cross-engine float policy for ln);
    ranking ties break by term ascending. N counts docs with >= 1
    token, consistent with the postings the stats derive from.

    Plan: the same document-sharded postings build as :func:`bm25_topk`
    (tokenize -> one (id, term) groupBy, repartitioned by doc id), df
    attached via a vocab-sized broadcast, and the per-doc top-k window
    partitioned by the SHARD KEY (doc id) — WindowGroupLimit runs
    entirely within each index partition, so the whole pass after the
    index build is exchange-free. At 100 TB: two map-side-combined
    aggregates plus a map-only scoring pass.
    """
    toks = shingle_rows(
        docs, id_col=id_col, text_col=text_col, n=1, distinct=False
    )
    spark = docs.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    postings = (
        toks.groupBy("id", "s")
        .agg(F.count(F.lit(1)).alias("tf"))
        .repartition(p, "id")
        .persist()
    )
    n_docs = postings.select("id").distinct().count()
    stats = postings.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    scored = postings.join(F.broadcast(stats), on="s").select(
        "id",
        "s",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df")),
            9,
        ).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("s").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "rank", F.col("s").alias("term"),
            "score",
        )
    )
