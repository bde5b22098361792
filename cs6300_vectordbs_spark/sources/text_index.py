"""Persistent BM25 text index — the stored-inverted-index twin of the
persisted IVF vector index (vector_index.py), completing the S9
create-if-absent lifecycle for the lexical search path.

Layout on disk:

  {path}/impacts/bucket=<b>/...   precomputed BM25 impact postings
                                  (term, doc, w) partitioned by a
                                  stable hash bucket of the TERM
  {path}/META                     n_docs / avgdl / k1 / b (JSON)
  {path}/FINGERPRINT              corpus identity + build params

The impacts are the full per-(term, doc) BM25 weight
idf*tf*(k1+1)/denom computed at BUILD time (Lucene's impact lists) —
serving never touches raw text, doc lengths, or df tables. Term-bucket
partitioning gives the lexical analog of IVF cell pruning: a query's
terms hash to a small bucket set, applied as a partition filter so the
scan lists only matching directories — at 100 TB the serving scan is
|query buckets| / n_buckets of the index, and within a bucket the
parquet term column min/max skips row groups.

The bucket hash is Spark's Murmur3 (stable across sessions and
machines for the same input); it only needs build/serve agreement
inside this engine, never cross-engine, because the ORACLE for the
serving result is the plain BM25 SQL twin.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import shingle_rows
from .index_common import (
    build_lock,
    corpus_fingerprint,
    invalidate_fingerprint,
    read_fingerprint,
    write_fingerprint,
)


def text_index_exists(path: str) -> bool:
    return os.path.exists(f"{path}/impacts/_SUCCESS") and os.path.exists(
        f"{path}/META"
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = 64,
) -> None:
    """Tokenize -> postings -> precompute BM25 impacts -> write
    term-bucket-partitioned parquet plus collection metadata."""
    toks = shingle_rows(
        docs, id_col=id_col, text_col=text_col, n=1, distinct=False
    )
    postings = toks.groupBy("id", "s").agg(F.count(F.lit(1)).alias("tf"))
    spark = docs.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    postings = postings.repartition(p, "id").persist()
    dl = postings.groupBy("id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = postings.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    meta_row = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = meta_row["n_docs"], float(meta_row["avgdl"])

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
        .select(
            "s",
            "id",
            (idf * tf * F.lit(k1 + 1.0) / denom).alias("w"),
            F.pmod(F.hash("s"), F.lit(n_buckets)).alias("bucket"),
        )
    )
    impacts.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/impacts"
    )
    postings.unpersist()
    with open(f"{path}/META", "w", encoding="utf-8") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "k1": k1,
                "b": b,
                "n_buckets": n_buckets,
            },
            f,
        )


def ensure_text_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = 64,
) -> None:
    """S9 create-if-absent with content-addressed invalidation: reuse
    only a complete index whose stored fingerprint matches both the
    live corpus AND the BM25 parameters (k1/b/buckets) — a
    stale-parameter index must never serve a caller expecting the new
    scoring."""
    fp = corpus_fingerprint(
        docs, [id_col, text_col],
        {"k1": k1, "b": b, "n_buckets": n_buckets},
    )
    if text_index_exists(path) and read_fingerprint(path) == fp:
        return
    with build_lock(path):
        # Re-check under the lock: a concurrent builder we blocked on
        # may have committed exactly this fingerprint.
        if text_index_exists(path) and read_fingerprint(path) == fp:
            return
        invalidate_fingerprint(path)  # crash mid-rebuild => no marker
        build_text_index(
            docs, path, id_col=id_col, text_col=text_col,
            k1=k1, b=b, n_buckets=n_buckets,
        )
        write_fingerprint(path, fp)


def search_text_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    *,
    query_id: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Top-k BM25 from the stored impacts. Query terms hash to their
    buckets driver-side (|queries| x |terms| small ints — the same
    contract as the IVF probed-cell collect) and the bucket set is a
    PARTITION filter: unmatched directories are never listed. Scoring
    is the slim broadcast-join + sum the in-memory path uses; output
    and rounding match bm25_topk exactly (shared SQL oracle)."""
    with open(f"{path}/META", "r", encoding="utf-8") as f:
        meta = json.load(f)
    n_buckets = int(meta["n_buckets"])

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
    ).withColumn("bucket", F.pmod(F.hash("s"), F.lit(n_buckets)))
    qt = qt.localCheckpoint(eager=True)
    buckets = sorted(
        {r["bucket"] for r in qt.select("bucket").distinct().collect()}
    )
    impacts = spark.read.parquet(f"{path}/impacts").filter(
        F.col("bucket").isin(buckets)
    )
    scored = (
        F.broadcast(qt.drop("bucket")).join(impacts, on="s")
        .select(F.col("__qid").alias(query_id), F.col("id").alias("doc_id"),
                F.col("w"))
        .groupBy(query_id, "doc_id")
        .agg(F.round(F.sum("w"), 9).alias("score"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", "doc_id", "score")
    )
