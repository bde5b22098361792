"""Per-query latency capture — reference U3's ``QueryResult.latency_ms``.

The reference times each search client-side and stores the wall-clock
per query (/root/reference/src/chroma.py:96-102, ``latency_ms`` on
QueryResult) — the one reference output column that had no engine twin.
This operator reproduces that measurement shape in Spark: the query
batch streams through a mapInPandas stage whose kernel executes and
TIMES each query's top-k search, emitting ``(query_id, latency_ms,
rank, <id>, sim)`` rows that feed the existing latency aggregates
(operators/metrics_ir.latency_percentiles / latency_summary).

Design note: per-query latency is a SERVING-side metric, so the kernel
mirrors a serving node: the searched index partition is held in memory
(broadcast), queries arrive as rows, each is answered and clocked
independently. That is the reference's own measurement model — a
client loop over an in-process index — not the bulk-analytics path
(use operators/similarity for that; its whole-batch plans are faster
per query but have no meaningful per-query wall time). Latencies are
wall-clock and therefore nondeterministic: a rows-only driver check by
design; value tests assert schema, positivity, and that the RESULT
rows match the exact batch search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_with_latency(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k cosine search answered query-at-a-time with per-query
    wall-clock capture. Returns one row per (query, rank):
    ``(query_id, latency_ms, rank, <corpus_id>, sim)`` — every rank row
    of a query carries that query's latency, so downstream percentile
    aggregation can run over ``WHERE rank = 1`` or deduplicate.

    The corpus is collected and broadcast (the serving-index contract:
    one node's index shard fits in memory — same constraint the
    reference's in-process Chroma index has); queries stream through
    executors in Arrow batches, each timed around its own score+rank.
    """
    import numpy as np

    spark = corpus.sparkSession
    rows = corpus.select(
        F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("v")
    ).collect()
    ids = np.array([r.id for r in rows], dtype=np.int64)
    M = np.array([r.v for r in rows], dtype=np.float64)
    norms = np.sqrt((M * M).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, M, norms))

    def gen(batches):
        import time

        import pandas as pd

        ids_b, M_b, norms_b = bc.value
        for pdf in batches:
            out_qid, out_ms, out_rank, out_id, out_sim = [], [], [], [], []
            for qid, qv in zip(pdf["qid"], pdf["qv"]):
                t0 = time.perf_counter()
                q = np.asarray(qv, dtype=np.float64)
                qn = np.sqrt((q * q).sum())
                denom = norms_b * qn
                sims = np.where(denom == 0.0, 0.0,
                                (M_b @ q) / np.where(denom == 0.0, 1.0, denom))
                order = np.lexsort((ids_b, -sims))
                if exclude_self:
                    order = order[ids_b[order] != qid]
                top = order[:k]
                ms = (time.perf_counter() - t0) * 1000.0
                n = len(top)
                out_qid.extend([qid] * n)
                out_ms.extend([ms] * n)
                out_rank.extend(range(1, n + 1))
                out_id.extend(ids_b[top])
                out_sim.extend(sims[top])
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(out_qid, dtype=np.int64),
                    "latency_ms": np.asarray(out_ms, dtype=np.float64),
                    "rank": np.asarray(out_rank, dtype=np.int64),
                    "cid": np.asarray(out_id, dtype=np.int64),
                    "sim": np.asarray(out_sim, dtype=np.float64),
                }
            )

    src = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    )
    return src.mapInPandas(
        gen,
        schema="query_id bigint, latency_ms double, rank bigint, "
               "cid bigint, sim double",
    ).withColumnRenamed("cid", corpus_id)
