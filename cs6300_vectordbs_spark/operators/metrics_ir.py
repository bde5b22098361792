"""Latency + IR-quality metric aggregations.

The reference's metric quirks are THE SPEC here (SURVEY.md §2.3) — they
are reproduced exactly, with loud notes, because the oracle tests
encode them:

  - recall_at_k (/root/reference/src/queries.py:250-282) is
    precision-shaped: denominator is k (result-list length), NOT total
    relevant. Queries with zero relevant hits are EXCLUDED from the
    macro-average (the ``continue`` at src/queries.py:272-275 skips the
    append).
  - ndcg_at_k (/root/reference/src/queries.py:284-340): binary gains,
    discount log2(i+2) for 0-based i (== log2(rank+1) for 1-based rank).
    Unlike recall, zero-relevant queries ARE INCLUDED as 0.0 — only
    queries with an empty result list are skipped (the continue at
    src/queries.py:313-315).
  - percentiles (/root/reference/src/metrics.py:13-41): numpy default
    linear interpolation == Spark's exact ``percentile`` == DuckDB's
    ``quantile_cont``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latency_percentiles(
    df: DataFrame, value_col: str = "latency_ms"
) -> DataFrame:
    """P50/P95/P99 with linear interpolation (reference A1).

    Uses exact ``percentile`` for oracle parity; at 100 TB swap in
    ``percentile_approx`` (t-digest, single pass, bounded memory) — the
    exact version sorts per group and is fine up to ~1e9 rows/group.
    """
    v = F.col(value_col).cast("double")
    return df.agg(
        F.percentile(v, F.lit(0.5)).alias("p50"),
        F.percentile(v, F.lit(0.95)).alias("p95"),
        F.percentile(v, F.lit(0.99)).alias("p99"),
    )


def latency_summary(df: DataFrame, value_col: str = "latency_ms") -> DataFrame:
    """avg/min/max/count (reference A2/A3, src/queries.py:352-357)."""
    v = F.col(value_col).cast("double")
    return df.agg(
        F.avg(v).alias("avg_ms"),
        F.min(v).alias("min_ms"),
        F.max(v).alias("max_ms"),
        F.count(F.lit(1)).alias("n_queries"),
    )


def recall_at_k(results: DataFrame) -> DataFrame:
    """Reference A4 over a flat judged-results table
    (query_id, rank, is_relevant).

    Per query: relevant_in_topk / len(results)  [precision-shaped].
    Macro-average EXCLUDES queries with zero relevant results.
    Returns one row: (avg_recall, n_queries_scored).
    """
    per_query = results.groupBy("query_id").agg(
        (F.sum("is_relevant") / F.count(F.lit(1))).alias("recall"),
        F.sum("is_relevant").alias("n_relevant"),
    )
    return per_query.filter(F.col("n_relevant") > 0).agg(
        # Reference returns 0.0 when no query has a relevant hit
        # (src/queries.py:281: `if recall_scores else 0.0`).
        F.coalesce(F.avg("recall"), F.lit(0.0)).alias("avg_recall"),
        F.count(F.lit(1)).alias("n_queries_scored"),
    )


def recall_at_k_per_query(results: DataFrame) -> DataFrame:
    """Per-query recall rows (query_id, recall, n_relevant) — the
    pre-aggregation shape, useful for joining with other metrics."""
    return results.groupBy("query_id").agg(
        (F.sum("is_relevant") / F.count(F.lit(1))).alias("recall"),
        F.sum("is_relevant").alias("n_relevant"),
    )


def mrr_at_k(results: DataFrame) -> DataFrame:
    """Mean Reciprocal Rank over (query_id, rank, is_relevant); rank is
    1-based. Standard MRR: per query, 1/rank of the FIRST relevant hit
    in the top-k list, 0.0 when none — zero-relevant queries COUNT in
    the macro-average (the ndcg convention, not the recall one). The
    reference computes recall/nDCG only; MRR completes the standard IR
    triple over the same judged-results table with no extra scan.
    Returns one row: (avg_mrr, n_queries_scored).
    """
    per_query = results.groupBy("query_id").agg(
        F.min(
            F.when(F.col("is_relevant") == 1, F.col("rank"))
        ).alias("first_rel"),
    )
    rr = F.when(
        F.col("first_rel").isNotNull(),
        F.lit(1.0) / F.col("first_rel").cast("double"),
    ).otherwise(F.lit(0.0))
    return per_query.agg(
        F.avg(rr).alias("avg_mrr"),
        F.count(F.lit(1)).alias("n_queries_scored"),
    )


def ndcg_at_k(results: DataFrame) -> DataFrame:
    """Reference A5 over (query_id, rank, is_relevant); rank is 1-based.

    DCG  = sum(is_relevant / log2(rank + 1))
    IDCG = sum_{i=1..n_relevant} 1 / log2(i + 1)   (ideal: all relevant
           docs first — binary gains make the ideal ordering closed-form)
    nDCG = DCG/IDCG, 0.0 when IDCG == 0; zero-relevant queries COUNT as
    0.0 in the macro-average (unlike recall).
    Returns one row: (avg_ndcg, n_queries_scored).
    """
    per_query = results.groupBy("query_id").agg(
        F.sum(
            F.col("is_relevant").cast("double") / F.log2(F.col("rank") + 1.0)
        ).alias("dcg"),
        F.sum("is_relevant").alias("n_relevant"),
    )
    # IDCG via a generated sequence — no second sort/window needed.
    idcg = F.when(
        F.col("n_relevant") > 0,
        F.aggregate(
            F.sequence(F.lit(1), F.col("n_relevant").cast("int")),
            F.lit(0.0),
            lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
        ),
    ).otherwise(F.lit(0.0))
    per_query = per_query.withColumn(
        "ndcg",
        F.when(F.col("n_relevant") > 0, F.col("dcg") / idcg).otherwise(0.0),
    )
    return per_query.agg(
        F.avg("ndcg").alias("avg_ndcg"),
        F.count(F.lit(1)).alias("n_queries_scored"),
    )
