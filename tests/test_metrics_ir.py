"""Golden hand-computed cases for the reference's metric quirks.

The quirks ARE the spec (SURVEY.md §2.3):
  A4 recall: precision-shaped, zero-relevant queries EXCLUDED from the
     macro-average (/root/reference/src/queries.py:272-275).
  A5 ndcg: zero-relevant queries INCLUDED as 0.0
     (/root/reference/src/queries.py:330-337).
"""

import math

import pytest

from cs6300_vectordbs_spark.operators.metrics_ir import (
    latency_percentiles,
    latency_summary,
    mrr_at_k,
    ndcg_at_k,
    recall_at_k,
    recall_at_k_per_query,
)


def _results(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "rank", "is_relevant"])


# q1: hits at ranks 1,3 of 5 → recall 2/5, q2: nothing relevant,
# q3: all 5 relevant → recall 1.0
GOLDEN = (
    [(1, r, 1 if r in (1, 3) else 0) for r in range(1, 6)]
    + [(2, r, 0) for r in range(1, 6)]
    + [(3, r, 1) for r in range(1, 6)]
)


def test_recall_excludes_zero_relevant_queries(spark):
    row = recall_at_k(_results(spark, GOLDEN)).first()
    # q2 excluded: avg over {0.4, 1.0} = 0.7, NOT over {0.4, 0, 1.0}
    assert row.n_queries_scored == 2
    assert row.avg_recall == pytest.approx(0.7)


def test_recall_all_zero_returns_zero(spark):
    rows = [(1, r, 0) for r in range(1, 6)]
    row = recall_at_k(_results(spark, rows)).first()
    assert row.avg_recall == 0.0
    assert row.n_queries_scored == 0


def test_recall_per_query_values(spark):
    got = {
        r.query_id: (r.recall, r.n_relevant)
        for r in recall_at_k_per_query(_results(spark, GOLDEN)).collect()
    }
    assert got[1] == (pytest.approx(0.4), 2)
    assert got[2] == (pytest.approx(0.0), 0)
    assert got[3] == (pytest.approx(1.0), 5)


def test_ndcg_includes_zero_relevant_as_zero(spark):
    row = ndcg_at_k(_results(spark, GOLDEN)).first()
    # q1: DCG = 1/log2(2) + 1/log2(4) = 1.5; IDCG = 1/log2(2)+1/log2(3)
    dcg1 = 1 / math.log2(2) + 1 / math.log2(4)
    idcg1 = 1 / math.log2(2) + 1 / math.log2(3)
    # q2 contributes 0.0 (INCLUDED — unlike recall); q3: dcg == idcg → 1.0
    expected = (dcg1 / idcg1 + 0.0 + 1.0) / 3
    assert row.n_queries_scored == 3
    assert row.avg_ndcg == pytest.approx(expected)


def test_ndcg_reference_discount_is_log2_rank_plus_1(spark):
    # single query, single relevant hit at rank 2 of 2:
    # DCG = 1/log2(3), IDCG = 1/log2(2) → ndcg = log2(2)/log2(3)
    rows = [(1, 1, 0), (1, 2, 1)]
    row = ndcg_at_k(_results(spark, rows)).first()
    assert row.avg_ndcg == pytest.approx(1 / math.log2(3))


def test_latency_percentiles_match_numpy(spark):
    import numpy as np

    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3, 5.8, 9.7, 9.3]
    df = spark.createDataFrame([(v,) for v in vals], ["latency_ms"])
    row = latency_percentiles(df).first()
    p50, p95, p99 = np.percentile(vals, [50, 95, 99])
    assert row.p50 == pytest.approx(p50)
    assert row.p95 == pytest.approx(p95)
    assert row.p99 == pytest.approx(p99)


def test_latency_summary(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (6.0,)], ["latency_ms"])
    row = latency_summary(df).first()
    assert (row.avg_ms, row.min_ms, row.max_ms, row.n_queries) == (3.0, 1.0, 6.0, 3)


def test_mrr_includes_zero_relevant_as_zero(spark):
    # GOLDEN: q1 first hit at rank 1 → 1.0; q2 none → 0.0;
    # q3 first hit at rank 1 → 1.0. MRR = 2/3 over ALL 3 queries.
    row = mrr_at_k(_results(spark, GOLDEN)).first()
    assert row.n_queries_scored == 3
    assert row.avg_mrr == pytest.approx(2 / 3)


def test_mrr_first_hit_rank(spark):
    # single query, first relevant at rank 4 of 5 → MRR = 0.25
    rows = [(1, r, 1 if r >= 4 else 0) for r in range(1, 6)]
    row = mrr_at_k(_results(spark, rows)).first()
    assert row.avg_mrr == pytest.approx(0.25)
