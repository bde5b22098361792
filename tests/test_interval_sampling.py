"""Bucketed range join and stratified sampling."""

import datetime as dt

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.interval import range_join_bucketed
from cs6300_vectordbs_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _s(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _rj(spark, left_rows, right_rows, lower_us=0, upper_us=300_000_000):
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, rid long")
    return range_join_bucketed(
        left, right, on="k", lower_us=lower_us, upper_us=upper_us,
        right_cols=["rid"],
    )


def test_range_join_window_bounds_inclusive(spark):
    out = _rj(
        spark,
        [(1, _s(300), 1)],
        # diff = 300s, 150s, 0s, -1s, 301s
        [(1, _s(0), 10), (1, _s(150), 11), (1, _s(300), 12),
         (1, _s(301), 13), (1, _s(-1), 14)],
    )
    got = sorted(r.rid_r for r in out.collect())
    assert got == [10, 11, 12]  # inclusive both ends, future/too-old excluded


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # right rows straddling bucket boundaries must match exactly once
    rights = [(1, _s(s), 100 + s) for s in range(0, 600, 30)]
    out = _rj(spark, [(1, _s(600), 1)], rights)
    rids = [r.rid_r for r in out.collect()]
    assert len(rids) == len(set(rids))
    assert sorted(rids) == [100 + s for s in range(300, 571, 30)]


def test_range_join_respects_key(spark):
    out = _rj(spark, [(1, _s(100), 1)], [(2, _s(50), 9)])
    assert out.count() == 0


def test_range_join_identical_right_rows_both_kept(spark):
    out = _rj(spark, [(1, _s(100), 1)], [(1, _s(50), 7), (1, _s(50), 7)])
    assert out.count() == 2  # legitimate duplicates are not merged


def test_range_join_negative_lower_is_lookahead(spark):
    # window [-60s, +60s] around the left event
    out = _rj(
        spark,
        [(1, _s(100), 1)],
        [(1, _s(50), 10), (1, _s(140), 11), (1, _s(200), 12)],
        lower_us=-60_000_000,
        upper_us=60_000_000,
    )
    assert sorted(r.rid_r for r in out.collect()) == [10, 11]


def test_stratified_sample_rates_and_subset(spark, docs):
    out = stratified_hash_sample(
        docs, "lang", "doc_id", {"en": 100, "de": 0}, default_pct=0
    )
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == docs.filter(F.col("lang") == "en").count()


def test_stratified_matches_hash_sample_per_stratum(spark, docs):
    # same keep-set as plain hash_sample restricted to the stratum
    strat = stratified_hash_sample(docs, "lang", "doc_id", {"de": 30})
    plain = hash_sample(docs.filter(F.col("lang") == "de"), "doc_id", pct=30)
    assert {r.doc_id for r in strat.collect()} == {
        r.doc_id for r in plain.collect()
    }
