"""Salted two-stage aggregation equals the direct groupBy."""

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.skew import salted_agg


def _events(spark):
    # skewed: key 1 holds 90% of rows
    rows = [(1, i, float(i % 7)) for i in range(900)] + [
        (k, 1000 + k, float(k)) for k in range(2, 102)
    ]
    return spark.createDataFrame(rows, "k long, eid long, v double")


def test_salted_matches_direct_exact_types(spark):
    df = _events(spark)
    salted = salted_agg(
        df, ["k"],
        [("eid", "count", "n"), ("eid", "min", "mn"), ("eid", "max", "mx")],
        salt_buckets=8,
    )
    direct = df.groupBy("k").agg(
        F.count("eid").alias("n"), F.min("eid").alias("mn"),
        F.max("eid").alias("mx"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_salted_float_sum_and_avg_within_policy(spark):
    df = _events(spark)
    salted = {
        r.k: (r.s, r.a)
        for r in salted_agg(
            df, ["k"], [("v", "sum", "s"), ("v", "avg", "a")], salt_buckets=8
        ).collect()
    }
    direct = {
        r.k: (r.s, r.a)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.avg("v").alias("a"))
        .collect()
    }
    assert salted.keys() == direct.keys()
    for k in direct:
        assert abs(salted[k][0] - direct[k][0]) < 1e-9
        assert abs(salted[k][1] - direct[k][1]) < 1e-9


def test_salted_rejects_non_decomposable(spark):
    import pytest

    with pytest.raises(ValueError):
        salted_agg(_events(spark), ["k"], [("v", "median", "m")])
