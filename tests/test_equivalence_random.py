"""Seeded-random equivalence tests: each operator vs an independent
naive reference over adversarial random inputs (short docs, weird
whitespace, timestamp ties, boundary diffs). One Spark round trip per
test — the randomized coverage of property testing without paying a
Spark job per example.
"""

import datetime as dt
import random

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.asof import asof_join
from cs6300_vectordbs_spark.operators.dedup import (
    shingle_rows,
    word_shingles,
)
from cs6300_vectordbs_spark.operators.interval import range_join_bucketed

WORDS = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "x", "zz"]
WS = [" ", "  ", "\t", "\n", " \t "]


def _random_text(rng):
    n = rng.randrange(0, 8)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(WORDS) + rng.choice(WS))
    lead = rng.choice(["", " ", "\t"])
    return lead + "".join(parts)


def test_shingle_rows_equals_hof_shingles(spark):
    """The codegen posexplode+lead path must produce exactly the same
    (id, shingle) set as the array-HOF word_shingles for every doc —
    including empty, whitespace-only, and shorter-than-n docs."""
    rng = random.Random(7)
    rows = [(i, _random_text(rng)) for i in range(300)]
    rows += [(1000, ""), (1001, "   "), (1002, "\t\n"), (1003, "one"),
             (1004, "one two"), (1005, "one two three")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 3):
        fast = {
            (r.id, r.s)
            for r in shingle_rows(docs, n=n).collect()
        }
        ref = {
            (r.doc_id, s)
            for r in docs.select(
                "doc_id", word_shingles("text", n).alias("sh")
            ).collect()
            for s in r.sh
        }
        assert fast == ref, f"n={n}"


def _naive_asof(left_rows, right_rows):
    out = {}
    for k, lt, lid in left_rows:
        best = None
        for rk, rt, rid, rv in right_rows:
            if rk == k and rt <= lt and (
                best is None or (rt, rid) > (best[0], best[1])
            ):
                best = (rt, rid, rv)
        out[lid] = (best[1], best[2]) if best else (None, None)
    return out


def test_asof_join_equals_naive(spark):
    rng = random.Random(11)
    t0 = dt.datetime(2024, 1, 1)
    # coarse timestamp grid -> plenty of exact ties across keys
    left_rows = [
        (rng.randrange(4), t0 + dt.timedelta(minutes=rng.randrange(30)), i)
        for i in range(120)
    ]
    right_rows = [
        (rng.randrange(4), t0 + dt.timedelta(minutes=rng.randrange(30)),
         200 + i, float(rng.randrange(100)))
        for i in range(120)
    ]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        right_rows, "k long, ts timestamp, rid long, rv double"
    )
    got = {
        r.lid: (r.rid_matched, r.rv_matched)
        for r in asof_join(
            left, right, on="k", right_cols=["rid", "rv"], tie_cols=["rid"]
        ).collect()
    }
    assert got == _naive_asof(left_rows, right_rows)


def test_range_join_equals_naive(spark):
    rng = random.Random(13)
    t0 = dt.datetime(2024, 1, 1)
    lower_us, upper_us = -90_000_000, 150_000_000
    left_rows = [
        (rng.randrange(3), t0 + dt.timedelta(seconds=rng.randrange(0, 2000, 30)), i)
        for i in range(80)
    ]
    right_rows = [
        (rng.randrange(3), t0 + dt.timedelta(seconds=rng.randrange(0, 2000, 30)),
         500 + i)
        for i in range(80)
    ]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, rid long")
    got = {
        (r.lid, r.rid_r)
        for r in range_join_bucketed(
            left, right, on="k", lower_us=lower_us, upper_us=upper_us,
            right_cols=["rid"],
        ).collect()
    }
    want = {
        (lid, rid)
        for k, lt, lid in left_rows
        for rk, rt, rid in right_rows
        if rk == k
        and lower_us <= (lt - rt) / dt.timedelta(microseconds=1) <= upper_us
    }
    assert got == want
