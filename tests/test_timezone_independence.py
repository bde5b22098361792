"""Regression: date-derived outputs must not depend on the session
timezone the gate harness happens to run with.

The r04 driver red (`cumulative_users`) was this class: a DATE derived
through the session-tz LTZ cast shifts day boundaries under a non-UTC
session, while the DuckDB oracle reads the same parquet as a NAIVE
timestamp. Fix = ``io.read_events`` re-pins ``spark.sql.session.timeZone``
to UTC on every call, making all downstream date math driver-tz-proof.

These tests simulate a hostile gate session (America/New_York — DST,
negative offset) and assert the query outputs are bit-identical to the
UTC run. Keep them cheap: sf0.001, a handful of representative queries
covering each date-math idiom (cast('date'), date_trunc, date_format,
epoch-week arithmetic, window sessionization).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# One query per date-math idiom on the ts surface.
TZ_SENSITIVE = [
    "cumulative_users",     # min(date_format) + running window sum
    "retention_cohorts",    # datediff epoch-week arithmetic on cast('date')
    "events_hourly",        # date_trunc('hour')
    "user_first_events",    # per-user first event ordering by ts
    "partitioned_events",   # hive layout partitioned by derived day
]


def _rows(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_output_identical_under_non_utc_session(spark, name):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    utc = _rows(spark, name)
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        est = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert est == utc


def test_read_events_repins_utc(spark):
    """read_events must leave the session in UTC even if the caller
    (the gate) had set something else."""
    from cs6300_vectordbs_spark.io import read_events

    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    read_events(spark, SF_DIR)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
