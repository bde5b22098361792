"""Golden cases for hourly gap-fill + LOCF."""

import datetime as dt

from cs6300_vectordbs_spark.operators.timeseries import gap_fill_hourly


def test_gap_fill_zero_fills_and_carries_forward(spark):
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    ev = spark.createDataFrame(
        [
            ("a", t(0, 10), 1.0),
            ("a", t(0, 40), 2.0),   # hour 0: n=2 sum=3
            ("a", t(3, 5), 5.0),    # hours 1,2 are gaps; hour 3: n=1 sum=5
            ("b", t(2, 0), 7.0),    # single-hour key: no gaps
        ],
        "event_type string, ts timestamp, value double",
    )
    rows = {
        (r.event_type, r.hour.hour): r
        for r in gap_fill_hourly(ev).collect()
    }
    assert len(rows) == 5  # a: hours 0-3, b: hour 2

    assert (rows[("a", 0)].n_events, rows[("a", 0)].sum_value) == (2, 3.0)
    for h in (1, 2):  # gap hours: zero-filled but LOCF carries 3.0
        r = rows[("a", h)]
        assert (r.n_events, r.sum_value, r.locf_sum) == (0, 0.0, 3.0)
    r3 = rows[("a", 3)]
    assert (r3.n_events, r3.sum_value, r3.locf_sum) == (1, 5.0, 5.0)
    rb = rows[("b", 2)]
    assert (rb.n_events, rb.sum_value, rb.locf_sum) == (1, 7.0, 7.0)


def test_rolling_hourly_trailing_counts(spark):
    import datetime as dt

    from cs6300_vectordbs_spark.operators.timeseries import rolling_hourly

    rows = [("a", dt.datetime(2024, 1, 1, h), n) for h, n in
            [(0, 2), (1, 0), (2, 5), (3, 1)]]
    dense = spark.createDataFrame(
        rows, "event_type string, hour timestamp, n_events long"
    )
    got = {r.hour.hour: r for r in rolling_hourly(dense, window_hours=3).collect()}
    assert [got[h].rolling_events for h in range(4)] == [2, 2, 7, 6]
    assert got[3].rolling_rate == 6 / 3.0


def test_hourly_anomalies_flags_spike(spark):
    import datetime as dt

    from cs6300_vectordbs_spark.operators.timeseries import hourly_anomalies

    # 25h of alternating 4/6 (mean 5, nonzero var), then a 50-count spike
    rows = [
        ("a", dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
         4 if h % 2 else 6)
        for h in range(25)
    ] + [("a", dt.datetime(2024, 1, 2, 1), 50)]
    dense = spark.createDataFrame(
        rows, "event_type string, hour timestamp, n_events long"
    )
    got = sorted(
        hourly_anomalies(dense).collect(), key=lambda r: r.hour
    )
    assert got[-1].is_anomaly and got[-1].z > 3
    # warm-up hours (< 12 baseline rows) are unscored, not flagged
    for r in got[:12]:
        assert r.z is None and not r.is_anomaly
    # ordinary alternating hours are never flagged
    assert not any(r.is_anomaly for r in got[:-1])


class TestSnapshotDiff:
    def test_all_four_statuses(self, spark, tmp_path):
        import datetime as dt

        import __spark_entry__ as m

        def t(h):
            return dt.datetime(2024, 1, 1, h)

        # midpoint of [0h, 10h] is 5h. u1: changed; u2: unchanged;
        # u3: only before mid (removed... impossible in append-only
        # logs EXCEPT when its last event precedes mid and... it still
        # appears in 'new' — so u3 is 'unchanged' by construction);
        # u4: only after mid (added). NULL-ts row must be ignored.
        rows = [
            (1, t(0), 1, "view"), (2, t(10), 1, "purchase"),
            (3, t(1), 2, "click"), (4, t(9), 2, "click"),
            (5, t(2), 3, "view"),
            (6, t(8), 4, "click"),
            (7, None, 5, "view"),
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = {
            r.user_id: r.status
            for r in m.q_snapshot_diff(spark, str(tmp_path)).collect()
        }
        assert out == {
            1: "changed", 2: "unchanged", 3: "unchanged", 4: "added"
        }

    def test_tie_break_on_event_id(self, spark, tmp_path):
        import datetime as dt

        import __spark_entry__ as m

        ts = dt.datetime(2024, 1, 1, 0)
        ts2 = dt.datetime(2024, 1, 1, 10)
        rows = [
            (1, ts, 1, "a"), (2, ts, 1, "b"),      # same ts: id 2 wins
            (3, ts2, 1, "x"), (4, ts2, 1, "y"),    # same ts: id 4 wins
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = m.q_snapshot_diff(spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.old_state, r.new_state, r.status) == ("b", "y", "changed")
