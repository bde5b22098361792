"""Golden funnel-conversion cases (strict event-time ordering)."""

import datetime as dt

from cs6300_vectordbs_spark.operators.funnel import funnel_conversions


def test_funnel_strict_ordering(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    ev = spark.createDataFrame(
        [
            # user 1: full funnel in order
            (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
            # user 2: click BEFORE view -> stalls at step 1
            (2, t(0), "click"), (2, t(1), "view"), (2, t(2), "purchase"),
            # user 3: view only
            (3, t(0), "view"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r.step: r
        for r in funnel_conversions(ev, ("view", "click", "purchase")).collect()
    }
    assert [got[s].n_users for s in (1, 2, 3)] == [3, 1, 1]
    assert got[2].rate_from_prev == 1 / 3
    assert got[3].rate_from_prev == 1.0
    assert got[3].rate_from_first == 1 / 3
    # user 2's purchase exists but can't count: click never followed view
