"""Hypertable-style time-series densification (gap-fill + LOCF).

TimescaleDB's ``time_bucket_gapfill`` / ``locf`` re-expressed as pure
DataFrame ops: bucket events into hours, then *densify* each key's
timeline — every hour between a key's first and last observation gets a
row, with zero-filled counts and last-observation-carried-forward
values. Needed by any monitoring/feature pipeline that feeds models
expecting a dense regular grid.

Scale shape (100 TB of events): the only pass over the raw events is
the bucketing aggregate — map-side partial, shuffle on (key, hour),
which is the aggregate's natural key. Everything after operates on the
aggregated grid (|keys| x |hours| rows — thousands of times smaller).
The dense spine is built by exploding ``sequence(min_hour, max_hour)``
per key — no driver-side loop, no cross join against a calendar table.
LOCF is one window (partition by key, order by hour), again on the
tiny grid, never on raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rolling_hourly(
    dense: DataFrame,
    window_hours: int = 24,
    *,
    key_col: str = "event_type",
    hour_col: str = "hour",
    count_col: str = "n_events",
) -> DataFrame:
    """Trailing moving aggregate over an (already gap-filled) grid.

    Requires a DENSE grid (one row per key per hour — the output of
    :func:`gap_fill_hourly`): on a dense grid "last N rows" IS "last N
    hours", so a plain ROWS frame works and no range-join is needed.

    Deliberately aggregates the INTEGER count, not the float sum:
    engines disagree on sliding-window float summation order (Spark
    re-accumulates per frame, DuckDB uses a segment tree), but integer
    sums are associative — so `rolling_events` is exact in any engine
    and `rolling_rate` (one IEEE divide by the window size) is too.

    Scale: one window per key timeline, partitioned by key — the grid
    is |keys| x |hours|, thousands of times smaller than raw events.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(hour_col)
        .rowsBetween(-(window_hours - 1), Window.currentRow)
    )
    return dense.select(
        key_col,
        hour_col,
        F.col(count_col),
        F.sum(count_col).over(w).cast("bigint").alias("rolling_events"),
        (
            F.sum(count_col).over(w).cast("double") / float(window_hours)
        ).alias("rolling_rate"),
    )


def hourly_anomalies(
    dense: DataFrame,
    baseline_hours: int = 24,
    z_thresh: float = 3.0,
    *,
    key_col: str = "event_type",
    hour_col: str = "hour",
    count_col: str = "n_events",
    min_baseline: int = 12,
) -> DataFrame:
    """Trailing z-score anomaly flags on a dense hourly grid.

    Each hour's count is scored against the trailing ``baseline_hours``
    window EXCLUDING itself (a spike must not inflate its own
    baseline). Requires the dense output of :func:`gap_fill_hourly` —
    on a gapped grid "previous N rows" silently skips the quiet hours,
    which are exactly the signal.

    Engine-exactness: the window aggregates are INTEGER sums
    (sum, sum-of-squares, count), which are associative — immune to
    the float-summation-order differences between engines' sliding
    windows. mean/variance/z are then plain scalar expressions of
    those exact integers, identical everywhere:
    ``var = (sumsq - n*mean^2) / (n-1)``, ``z = (x-mean)/sqrt(var)``.

    z is NULL (not flagged) when the baseline has fewer than
    ``min_baseline`` rows or zero variance.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(hour_col)
        .rowsBetween(-baseline_hours, -1)
    )
    x = F.col(count_col).cast("double")
    n = F.count(count_col).over(w).cast("double")
    s = F.sum(count_col).over(w).cast("double")
    sq = F.sum(F.col(count_col) * F.col(count_col)).over(w).cast("double")
    mean = s / n
    var = (sq - n * mean * mean) / (n - F.lit(1.0))
    z = F.when(
        (n >= float(min_baseline)) & (var > 0.0),
        (x - mean) / F.sqrt(var),
    )
    return dense.select(
        key_col,
        hour_col,
        F.col(count_col),
        z.alias("z"),
        F.coalesce(F.abs(z) >= z_thresh, F.lit(False)).alias("is_anomaly"),
    )


def gap_fill_hourly(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Dense per-key hourly grid over each key's observed span.

    Returns (key_col, hour, n_events, sum_value, locf_sum):
    - ``n_events`` / ``sum_value`` zero-filled where the hour is empty
    - ``locf_sum``: last non-null hourly sum carried forward (the
      hour's own sum where present)

    ``sum_value`` is a shuffled float aggregate, so it is rounded to
    9 dp at the aggregate (before LOCF) per the cross-engine policy.
    """
    agg = (
        events.groupBy(
            F.col(key_col).alias("__k"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 9).alias("sum_value"),
        )
    )
    spans = agg.groupBy("__k").agg(
        F.min("hour").alias("__h0"), F.max("hour").alias("__h1")
    )
    dense = spans.select(
        "__k",
        F.explode(
            F.sequence("__h0", "__h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(agg, ["__k", "hour"], "left")
        .select(
            F.col("__k").alias(key_col),
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            F.last("sum_value", ignorenulls=True).over(w).alias("locf_sum"),
        )
    )


def state_history(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """SCD2-style state history: collapse each key's event stream into
    change intervals ``(key, state, valid_from, valid_to, n_events)``
    — the slowly-changing-dimension type-2 shape every warehouse uses
    for snapshot lineage, built from an append-only event log.

    A row opens a new interval when its state differs from the
    previous event's state (lag over (key) ordered by (ts, tie));
    ``valid_to`` is the next interval's start (NULL for the open
    interval — the standard "current row" marker) and ``n_events``
    counts the events collapsed into the interval.

    Plan: two windows over the SAME (key, ts, tie) ordering — Spark
    plans one Exchange + one Sort and reuses them for both window
    frames — then a groupBy on (key, interval-start) that the window
    partitioning already co-locates. One shuffle total, keyed by the
    entity id; no global ordering anywhere. The tie column makes the
    order total, so the intervals are deterministic in any engine.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    marked = events.select(
        key_col, ts_col, tie_col, state_col,
        F.when(
            F.lag(state_col).over(w).isNull()
            | (F.lag(state_col).over(w) != F.col(state_col)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("__chg"),
    ).withColumn(
        "__run",
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = marked.groupBy(key_col, "__run").agg(
        F.min(ts_col).alias("valid_from"),
        # every row in a run shares one state by construction; min() is
        # the deterministic way to say "that state" in any engine
        F.min(state_col).alias("state"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col("__run").asc())
    return runs.select(
        key_col,
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )
