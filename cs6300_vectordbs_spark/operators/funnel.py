"""Ordered-funnel conversion analysis over the events stream.

The flagship product-analytics OLAP workload: how many users performed
step 1, then step 2 strictly after it, then step 3 strictly after
that. Strict event-time ordering (not mere co-occurrence) is what
makes this a *funnel* and not three filters.

Scale shape: one aggregate per step, each a map-side-partial
``min(ts)`` keyed by user_id, chained by an equi-join on user_id —
every stage shuffles on the SAME key, so after the first exchange the
co-partitioning is reused (no re-shuffle between steps at equal
partitioning). Per-step state is one timestamp per surviving user;
survivors shrink monotonically down the funnel. No window over the raw
event stream, no collect_list of a user's history (which would OOM on
a power-user key at 100 TB).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest completion time of each funnel prefix.

    Returns one row per user who completed step 1, with columns
    ``t1..tN`` (NULL from the first uncompleted step on). Step k's
    time is the earliest ``steps[k]`` event STRICTLY after ``t(k-1)``.
    """
    out: DataFrame | None = None
    for i, name in enumerate(steps):
        step = i + 1
        ev = events.filter(F.col(type_col) == name).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("__ts")
        )
        if out is None:
            out = ev.groupBy("user_id").agg(F.min("__ts").alias("t1"))
            continue
        nxt = (
            ev.join(
                out.select("user_id", F.col(f"t{step - 1}").alias("__tp")),
                "user_id",
            )
            .filter(F.col("__ts") > F.col("__tp"))
            .groupBy("user_id")
            .agg(F.min("__ts").alias(f"t{step}"))
        )
        # keep users who stalled earlier in the funnel (NULL later steps)
        out = out.join(nxt, "user_id", "left")
    return out


def funnel_conversions(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per funnel step: users reaching it + conversion rates.

    ``rate_from_prev`` / ``rate_from_first`` are single IEEE divides of
    exact integer counts — bit-exact in any engine.
    """
    per_user = funnel_steps(
        events, steps, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    counts = per_user.agg(
        *[
            F.count(f"t{i + 1}").cast("bigint").alias(f"n{i + 1}")
            for i in range(len(steps))
        ]
    )
    rows = None
    for i, name in enumerate(steps):
        n = F.col(f"n{i + 1}")
        prev = F.col(f"n{i}") if i else F.col("n1")
        first = F.col("n1")
        r = counts.select(
            F.lit(i + 1).cast("bigint").alias("step"),
            F.lit(name).alias("event_type"),
            n.alias("n_users"),
            F.when(prev > 0, n.cast("double") / prev.cast("double"))
            .otherwise(F.lit(0.0)).alias("rate_from_prev"),
            F.when(first > 0, n.cast("double") / first.cast("double"))
            .otherwise(F.lit(0.0)).alias("rate_from_first"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows
