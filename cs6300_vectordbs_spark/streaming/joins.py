"""Stream-stream interval join — Spark's watermarked two-stream join
as an engine operator (extension surface; the reference has no
streaming). The streaming twin of the batch bucketed range join
(operators/interval.py): match right-stream rows whose event time lies
in ``[left_ts - upper_us, left_ts - lower_us]`` for the same key.

Semantics/state: both sides carry watermarks and the join condition
bounds event-time distance, so Spark derives exactly how long each
side's rows must be buffered (state TTL = watermark + interval span) —
state is bounded, append-mode output emits each matched pair once.

Determinism: with the availableNow trigger and a single input file per
side the whole table joins in one micro-batch, so the emitted pair set
equals the batch inner join — giving the streaming operator a full
value-hash SQL oracle (same pattern as the sessionization stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_us: int = 0,
    upper_us: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join on key + time interval.

    Right columns are prefixed ``r_`` in the output (both sides often
    derive from the same source schema). Matches
    ``lower_us <= left_ts - right_ts <= upper_us``, both inclusive —
    identical semantics to operators/interval.range_join_bucketed.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.select(
        [F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withWatermark(f"r_{right_ts}", watermark)

    diff = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(f"r_{right_ts}"))
    cond = (
        (F.col(on) == F.col(f"r_{on}"))
        & (diff >= F.lit(lower_us))
        & (diff <= F.lit(upper_us))
    )
    return l.join(r, cond, "inner")
