"""Bucketed range (interval) join — temporal window matching without
the range-join blowup (extension surface; the reference engine has no
temporal operators).

``range_join_bucketed(left, right, on=k)`` matches every left row to
the right rows of the same key whose timestamp lies in
``[left_ts - upper_us, left_ts - lower_us]`` — "clicks in the 5
minutes before each error", "readings within the calibration window".

Spark-first: a naive ``l.ts BETWEEN r.ts + lo AND r.ts + hi`` join has
no equi-key for the time axis, so Catalyst falls back to a per-key
cartesian — quadratic in events-per-key, dead at 100 TB. Instead,
quantize time into buckets of width W = (upper - lower): a right row
can only match left rows in 2 consecutive buckets, so replicate right
rows to those two bucket ids (2x amplification, constant), equi-join
on (key, bucket) — a plain hash join — and refine with the exact
range predicate. Each (left, right) pair meets at most once (the left
row's bucket is a single value), so no dedup pass is needed.

Shuffle volume: |left| + 2|right| rows on short (key, bucket) keys,
with the usual AQE skew handling — versus unbounded pair output from
the cartesian fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_us: int = 0,
    upper_us: int,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner bucketed range join; see module docstring.

    Matches ``lower_us <= left_ts - right_ts <= upper_us`` (both
    inclusive, microseconds). Returns all left columns plus each right
    payload column with ``suffix``.
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must exceed lower_us")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    width = upper_us - lower_us

    lt = F.unix_micros(F.col(left_ts))
    rt = F.unix_micros(F.col(right_ts))

    l2 = left.withColumn("__bucket", F.floor(lt / width))
    # right row r matches left ts in [rt + lower, rt + upper] — an
    # interval of length W, overlapping at most 2 consecutive buckets.
    r2 = right.select(
        *keys,
        rt.alias("__rt"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        # array_distinct: when the match interval lands inside ONE
        # bucket both candidates coincide — dedupe per-row (a cross-row
        # dropDuplicates would wrongly merge legitimately identical
        # right rows).
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((rt + lower_us) / width),
                    F.floor((rt + upper_us) / width),
                )
            )
        ).alias("__bucket"),
    )

    diff = F.unix_micros(F.col(left_ts)) - F.col("__rt")
    out = (
        l2.join(r2, on=keys + ["__bucket"])
        .filter((diff >= lower_us) & (diff <= upper_us))
        .drop("__bucket", "__rt")
    )
    return out
