"""Skew-resistant (salted) aggregation — the hot-key survival pattern.

At 100 TB a groupBy key with power-law frequency (one user with 10^9
events, one stop-phrase shingle) lands an entire reducer's worth of
rows on one task. AQE's skew-join splitting covers JOINS; skewed
AGGREGATIONS are handled by salting: aggregate in two stages,

  stage 1: groupBy(keys + salt) — the hot key's rows split across
           ``salt_buckets`` reducers, each producing a partial;
  stage 2: groupBy(keys) — merge the <= salt_buckets partials per key.

Only decomposable aggregates survive re-aggregation: sum/count/min/max
directly, avg as sum-of-sums / sum-of-counts. The salt is
``spark_partition_id() % salt_buckets`` — deterministic per task,
costs no entropy source, and cannot change any final value, only the
shuffle distribution. Stage 2's input is at most |distinct keys| x
salt_buckets rows — negligible.

Float caveat: double sums re-associate differently than a single-stage
aggregation, so salted double sums agree only to ~1 ulp x depth; exact
types (int/decimal) are bit-identical. Same policy as any shuffled
float aggregate in this repo: round(9) at comparison boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant groupBy.

    ``specs``: (column, fn, alias) with fn in sum|count|min|max|avg.
    Returns one row per key combination, same values as the direct
    ``df.groupBy(keys).agg(...)`` (float-sum association aside).
    """
    part_aggs: list = []
    finals: list = []
    for col, fn, alias in specs:
        if fn == "avg":
            part_aggs.append(F.sum(col).alias(f"__s_{alias}"))
            part_aggs.append(F.count(col).alias(f"__c_{alias}"))
            finals.append(
                (F.sum(f"__s_{alias}") / F.sum(f"__c_{alias}")).alias(alias)
            )
        elif fn in _MERGE:
            part = F.count(col) if fn == "count" else getattr(F, fn)(col)
            part_aggs.append(part.alias(f"__p_{alias}"))
            finals.append(_MERGE[fn](f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")

    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    partials = salted.groupBy(*keys, "__salt").agg(*part_aggs)
    return partials.groupBy(*keys).agg(*finals)
