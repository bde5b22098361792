"""Shared plan-shaping helpers for operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def no_pushdown(col: Column) -> Column:
    """Wrap a column so filters referencing it are NOT pushed down
    through its projection (guide §4.4's duplication fix, applied to
    built-in expressions).

    Catalyst substitutes a filter's aliases and pushes the predicate
    below the projection — for a threshold filter over an expensive
    projected expression sitting directly on a join, the whole
    expression lands in the JOIN CONDITION, where it is evaluated
    per candidate pair on the interpreted predicate path AND re-evaluated
    in the projection for survivors. Measured on the IVF near-dup
    self-join at sf0.1: 4.5 s with the pushed 64-term cosine vs 0.17 s
    when the condition stays out of the join (r09).

    The wrapper is ``CASE WHEN spark_partition_id() >= 0 THEN col`` —
    always true, so the VALUE is bit-identical, but spark_partition_id
    is non-deterministic, which Catalyst refuses to push past. Cost:
    one context read per row.
    """
    return F.when(F.spark_partition_id() >= 0, col)


def spread(df: DataFrame) -> DataFrame:
    """Repartition a too-few-partitions input up to the cluster's default
    parallelism before heavy per-row work (shingling, multi-way hashing,
    vectorized UDF blocks).

    Small inputs arrive as 1-2 parquet splits, which would serialize all
    that compute on as many cores; at scale the input already has >=
    parallelism splits and this is a no-op — so the shuffle cost is only
    ever paid when the data is small enough for it to be free.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
