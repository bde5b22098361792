"""Shared plan-shaping helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
