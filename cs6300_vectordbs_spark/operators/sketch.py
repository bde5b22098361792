"""Deterministic distinct-count sketch (KMV / bottom-k) — the
cardinality-estimation primitive a 100 TB profiling pass needs when an
exact ``COUNT(DISTINCT)`` shuffle is too expensive (extension surface;
the reference has no sketches).

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is the
production default, but its register layout is engine-internal — no
independent engine can replay it, so it can't be oracle-checked. This
KMV sketch is built from portable md5 arithmetic: hash every value to
a uniform double in (0, 1], keep the k smallest DISTINCT hashes, and
estimate N ≈ (k-1) / h_(k) (Bar-Yossef et al. 2002, the KMV
estimator). Every step is reproducible bit-for-bit in any engine with
md5 — DuckDB runs the identical math as the oracle.

Scale shape: the distinct() is a shuffle on the hash (map-side
partial), then ``ORDER BY h LIMIT k`` — which Spark executes as
TakeOrderedAndProject: each partition keeps only its local k smallest,
so the merge moves O(k × partitions) rows, never the data. The final
aggregate is a scalar. Nothing driver-side until the 1-row result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits; +1 shifts to (0, 2^60] so h is never 0.
_TWO_60 = float(1 << 60)


def md5_uniform(col: Column | str, salt: str = "kmv") -> Column:
    """Portable uniform (0, 1] hash of a column's string form."""
    c = F.col(col) if isinstance(col, str) else col
    h64 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h64 + F.lit(1)) / F.lit(_TWO_60)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: (est_distinct, exact_distinct, rel_err).

    est = (k-1)/h_(k) when ≥k distinct values exist, else the exact
    count (the sketch IS the full distinct set below k). The exact
    column is computed from the same distinct hash set — it is the
    reference the estimate is judged against in tests/oracles; drop it
    for production profiling runs.
    """
    hashes = df.select(md5_uniform(col).alias("h")).distinct()
    topk = hashes.orderBy(F.col("h").asc()).limit(k)
    exact = hashes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    est = topk.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    return (
        est.crossJoin(exact)
        .select(
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("h_k"))
            .alias("est_distinct"),
            F.col("n").alias("exact_distinct"),
        )
        .select(
            "est_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                9,
            ).alias("rel_err"),
        )
    )
