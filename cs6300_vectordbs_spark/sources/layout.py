"""Z-order (Morton-curve) file layout — multi-dimensional skipping.

Partitioning prunes on ONE low-cardinality column
(``partitioned_events``); bucketing co-locates ONE join key
(``bucketed_revenue``). When serving filters range over TWO OR MORE
continuous dimensions at once (user x time is the classic), neither
helps: a file sorted by user spans all time, a file sorted by time
spans all users, and every parquet row-group's (min, max) stats cover
the full domain of the other dimension — nothing skips. Interleaving
the bits of both dimensions' ranks into one Morton key and
range-partitioning + sorting on it gives every file a small rectangle
of the (user, time) plane, so the engine's ordinary row-group
min/max pruning (``spark.sql.parquet.filterPushdown``, on by default)
skips on BOTH predicates with no reader-side changes at all. This is
the same layout trick Delta's OPTIMIZE ZORDER BY applies; here it is
plain parquet + pure column expressions.

Scale shape: one bounded agg collects the per-column (min, max) —
2 x n_cols scalars of index metadata, the centroid-collect license —
then the z-value is a single parsed expression (shift/and/or integer
math, whole-stage codegen), and ``repartitionByRange`` is a sampled
range exchange with no single-reducer hotspot. Cost is one shuffle of
the dataset — the same price as any sort-based layout job.

The transform is LOSSLESS row-wise: layout changes which file a row
lands in, never the row. The driver-checked query
(``zordered_events``) hashes a served aggregate against the raw-table
oracle to pin exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(bucket_cols: list[str], bits: int = 12) -> Column:
    """Morton interleave of pre-bucketed non-negative int columns
    (each in ``[0, 2^bits)``) into one bigint, as ONE parsed
    expression: bit i of column c lands at position
    ``i * n_cols + c``. Pure integer ops — deterministic in any
    engine, friendly to whole-stage codegen."""
    n = len(bucket_cols)
    terms = []
    for c, name in enumerate(bucket_cols):
        for i in range(bits):
            terms.append(
                f"shiftleft(shiftright(`{name}`, {i}) & 1, {i * n + c})"
            )
    return F.expr(" | ".join(terms))


def bucketize(col: Column, vmin: float, vmax: float, bits: int) -> Column:
    """Map a numeric column to an integer rank in ``[0, 2^bits)`` by
    linear scaling over the observed [vmin, vmax] (degenerate domains
    collapse to bucket 0)."""
    top = (1 << bits) - 1
    if vmax <= vmin:
        return F.lit(0).cast("bigint")
    scaled = (col.cast("double") - float(vmin)) * (
        float(top) / (float(vmax) - float(vmin))
    )
    return F.least(
        F.greatest(F.floor(scaled).cast("bigint"), F.lit(0)),
        F.lit(top),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    by: list[str],
    *,
    bits: int = 12,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet files clustered on the Morton curve of
    the ``by`` columns (numeric; timestamps pass through ``unix_micros``
    first by the caller). Files = range slices of the z-key; rows
    inside each file are z-sorted so row-group stats are tight on
    every ``by`` dimension."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn{i}") for i, c in enumerate(by)],
        *[F.max(c).cast("double").alias(f"mx{i}") for i, c in enumerate(by)],
    ).collect()[0]
    bcols = []
    out = df
    for i, c in enumerate(by):
        bname = f"__zb{i}"
        out = out.withColumn(
            bname,
            bucketize(F.col(c), stats[f"mn{i}"], stats[f"mx{i}"], bits),
        )
        bcols.append(bname)
    out = out.withColumn("__z", zorder_key(bcols, bits))
    (
        out.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *bcols)
        .write.mode(mode)
        .parquet(path)
    )
