"""Upsert / merge semantics without a transactional table format.

Reference V5: ``collection.upsert(ids, ...)`` (/root/reference/src/db.py:82-86)
and ``index.upsert(vectors=...)`` (/root/reference/src/db.py:144) —
insert-or-replace by id, delegated to the stores.

Spark-first: with Delta/Iceberg this is ``MERGE INTO``; on plain
parquet the equivalent is union + keep-latest-per-key via max_by (a
single hash aggregation — cheaper than the window+filter formulation,
no sort, map-side partial aggregation kicks in). At 100 TB, partition
the table by a load-time column so the merge only rewrites touched
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str | None = None,
) -> DataFrame:
    """Insert-or-replace rows of ``updates`` into ``base`` by ``key``.

    With ``version_col``, the row with the max version per key wins
    (ties: updates win). Without, updates always win over base.
    Output schema == input schema.
    """
    cols = base.columns
    if updates.columns != cols:
        updates = updates.select(*cols)

    # priority: updates beat base; version_col beats priority if given.
    b = base.withColumn("__prio", F.lit(0))
    u = updates.withColumn("__prio", F.lit(1))
    both = b.unionByName(u)

    # Ordering fields get reserved aliases so the payload never contains
    # a duplicate field name (version_col may also be a payload column).
    order_keys = [F.col("__prio").alias("__ord_prio")]
    if version_col is not None:
        order_keys = [
            F.col(version_col).alias("__ord_version"),
            F.col("__prio").alias("__ord_prio"),
        ]

    payload = F.struct(*order_keys, *[F.col(c) for c in cols if c != key])
    picked = both.groupBy(key).agg(F.max(payload).alias("__p"))
    return picked.select(
        key, *[F.col(f"__p.{c}") for c in cols if c != key]
    ).select(*cols)


def idempotent_load_needed(
    spark, table_path: str, expected_count: int
) -> bool:
    """Reference S8 (/root/reference/src/chroma.py:81-87): skip ingest
    when the target already holds the expected row count."""
    try:
        return spark.read.parquet(table_path).count() != expected_count
    except Exception:
        return True
