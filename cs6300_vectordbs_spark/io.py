"""Table readers over the driver testdata layout (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst gets column
pruning + predicate pushdown + partition pruning for free — the scan
reads only the columns/row-groups a query touches (verify with
``.explain``: PushedFilters / ReadSchema).

Reference parity: replaces the reference's whole-file-into-driver CSV
loader (/root/reference/src/db.py:16-51) with distributed scans that
never materialize on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. ``name`` must be in TABLES."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (with local tz).

    Testdata variants in the wild: parquet TIMESTAMP(NANOS) read as
    bigint via ``nanosAsLong`` (floor-divide to micros — the same
    truncation DuckDB applies casting TIMESTAMP_NS to TIMESTAMP), and
    TIMESTAMP_NTZ micros (isAdjustedToUTC=false), which Structured
    Streaming watermarks reject — cast to TIMESTAMP. The session runs
    in UTC (session.py), so the NTZ→LTZ cast preserves wall-clock and
    DuckDB oracles that read the same file agree exactly.
    """
    from pyspark.sql import functions as F

    kind = df.schema[col].dataType.simpleString()
    if kind == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif kind == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with ``ts`` normalized to a microsecond TIMESTAMP.

    Pins the session timezone to UTC: the gate harness hands us ITS
    SparkSession, whose tz we don't control, and every downstream
    ``cast('date')`` / ``date_trunc`` / ``date_format`` on the
    normalized LTZ column shifts with session tz. DuckDB oracles read
    the same file as a NAIVE timestamp (tz-free), so UTC is the one
    setting under which both engines see identical wall-clock — without
    the pin, a driver running in any other tz flips day/hour boundaries
    on every date-derived output (the r04 ``cumulative_users`` red).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
