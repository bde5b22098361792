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


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with ``ts`` normalized to a microsecond TIMESTAMP.

    Some scale factors store ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark rejects outright; ``nanosAsLong`` reads those as bigint
    nanoseconds, which we floor-divide to micros — the same truncation
    DuckDB applies casting TIMESTAMP_NS to TIMESTAMP, so oracles that
    ``ts::TIMESTAMP`` agree exactly. Files already in micros are
    unaffected by the conf.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if df.schema["ts"].dataType.simpleString() == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
