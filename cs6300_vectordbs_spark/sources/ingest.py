"""Ingestion sources and persistent sinks (reference S1-S6, S9).

The reference loads the whole CSV into driver memory with
``csv.DictReader`` (/root/reference/src/db.py:16-51), then pushes
client-side batches into Chroma (5,000/batch, src/db.py:69-90) or
Pinecone (100/batch, src/db.py:115-151). Spark-first equivalents:

  - ``load_corpus_csv``: distributed header CSV scan with explicit
    projection/rename map and a dense ``movie-%06d`` row id (S1-S3,
    S2/F6). Never materializes on the driver; Catalyst prunes unused
    CSV columns.
  - ``write_table``: parquet sink (S4/S5's persistence half; the
    embedding half is functions/embed.py). "Batching" is partitioning —
    control file count with ``repartition``; partition columns give
    partition pruning on read.
  - ``create_table_if_absent`` / ``table_exists``: S9's
    create-if-absent index/collection lifecycle.
  - ``read_query_cache`` / ``append_query_cache``: S6 — the reference's
    one-query-per-line text cache (/root/reference/src/queries.py:421-433).

Upsert (V5) and the idempotent-load guard (S8) live in operators/upsert.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Reference column map (/root/reference/src/db.py:36-48): CSV header ->
# engine column. `year` stays a string, matching the reference.
MOVIE_COLUMN_MAP: dict[str, str] = {
    "Plot": "text",
    "Title": "title",
    "Release Year": "year",
    "Director": "director",
    "Cast": "cast",
    "Genre": "genre",
    "Origin/Ethnicity": "origin",
    "Wiki Page": "wiki_page",
}


def load_corpus_csv(
    spark: SparkSession,
    path: str,
    column_map: dict[str, str] | None = None,
    id_prefix: str = "movie",
    *,
    multi_line: bool = True,
    null_value: str = "\\N",
) -> DataFrame:
    """S1-S3: header CSV scan + projection/rename + dense row id.

    The id is ``{prefix}-%06d`` by order of appearance of the first
    projected column (the reference enumerates file order, which has no
    distributed meaning — a stable sort key replaces it). The global
    row_number sort is a one-off ingest cost; steady-state reads hit the
    parquet copy written by ``write_table``.

    SCALE NOTE on ``multi_line``: True (the default, and the lossless
    choice for RFC-4180 corpora whose quoted fields may embed
    newlines — the Wikipedia plots file does) makes each CSV FILE a
    single split, so read parallelism = file count, not byte ranges.
    A corpus known to be one-record-per-line should pass
    ``multi_line=False`` to restore splittable byte-range reads — at
    100 TB that is the difference between one task per 128 MB and one
    task per (possibly huge) file.

    FIDELITY NOTE: the reference's DictReader (db.py:36) yields ``''``
    for an empty field, never None, and preserves interior whitespace.
    Spark's CSV defaults diverge (empty → null, values trimmed), so
    the reader pins ``emptyValue=''`` + no-trim and reserves the
    ``null_value`` sentinel (default the conventional ``\\N``) as the
    only spelling that parses to SQL NULL — empty string, whitespace,
    and NULL all survive a roundtrip distinctly (see q_csv_ingest's
    matching writer options).
    """
    cmap = column_map or MOVIE_COLUMN_MAP
    df = (
        spark.read.option("header", True)
        .option("multiLine", multi_line)
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("emptyValue", "")
        .option("nullValue", null_value)
        .csv(path)
    )
    cols = [F.col(src).alias(dst) for src, dst in cmap.items() if src in df.columns]
    out = df.select(*cols)
    order_col = list(cmap.values())[0]
    w = Window.orderBy(F.col(order_col))
    return out.withColumn(
        "id", F.format_string(f"{id_prefix}-%06d", F.row_number().over(w))
    )


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S4: persistent columnar sink. At scale, pass ``partition_by`` on
    a low-cardinality column (date, source) for partition pruning."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def table_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def create_table_if_absent(
    spark: SparkSession, path: str, df: DataFrame
) -> DataFrame:
    """S9: write ``df`` to ``path`` only if nothing is there; return the
    (existing or new) table. The reference's get_or_create_collection
    (/root/reference/src/chroma.py:74-78)."""
    if not table_exists(spark, path):
        write_table(df, path, mode="overwrite")
    return spark.read.parquet(path)


def read_query_cache(spark: SparkSession, path: str) -> DataFrame:
    """S6 read: one query per line -> (query string)."""
    return spark.read.text(path).select(F.col("value").alias("query"))


def append_query_cache(df: DataFrame, path: str, query_col: str = "query") -> None:
    """S6 write: append newly generated queries to the cache file."""
    df.select(F.col(query_col).cast("string")).write.mode("append").text(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    by: str,
    n_buckets: int = 8,
    *,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed persistent sink (Hive-style bucketing).

    THE shuffle-elimination tool for repeated big-to-big joins: two
    tables bucketed by the same key into the same bucket count are
    co-partitioned ON DISK, so every future equi-join on that key reads
    matching buckets side by side with NO Exchange — at 100 TB the
    shuffle being skipped is the dominant cost of the join. Pay the
    partitioning once at write time, reuse it on every read.

    ``sort_by`` additionally orders rows within each bucket file so the
    join can sort-merge without an in-memory sort.

    Bucketing metadata lives in the session catalog (``saveAsTable`` —
    plain ``.parquet(path)`` cannot record bucket info), so readers use
    ``spark.table(table)``.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, by)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def load_corpus_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    *,
    column_map: dict[str, str] | None = None,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSONL corpus source — the dominant training-data interchange
    format. Returns ``(good, bad)``: parsed rows and raw corrupt lines.

    Scale rules this encodes:
      - ALWAYS pass an explicit ``schema`` ("doc_id bigint, text
        string, ..."): schema inference is a full extra pass over the
        data (at 100 TB, reading everything twice before the job
        starts). Inference is allowed only when schema is None.
      - PERMISSIVE corrupt handling: malformed lines land in
        ``corrupt_col`` instead of failing the job (one broken line in
        a billion must not kill the ingest); callers quarantine ``bad``
        to a reject sink and continue.
      - ``column_map`` projects/renames at the scan, so Catalyst prunes
        unread JSON fields (Jackson skips unparsed subtrees).
    """
    if schema is not None:
        # text scan + from_json: one pass, no inference, and corrupt
        # lines are simply rows where the struct parses to NULL —
        # avoiding the JSON source's restriction on querying the
        # corrupt-record column from a raw scan (which would force a
        # cache of the whole parse).
        raw = spark.read.text(path).filter(F.trim("value") != "")
        good, bad = split_jsonl_lines(raw, schema, corrupt_col=corrupt_col)
    else:
        # Inference path (full extra read — small/interactive use
        # only): infer the schema, then run the SAME text+from_json
        # split as the explicit-schema path. No caching of the parse
        # (the corrupt-column-only restriction applies to the raw JSON
        # scan, not to from_json) and one code path for the split.
        inferred = spark.read.option("mode", "PERMISSIVE").json(path)
        fields = [f for f in inferred.schema.fields if f.name != corrupt_col]
        if not fields:
            # Empty or all-corrupt file: nothing parseable to infer —
            # every non-blank line is a reject. The empty `good` frame
            # still carries the CALLER-VISIBLE schema (column_map
            # targets as strings), not the raw text schema, so
            # downstream selects on mapped columns behave identically
            # to every other path (r03 advisory).
            raw = spark.read.text(path).filter(F.trim("value") != "")
            if column_map:
                empty = raw.limit(0).select(
                    *[
                        F.col("value").cast("string").alias(dst)
                        for dst in column_map.values()
                    ]
                )
            else:
                empty = raw.limit(0).select(F.col("value"))
            return empty, raw.select(F.col("value").alias("raw_line"))
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in fields
        )
        return load_corpus_jsonl(
            spark, path, ddl, column_map=column_map, corrupt_col=corrupt_col
        )
    if column_map:
        missing = [s for s in column_map if s not in good.columns]
        if missing:
            raise KeyError(
                f"column_map source columns not in schema: {missing}"
            )
        good = good.select(
            *[F.col(src).alias(dst) for src, dst in column_map.items()]
        )
    return good, bad


def split_jsonl_lines(
    raw: DataFrame,
    schema: str,
    *,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """The one-pass from_json good/bad split, factored so BATCH
    (:func:`load_corpus_jsonl`) and STREAMING
    (streaming/ingest.jsonl_corpus_stream) ingestion share the exact
    same parse semantics — ``raw`` is a one-column ``value`` frame,
    static or streaming (every op here is stateless)."""
    parsed = raw.select(
        "value",
        F.from_json(
            "value",
            f"{schema}, {corrupt_col} string",
            {"columnNameOfCorruptRecord": corrupt_col},
        ).alias("j"),
    )
    is_bad = F.col("j").isNull() | F.col(f"j.{corrupt_col}").isNotNull()
    bad = parsed.filter(is_bad).select(F.col("value").alias("raw_line"))
    good = parsed.filter(~is_bad).select("j.*").drop(corrupt_col)
    return good, bad


def split_csv_lines(
    raw: DataFrame,
    schema: str,
    *,
    corrupt_col: str = "_corrupt_record",
    header: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Typed-CSV good/bad split — the CSV counterpart of
    :func:`split_jsonl_lines`: a one-column ``value`` frame (static or
    streaming) parsed with ``from_csv`` under PERMISSIVE, malformed
    lines quarantined instead of failing the job. Quarantine covers
    bad typed fields and under-abundant rows (via from_csv's corrupt
    column) AND over-long rows (via an explicit token-arity check —
    PERMISSIVE alone silently DROPS extra tokens, which would hide a
    delimiter bug as truncated data). The arity check applies only to
    QUOTE-FREE lines: a quoted field may legitimately contain commas,
    so quoted lines defer entirely to the parser. ``header`` drops
    ANY line equal to the exact header string — a legitimate data row
    that happens to equal the header text is lost (acceptable here:
    a data row can only equal the header if every typed column parses
    from the header's own labels, which a schema with any non-string
    column precludes). Line-based, so it keeps SPLITTABLE byte-range
    reads — the quarantining scale path next to load_corpus_csv's
    multiLine-lossless path (see that docstring's trade-off note).
    The raw-CSV-source restriction on selecting only the corrupt
    column does not apply to from_csv, same as the JSONL path."""
    from pyspark.sql.types import StructType

    if header is not None:
        raw = raw.filter(F.col("value") != header)
    parsed = raw.select(
        "value",
        F.from_csv(
            "value",
            f"{schema}, {corrupt_col} string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("c"),
    )
    n_fields = len(StructType.fromDDL(schema).fields)
    # limit=-1 keeps trailing empty tokens so "1,a," counts 3, not 2.
    arity_bad = (~F.col("value").contains('"')) & (
        F.size(F.split(F.col("value"), ",", -1)) != F.lit(n_fields)
    )
    is_bad = (
        F.col("c").isNull()
        | F.col(f"c.{corrupt_col}").isNotNull()
        | arity_bad
    )
    bad = parsed.filter(is_bad).select(F.col("value").alias("raw_line"))
    good = parsed.filter(~is_bad).select("c.*").drop(corrupt_col)
    return good, bad


def write_corpus_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    *,
    order_col: str = "doc_id",
    mode: str = "overwrite",
) -> int:
    """Sized-shard corpus export: contiguous ``order_col`` ranges with
    ~``rows_per_shard`` rows per parquet file. Returns the shard count.

    Training loaders want (a) bounded shard sizes (a shard must fit a
    loader worker's memory; tiny shards waste open/seek overhead — the
    small-files problem), and (b) deterministic order-ranged shards so
    a run can be resumed/sampled by shard. ``repartitionByRange`` is a
    sampling-based range exchange (parallel, no single reducer);
    ``maxRecordsPerFile`` caps stragglers from range skew. The count()
    is one cheap metadata-ish pass; at steady state callers track row
    counts in their manifest instead.
    """
    n = df.count()
    shards = max(1, -(-n // rows_per_shard))
    (
        df.repartitionByRange(shards, F.col(order_col))
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )
    return shards


def ensure_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    by: str,
    n_buckets: int = 16,
    *,
    sort_by: str | None = None,
    fingerprint_cols: list[str] | None = None,
    assume_unchanged: bool = False,
) -> None:
    """Create-if-absent bucketed catalog table with content-addressed
    invalidation (the S9 lifecycle applied to the bucketed-layout
    copy): reuse only when the stored fingerprint of the SOURCE frame
    (+ bucket spec) matches; rebuild on any source or spec change.
    The fingerprint lives in the table's TBLPROPERTIES — no side
    files, dropped atomically with the table.

    COST NOTE: the fingerprint is a full-scan aggregate of the source
    frame, paid on EVERY call — the price of content-addressed safety.
    A caller that asserts the corpus has not changed since the last
    build (steady-state serving) passes ``assume_unchanged=True`` to
    reduce the check to a catalog-existence test; the fingerprint
    still guards the first build and any call without the assertion.
    """
    import re

    from .index_common import corpus_fingerprint

    # The table name is interpolated into DDL and joined into a
    # warehouse path below — reject anything but a plain identifier so
    # a crafted name cannot smuggle SQL or escape the warehouse dir.
    if not re.fullmatch(r"[A-Za-z0-9_]+", table):
        raise ValueError(f"invalid table identifier: {table!r}")
    if assume_unchanged and spark.catalog.tableExists(table):
        return
    cols = fingerprint_cols or [by]
    fp = corpus_fingerprint(
        df, cols, {"by": by, "n_buckets": n_buckets, "sort": sort_by or ""}
    )
    if spark.catalog.tableExists(table):
        stored = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        }
        if stored.get("fingerprint") == fp:
            return
        spark.sql(f"DROP TABLE {table}")
    else:
        # In-memory catalog + persistent warehouse: a dead session may
        # have left the managed table's directory behind with no
        # catalog entry. That orphan data is unreachable (bucketing
        # metadata lived only in the catalog) — clear it or
        # saveAsTable fails with LOCATION_ALREADY_EXISTS. A persistent
        # metastore deployment never hits this branch.
        import shutil

        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, by)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)
    fp_sql = fp.replace("'", "''")
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ('fingerprint'='{fp_sql}')"
    )
