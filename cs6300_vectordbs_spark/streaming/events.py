"""Structured Streaming ingest of the ``events`` table (extension —
the reference has no streaming surface; SURVEY.md §1.4 marks this as
driver-testdata-motivated new capability).

Design: the SAME logical transformation serves batch and streaming —
``windowed_event_counts`` takes either a static or a streaming
DataFrame (Spark's unified API), so the batch run IS the correctness
oracle for the streaming run (exactly-once semantics with availableNow
trigger reproduce the batch result).

Scale notes: tumbling-window groupBy keys are (window, event_type) —
low cardinality, heavy map-side combine; the 10-minute watermark bounds
state; state store is RocksDB-backed on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Works on both static and streaming inputs; the watermark is only
    attached on streaming inputs (it is a no-op requirement otherwise).
    """
    ev = events
    if ev.isStreaming:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("double")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_counts_batch(
    spark: SparkSession, sf_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Batch twin over the parquet events table — the oracle-checkable
    entry (date_trunc semantics of a tumbling window on whole units)."""
    from ..io import read_events

    return windowed_event_counts(read_events(spark, sf_dir), window)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source streaming read of the events table, with the same
    ``ts`` normalization as io.read_events (nanos-as-bigint or NTZ
    micros, depending on how the testdata was written)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source requires a DIRECTORY; select just the
    # events file out of the shared testdata dir with a glob filter.
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from ..io import normalize_ts

    return normalize_ts(df)


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str = "events_counts",
    output_mode: str = "complete",
) -> "DataFrame":
    """Drain a (finite) stream with the availableNow trigger into an
    in-memory table; returns nothing until awaitTermination completes.
    Complete mode for windowed aggregations (state is small); append
    mode for arbitrary stateful operators (applyInPandasWithState)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dedup_events_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "36500 days"
) -> DataFrame:
    """At-least-once delivery dedup: two file-stream reads of the same
    events source are unioned (every event delivered exactly twice —
    the worst case a redelivering broker produces), then
    ``dropDuplicatesWithinWatermark`` restores exactly-once on
    event_id.

    Unlike plain ``dropDuplicates``, the *WithinWatermark* form EVICTS
    per-key state once the watermark passes a key's event time — on an
    unbounded 100 TB/day stream that is the difference between bounded
    RocksDB state and OOM. The huge default watermark here makes the
    drained result deterministic (nothing evicted mid-drain), which is
    what lets the batch table be the value-hash oracle.
    """
    a = read_events_stream(spark, sf_dir)
    b = read_events_stream(spark, sf_dir)
    doubled = a.unionByName(b)
    return doubled.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "3 hours",
    slide: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """SLIDING-window counts + value sums per event_type.

    ``F.window(ts, window, slide)`` replicates each row into
    window/slide overlapping windows via a generator BEFORE the
    aggregate, so partial (map-side) aggregation still applies and the
    shuffle moves at most replication x |groups| rows. State in the
    streaming case is bounded by the watermark: windows older than
    (watermark + window) are finalized and evicted. Works on both
    static and streaming inputs — the unified-API twin pattern used by
    windowed_event_counts.
    """
    ev = events
    if ev.isStreaming:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("double")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def enriched_event_stats(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join + per-(segment, type) aggregate.

    The static dimension is BROADCAST to every task, so the stream
    never shuffles for the join and the join itself is STATELESS (each
    micro-batch probes the same built hash table — no watermark, no
    state store growth; contrast with the stream-stream interval join
    in streaming/joins.py). The aggregate keys are low-cardinality ->
    map-side combine collapses each micro-batch before the shuffle.
    Unified batch/stream: the batch run is the value-hash oracle.
    """
    dim = customers.select("c_custkey", "c_mktsegment")
    joined = events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"]
    )
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("double")).alias("sum_value"),
    )
