"""Streaming corpus ingestion — the JSONL quarantine path as a
Structured Streaming source.

A production training-data pipeline ingests corpus files as they LAND
(a bucket prefix filling with JSONL shards), not as a one-shot batch;
this module turns sources/ingest.py's one-pass from_json good/bad
split into a file-source stream. The split itself is the SHARED
function (sources/ingest.split_jsonl_lines — stateless, so it works
unchanged on a streaming frame), which is the correctness argument:
the batch run of the identical transformation is the oracle for the
streaming run, the same unified-API contract every other stream twin
in streaming/ uses.

Scale notes: the text file source tracks seen files in the streaming
checkpoint (exactly-once per file); maxFilesPerTrigger bounds
per-micro-batch work; the parse is a stateless map, so the only state
is the file log. Downstream aggregations add their own state
(complete-mode per-source counts are n_sources rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.ingest import split_jsonl_lines


def jsonl_corpus_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    corrupt_col: str = "_corrupt_record",
    max_files_per_trigger: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """File-source streaming read of a JSONL corpus directory.
    Returns ``(good, bad)`` streaming frames with exactly the batch
    :func:`~cs6300_vectordbs_spark.sources.ingest.load_corpus_jsonl`
    semantics (explicit schema required — inference has no streaming
    meaning)."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
        .filter(F.trim("value") != "")
    )
    return split_jsonl_lines(raw, schema, corrupt_col=corrupt_col)
