"""Streaming incremental dedup — an ingest STREAM of documents probed
against the persisted MinHash-LSH band index (sources/dedup_index.py).

The production shape: a crawler/ingest pipeline emits document batches
continuously; each batch must be checked for near-duplicates against
the existing corpus BEFORE admission, at O(batch) cost. Stream-static:
the index is fixed for the run (periodic index refresh is a separate
compaction job), so state is zero and each micro-batch runs the exact
batch probe plan inside ``foreachBatch`` (driver-side planning is
required for the probe-bucket partition filter).

Per-batch independence: a batch's documents are probed only against
the STATIC index, never against each other (in-batch dups are the
batch ``minhash_lsh_pairs`` job), so the union of micro-batch outputs
is EXACTLY the one-shot ``probe_dedup_index`` result over the same
documents, independent of micro-batching — the stream shares the batch
query's full value-hash oracle.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def read_doc_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over the documents table."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def probe_doc_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_path: str,
    *,
    min_jaccard: float = 0.3,
    out_path: str | None = None,
    checkpoint_location: str | None = None,
    post_batch_hook=None,
) -> DataFrame:
    """Drain the document stream against the stored dedup index and
    return the accumulated (new_id, indexed_id, est_jaccard) rows.

    EXACTLY-ONCE OUTCOME: each micro-batch writes its probe result to
    its own ``batch=<id>`` directory with overwrite — batch ids are
    stable across restarts from the same checkpoint, so a crash
    between the sink write and the checkpoint commit replays the batch
    into the SAME directory (idempotent overwrite), never duplicating
    rows. Pass ``checkpoint_location`` to make the drain resumable
    (the crash-recovery contract, proven in
    tests/test_stream_recovery.py); omit it for per-drain scratch.
    ``post_batch_hook(batch_id)`` fires after the sink write and
    before the checkpoint commit — the crash window — for fault
    injection.

    When no checkpoint is given, ``out_path`` must be empty or
    nonexistent (a dirty directory under a FRESH offset log would
    double-count); with a checkpoint, pre-existing ``batch=`` dirs are
    exactly the committed prefix a restart resumes over.
    """
    import os

    from ..sources.dedup_index import probe_dedup_index

    if checkpoint_location is not None and out_path is None:
        # A resumable drain with a throwaway output dir would be a
        # correctness bug, not a convenience: the checkpoint skips
        # already-committed batches on restart, so their rows exist
        # ONLY in the previous call's temp dir — a fresh mkdtemp here
        # would silently drop them from the returned result.
        raise ValueError(
            "checkpoint_location requires an explicit out_path: "
            "committed batches are replayed into (not re-appended to) "
            "the SAME output directory across restarts"
        )
    if (
        checkpoint_location is None
        and out_path is not None
        and os.path.isdir(out_path)
        and os.listdir(out_path)
    ):
        raise ValueError(
            f"out_path {out_path!r} is non-empty; refusing to overwrite"
        )
    out = out_path or tempfile.mkdtemp(prefix="dedup_probe_")
    ckpt = checkpoint_location or tempfile.mkdtemp(prefix="dedup_probe_ckpt_")
    if checkpoint_location is not None:
        # Resumable drain: pin the parameterization BOTH ways.
        # Out-dir sidecar: pre-existing batch= dirs are trusted as the
        # committed prefix ONLY when they were produced by this same
        # (index, threshold, checkpoint) triple — anything else raises
        # instead of mixing. Checkpoint-dir sidecar: the checkpoint
        # pins its out_path, so resuming an old checkpoint against a
        # FRESH output directory (whose own sidecar would just re-pin)
        # raises instead of silently skipping every already-committed
        # batch — those rows live in the ORIGINAL out dir, and the new
        # one would underreport.
        from .params_guard import (
            check_params_sidecar,
            checkpoint_has_progress,
            drain_has_progress,
        )

        params = {
            "kind": "dedup_probe",
            "index_path": os.path.abspath(index_path),
            "min_jaccard": float(min_jaccard),
            "checkpoint_location": os.path.abspath(checkpoint_location),
        }
        # a sidecar with zero committed progress pins nothing —
        # a retry after an immediately-failed first run may re-pin
        check_params_sidecar(
            out, params, has_progress=drain_has_progress(out)
        )
        check_params_sidecar(
            checkpoint_location,
            {**params, "out_path": os.path.abspath(out)},
            has_progress=checkpoint_has_progress(checkpoint_location),
        )

    def handle(batch: DataFrame, bid: int) -> None:
        if batch.take(1):
            res = probe_dedup_index(
                spark, batch, index_path, min_jaccard=min_jaccard
            )
            res.write.mode("overwrite").parquet(f"{out}/batch={bid}")
        if post_batch_hook is not None:
            post_batch_hook(bid)

    try:
        (
            docs_stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        if checkpoint_location is None:
            # Per-drain scratch (each call is a fresh run); never leak.
            shutil.rmtree(ckpt, ignore_errors=True)
    if not (
        os.path.isdir(out)
        and any(e.startswith("batch=") for e in os.listdir(out))
    ):
        # No micro-batch produced rows — there is no parquet footer to
        # read. Any OTHER read failure below must propagate: swallowing
        # it would report "no duplicates" for admitted dup documents.
        return spark.createDataFrame(
            [], "new_id bigint, indexed_id bigint, est_jaccard double"
        )
    # drop the partition-discovered `batch` column: it is commit
    # bookkeeping, not part of the result contract
    return spark.read.parquet(out).select(
        "new_id", "indexed_id", "est_jaccard"
    )
