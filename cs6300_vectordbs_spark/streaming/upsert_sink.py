"""Streaming upsert sink — the S4/S5 batched-upsert surface
(/root/reference/src/db.py:54-152) as a continuously-maintained table
over a change stream, via ``foreachBatch`` + the engine's batch upsert
operator.

Per micro-batch: merge the batch's changes into the stored table with
``upsert_latest`` (same id-wins-by-version semantics as the batch
path, operators/upsert.py) and atomically swap the result in. The
MERGE SEMANTICS are the engine's; the MATERIALIZATION strategy is the
pluggable part:

  - here (plain parquet, no transactional table format in this
    container): read-merge-rewrite into a versioned directory with an
    atomic rename swap — correct, exactly-once per epoch via the
    epoch_id guard, but O(table) writes per batch;
  - production: the same ``upsert_latest`` frame handed to Delta/
    Iceberg ``MERGE INTO``, which rewrites only touched files — the
    call site changes, the operator and its semantics do not.

Exactly-once: foreachBatch may replay an epoch after failure; replays
re-merge the same batch, and upsert_latest is idempotent (same id +
same version -> same winner), so the table converges regardless.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import upsert_latest
from ..sources.ingest import table_exists


def start_stream_upsert(
    changes: DataFrame,
    table_path: str,
    *,
    id_col: str = "id",
    version_col: str | None = None,
    query_name: str = "stream_upsert",
    checkpoint_location: str | None = None,
    post_merge_hook=None,
):
    """Maintain a parquet table at ``table_path`` from an upsert stream.

    Returns the StreamingQuery; callers trigger/await it. Use with the
    availableNow trigger for drain-then-stop semantics in tests.

    ``checkpoint_location`` makes the query RESTARTABLE: the source
    offsets + the foreachBatch epoch log live there, so a query that
    dies mid-stream resumes from the last committed epoch instead of
    re-reading the world. The commit protocol's crash window — the
    table swap succeeds but the process dies before the checkpoint
    commit — causes that epoch to be REPLAYED on restart; replaying a
    merge through ``upsert_latest`` is idempotent (same ids + same
    versions -> same winners), so the table converges to exactly the
    batch-upsert result. ``post_merge_hook(epoch_id)`` runs after the
    swap and before foreachBatch returns — i.e. inside that crash
    window — and exists so tests can raise there to prove the replay
    path, fault-injection style.
    """
    spark = changes.sparkSession

    if checkpoint_location is not None:
        # Restartable sink: pin the merge parameterization to the
        # checkpoint dir (the table dir is atomically swapped every
        # epoch, so the sidecar lives with the offsets/epoch log it
        # guards). Resuming with a different id/version column would
        # replay committed epochs under different merge semantics.
        from .params_guard import check_params_sidecar, checkpoint_has_progress

        check_params_sidecar(
            checkpoint_location,
            {
                "kind": "stream_upsert",
                "table_path": os.path.abspath(table_path),
                "id_col": id_col,
                "version_col": version_col,
            },
            # OFFSETS are the progress marker, not epoch commits: the
            # table swap lands BEFORE the checkpoint's commits entry,
            # so a crash in that window leaves commits/ empty while the
            # table has already absorbed a merge under the old
            # parameters — a mismatched retry must refuse, not re-pin
            # and replay the epoch under different merge semantics.
            # Offsets are written before any processing, so they cover
            # the whole window; a first run that died before even
            # logging an offset pinned nothing and may re-pin.
            has_progress=checkpoint_has_progress(checkpoint_location),
        )

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if table_exists(spark, table_path):
            base = spark.read.parquet(table_path)
        else:
            base = batch.limit(0)
        merged = upsert_latest(base, batch, id_col, version_col=version_col)
        staged = f"{table_path}__epoch{epoch_id}"
        merged.write.mode("overwrite").parquet(staged)
        old = f"{table_path}__old{epoch_id}"
        if os.path.exists(table_path):
            os.rename(table_path, old)
        os.rename(staged, table_path)
        shutil.rmtree(old, ignore_errors=True)
        if post_merge_hook is not None:
            post_merge_hook(epoch_id)

    writer = (
        changes.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.start()


def run_stream_upsert(
    changes: DataFrame,
    table_path: str,
    *,
    id_col: str = "id",
    version_col: str | None = None,
) -> DataFrame:
    """Drain ``changes`` into the table and return the final state."""
    q = start_stream_upsert(
        changes, table_path, id_col=id_col, version_col=version_col,
    )
    q.awaitTermination()
    spark: SparkSession = changes.sparkSession
    return spark.read.parquet(table_path)
