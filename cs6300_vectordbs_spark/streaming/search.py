"""Streaming vector search — a query STREAM served against the
persisted IVF index (extension surface; the production serving shape
of the reference's one-query-at-a-time loop,
/root/reference/src/chroma.py:95-102, lifted to a Structured Streaming
micro-batch job).

Design: queries arrive as a file stream; each micro-batch is served by
the same ``search_ivf_index`` plan the batch path uses (broadcast
probes, directory-level partition pruning on probed cells) inside
``foreachBatch`` — the standard Structured Streaming pattern for
serving jobs whose per-batch logic needs driver-side planning (here:
the probed-cell IN-filter). Because per-query results are independent,
the union of micro-batch outputs is EXACTLY the batch result over the
same query set, so the batch query shares its full value-hash oracle
with this stream.

Scale notes: the index is static (stream-static), state is zero, and
each micro-batch costs O(probed cells + queries x k). Results append
to a parquet sink — at production scale that sink is the serving log
the latency/recall metrics (operators/metrics_ir.py) aggregate over.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_query_stream(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream of the query batch (first ``n_queries`` ids
    of the embeddings table) in (query_id, query_vec) shape."""
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
        .filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )


def serve_query_stream(
    spark: SparkSession,
    queries_stream: DataFrame,
    index_path: str,
    k: int = 5,
    *,
    dim: int,
    n_probe: int = 4,
    exclude_self: bool = False,
    out_path: str | None = None,
    checkpoint_location: str | None = None,
    post_batch_hook=None,
) -> DataFrame:
    """Drain the query stream against the stored index (availableNow)
    and return the full result set.

    Each micro-batch runs the batch serving plan via ``foreachBatch``
    and writes to its own ``batch=<id>`` directory with overwrite —
    EXACTLY-ONCE OUTCOME: batch ids are stable across restarts from
    the same checkpoint, so a crash between sink write and checkpoint
    commit replays into the same directory (idempotent overwrite),
    never duplicating result rows. Result rows are
    (query_id, rank, id, sim, dist) — identical to the batch
    ``search_ivf_index`` output for the same query set, independent of
    micro-batching AND of crash/restart placement (proven in
    tests/test_stream_recovery.py). Pass ``checkpoint_location`` to
    make the drain resumable; omit for per-drain scratch.
    ``post_batch_hook(batch_id)`` fires inside the crash window (after
    the sink write, before the checkpoint commit) for fault injection.

    Without a checkpoint, ``out_path`` must be empty or nonexistent
    (dirty data under a fresh offset log would double-count); with
    one, existing ``batch=`` dirs are the committed prefix a restart
    resumes over.
    """
    import os

    from ..sources.vector_index import search_ivf_index

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
    out = out_path or tempfile.mkdtemp(prefix="ivf_serve_")
    ckpt = checkpoint_location or tempfile.mkdtemp(prefix="ivf_serve_ckpt_")
    if checkpoint_location is not None:
        # Resumable drain: pin the serving parameterization BOTH ways
        # (see dedup_stream.probe_doc_stream for the full rationale).
        # Out-dir sidecar: refuse to mix rows from a different
        # k/dim/n_probe (or an unrelated drain) into this output.
        # Checkpoint-dir sidecar: the checkpoint pins its out_path, so
        # resuming an old checkpoint against a fresh output directory
        # raises instead of silently dropping every already-committed
        # batch from the returned result.
        from .params_guard import (
            check_params_sidecar,
            checkpoint_has_progress,
            drain_has_progress,
        )

        params = {
            "kind": "ivf_serve",
            "index_path": os.path.abspath(index_path),
            "k": int(k),
            "dim": int(dim),
            "n_probe": int(n_probe),
            "exclude_self": bool(exclude_self),
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

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.take(1):
            res = search_ivf_index(
                spark, index_path, batch_df, k,
                dim=dim, n_probe=n_probe, exclude_self=exclude_self,
            )
            res.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")
        if post_batch_hook is not None:
            post_batch_hook(batch_id)

    q = (
        queries_stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if checkpoint_location is None:
            # Per-drain scratch (each call is a fresh run); never leak.
            shutil.rmtree(ckpt, ignore_errors=True)
    if not (
        os.path.isdir(out)
        and any(e.startswith("batch=") for e in os.listdir(out))
    ):
        # No micro-batch produced rows: no parquet footer exists to
        # read. Any OTHER read failure must propagate.
        return spark.createDataFrame(
            [],
            "query_id bigint, rank int, id bigint, sim double, dist double",
        )
    # `batch` is commit bookkeeping from partition discovery, not part
    # of the result contract
    return spark.read.parquet(out).select(
        "query_id", "rank", "id", "sim", "dist"
    )


def serve_graph_query_stream(
    spark: SparkSession,
    queries_stream: DataFrame,
    corpus: DataFrame,
    graph_path: str,
    k: int = 5,
    *,
    dim: int,
    beam_width: int = 8,
    n_iters: int = 4,
    n_entries: int = 8,
    exclude_self: bool = False,
    out_path: str | None = None,
    checkpoint_location: str | None = None,
    post_batch_hook=None,
) -> DataFrame:
    """Drain a query stream against the persisted NSW graph
    (availableNow) and return the full result set — the graph-ANN
    twin of ``serve_query_stream``, with the same exactly-once
    contract (per-batch overwrite dirs, both-ways params sidecars,
    checkpoint-pins-out binding).

    The broadcast server (operators/ann.nsw_broadcast_server) is
    built ONCE per drain — the index collects and broadcasts before
    the first micro-batch, and every batch reuses it, exactly as a
    long-lived HNSW serving process loads its index once. Per-query
    results are independent, so the union of micro-batch outputs is
    row-identical to the batch ``nsw_beam_search`` over the same
    query set — the stream shares the batch query's full value-hash
    oracle. ``graph_path`` is the ensure_nsw_graph root (the edges
    must already exist; ensure first — a serving job must not race a
    build)."""
    import os

    from ..operators.ann import nsw_broadcast_server

    if checkpoint_location is not None and out_path is None:
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
    out = out_path or tempfile.mkdtemp(prefix="nsw_serve_")
    ckpt = checkpoint_location or tempfile.mkdtemp(prefix="nsw_serve_ckpt_")
    if checkpoint_location is not None:
        from .params_guard import (
            check_params_sidecar,
            checkpoint_has_progress,
            drain_has_progress,
        )

        params = {
            "kind": "nsw_serve",
            "graph_path": os.path.abspath(graph_path),
            "k": int(k),
            "dim": int(dim),
            "beam_width": int(beam_width),
            "n_iters": int(n_iters),
            "n_entries": int(n_entries),
            "exclude_self": bool(exclude_self),
            "checkpoint_location": os.path.abspath(checkpoint_location),
        }
        check_params_sidecar(
            out, params, has_progress=drain_has_progress(out)
        )
        check_params_sidecar(
            checkpoint_location,
            {**params, "out_path": os.path.abspath(out)},
            has_progress=checkpoint_has_progress(checkpoint_location),
        )

    edges = spark.read.parquet(f"{graph_path}/edges")
    server = nsw_broadcast_server(
        corpus, edges=edges, k=k, beam_width=beam_width,
        n_iters=n_iters, n_entries=n_entries, dim=dim,
        exclude_self=exclude_self,
    )

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.take(1):
            res = server(batch_df)
            res.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")
        if post_batch_hook is not None:
            post_batch_hook(batch_id)

    q = (
        queries_stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if checkpoint_location is None:
            shutil.rmtree(ckpt, ignore_errors=True)
    if not (
        os.path.isdir(out)
        and any(e.startswith("batch=") for e in os.listdir(out))
    ):
        return spark.createDataFrame(
            [], "query_id bigint, rank bigint, vec_id bigint, sim double"
        )
    return spark.read.parquet(out).select(
        "query_id", "rank", "vec_id", "sim"
    )
