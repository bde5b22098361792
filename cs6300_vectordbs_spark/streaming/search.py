"""Streaming vector search — a query STREAM served against a
persisted index (extension surface; the production serving shape of
the reference's one-query-at-a-time loop,
/root/reference/src/chroma.py:95-102, lifted to a Structured Streaming
micro-batch job). Two index families share one drain scaffold:
``serve_query_stream`` (IVF cell-pruned serving) and
``serve_graph_query_stream`` (NSW broadcast-graph serving).

Design: queries arrive as a file stream; each micro-batch is served by
the SAME plan the batch path uses inside ``foreachBatch`` — the
standard Structured Streaming pattern for serving jobs whose per-batch
logic needs driver-side planning. Because per-query results are
independent, the union of micro-batch outputs is EXACTLY the batch
result over the same query set, so each batch query shares its full
value-hash oracle with its stream.

Scale notes: the index is static (stream-static), state is zero, and
each micro-batch costs O(index probe + queries x k). Results append
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


def _drain(
    spark: SparkSession,
    queries_stream: DataFrame,
    *,
    serve_batch,
    tmp_prefix: str,
    params: dict,
    out_path: str | None,
    checkpoint_location: str | None,
    post_batch_hook,
    out_cols: list[str],
    empty_result,
) -> DataFrame:
    """Shared exactly-once drain scaffold for the serving streams.

    Each micro-batch runs ``serve_batch(batch_df)`` via
    ``foreachBatch`` and writes to its own ``batch=<id>`` directory
    with overwrite — EXACTLY-ONCE OUTCOME: batch ids are stable across
    restarts from the same checkpoint, so a crash between sink write
    and checkpoint commit replays into the same directory (idempotent
    overwrite), never duplicating result rows. Results are therefore
    identical to the batch plan over the same query set, independent
    of micro-batching AND of crash/restart placement (proven in
    tests/test_stream_recovery.py for both families).

    Resumable drains (``checkpoint_location`` set) pin ``params`` BOTH
    ways (see dedup_stream.probe_doc_stream for the full rationale):
    the out-dir sidecar refuses to mix rows from a different
    parameterization (or an unrelated drain) into this output, and the
    checkpoint-dir sidecar pins its out_path so resuming an old
    checkpoint against a fresh output directory raises instead of
    silently dropping every already-committed batch. A sidecar with
    zero committed progress pins nothing — a retry after an
    immediately-failed first run may re-pin.

    Without a checkpoint, ``out_path`` must be empty or nonexistent
    (dirty data under a fresh offset log would double-count); with
    one, existing ``batch=`` dirs are the committed prefix a restart
    resumes over. ``post_batch_hook(batch_id)`` fires inside the crash
    window (after the sink write, before the checkpoint commit) for
    fault injection. ``empty_result()`` supplies the zero-batch return
    (no parquet footer exists to read then; any OTHER read failure
    must propagate).
    """
    import os

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
    out = out_path or tempfile.mkdtemp(prefix=tmp_prefix)
    ckpt = checkpoint_location or tempfile.mkdtemp(
        prefix=f"{tmp_prefix}ckpt_"
    )
    if checkpoint_location is not None:
        from .params_guard import (
            check_params_sidecar,
            checkpoint_has_progress,
            drain_has_progress,
        )

        params = {
            **params,
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

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.take(1):
            serve_batch(batch_df).write.mode("overwrite").parquet(
                f"{out}/batch={batch_id}"
            )
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
        return empty_result()
    # `batch` is commit bookkeeping from partition discovery, not part
    # of the result contract
    return spark.read.parquet(out).select(*out_cols)


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
    """Drain the query stream against the stored IVF index
    (availableNow) and return the full result set — rows
    (query_id, rank, id, sim, dist), identical to the batch
    ``search_ivf_index`` output for the same query set. All
    exactly-once / sidecar / crash-window semantics per ``_drain``.
    """
    import os

    from ..sources.vector_index import search_ivf_index

    params = {
        "kind": "ivf_serve",
        "index_path": os.path.abspath(index_path),
        "k": int(k),
        "dim": int(dim),
        "n_probe": int(n_probe),
        "exclude_self": bool(exclude_self),
    }
    if checkpoint_location is not None:
        from ..sources.index_common import read_fingerprint

        # Pin the INDEX CONTENT, not just its path (the graph drain's
        # graph_fp rule): an in-place REBUILD over a regenerated corpus
        # keeps every pinned param equal while changing what serves —
        # a resume must raise instead of mixing batches across two
        # different indexes. Deliberately NOT pinned: upsert_ivf_index
        # appends generations without touching the fingerprint, so a
        # resumable drain spanning an upsert keeps serving (a stream
        # over a live index reflecting the newest generation is the
        # intended lifecycle, not a mix-up).
        params["index_fp"] = read_fingerprint(index_path)
    return _drain(
        spark,
        queries_stream,
        serve_batch=lambda batch_df: search_ivf_index(
            spark, index_path, batch_df, k,
            dim=dim, n_probe=n_probe, exclude_self=exclude_self,
        ),
        tmp_prefix="ivf_serve_",
        params=params,
        out_path=out_path,
        checkpoint_location=checkpoint_location,
        post_batch_hook=post_batch_hook,
        out_cols=["query_id", "rank", "id", "sim", "dist"],
        empty_result=lambda: spark.createDataFrame(
            [],
            "query_id bigint, rank int, id bigint, sim double, dist double",
        ),
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
    twin of ``serve_query_stream`` (exactly-once / sidecar semantics
    per ``_drain``).

    The broadcast server (operators/ann.nsw_broadcast_server) is
    built ONCE per drain — the index collects and broadcasts before
    the first micro-batch, and every batch reuses it, exactly as a
    long-lived HNSW serving process loads its index once. Per-query
    results are independent, so the union of micro-batch outputs is
    row-identical to the batch ``nsw_beam_search`` over the same
    query set — the stream shares the batch query's full value-hash
    oracle. ``graph_path`` is the ensure_nsw_graph root (the edges
    must already exist; ensure first — a serving job must not race a
    build). The resumable-drain sidecar pins the CORPUS content too
    (unlike the IVF drain, the scoring vectors are not under
    ``graph_path``), so a resume after the embeddings were
    regenerated raises instead of mixing rows scored against two
    different corpora.

    TOMBSTONES are respected exactly like the batch path
    (sources/graph_index.apply_nsw_tombstones): a delete issued
    against ``graph_path`` drops its nodes from the broadcast server's
    corpus and edge list BEFORE the drain starts, so every micro-batch
    serves the survivor view. The tombstone SET is a snapshot per
    drain (the server broadcasts once); deletes issued mid-drain apply
    from the next drain, and a resumable drain pins the snapshot in
    its sidecar (``tombstone_fp``) — resuming after further deletes
    raises instead of mixing batches served over two survivor views.
    """
    import os

    from ..operators.ann import nsw_broadcast_server
    from ..sources.graph_index import apply_nsw_tombstones

    live, live_edges = apply_nsw_tombstones(spark, corpus, graph_path)
    server = nsw_broadcast_server(
        live, edges=live_edges, k=k, beam_width=beam_width,
        n_iters=n_iters, n_entries=n_entries, dim=dim,
        exclude_self=exclude_self,
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
    }
    if checkpoint_location is not None:
        from ..sources.index_common import (
            corpus_fingerprint,
            read_fingerprint,
        )

        params["corpus_fp"] = corpus_fingerprint(
            corpus, ["vec_id", "embedding"]
        )
        # Pin the GRAPH CONTENT too, not just its path: graph_path is
        # an abspath, but an in-place rebuild under different build
        # params (k/salt change the edge list while every serving
        # param pinned above stays equal) would otherwise let a resume
        # silently mix batches served over two different edge lists —
        # the same failure mode the corpus_fp pin closes for the
        # scoring vectors. ensure_nsw_graph always commits a
        # fingerprint; a hand-built edges dir pins None, which still
        # changes (to a string) the moment ensure_* manages the path.
        params["graph_fp"] = read_fingerprint(graph_path)
        # Pin the tombstone snapshot the server was built over: a
        # delete between drains changes the survivor view (content,
        # not params), so a resume over the old checkpoint must raise
        # rather than append new-view batches onto old-view ones.
        from ..sources.graph_index import read_nsw_tombstones

        tombs = read_nsw_tombstones(spark, graph_path, like=corpus)
        params["tombstone_fp"] = corpus_fingerprint(tombs, ["vec_id"])
    return _drain(
        spark,
        queries_stream,
        serve_batch=server,
        tmp_prefix="nsw_serve_",
        params=params,
        out_path=out_path,
        checkpoint_location=checkpoint_location,
        post_batch_hook=post_batch_hook,
        out_cols=["query_id", "rank", "vec_id", "sim"],
        # Empty drain: derive the schema from the server itself (it
        # propagates the corpus id type), so the zero-batch path
        # returns the same schema as the written-rows path.
        empty_result=lambda: server(
            spark.createDataFrame([], queries_stream.schema)
        ),
    )


def serve_hnsw_query_stream(
    spark: SparkSession,
    queries_stream: DataFrame,
    corpus: DataFrame,
    graph_path: str,
    k: int = 5,
    *,
    dim: int,
    beam_width: int = 32,
    n_iters: int = 6,
    max_level: int = 3,
    descent_beam: int = 4,
    descent_iters: int = 2,
    exclude_self: bool = False,
    out_path: str | None = None,
    checkpoint_location: str | None = None,
    post_batch_hook=None,
) -> DataFrame:
    """Drain a query stream against the persisted LAYERED (HNSW)
    graph — serve_graph_query_stream's hierarchical sibling, same
    exactly-once / sidecar / snapshot semantics.

    One layered broadcast server per drain: corpus, layer-0 edges,
    upper layers, and levels collect and broadcast before the first
    micro-batch (nsw_broadcast_server's layered mode), and every
    batch runs the full descent-and-beam in its one mapInPandas pass.
    Tombstones (sources/hnsw_index.apply_hnsw_tombstones) apply
    before the server builds, so every batch serves the survivor
    hierarchy; the resumable-drain sidecar pins graph content,
    corpus content, the tombstone snapshot, AND every
    descent/serving parameter — a resume over any changed input
    raises instead of mixing serving views. ``graph_path`` is the
    ensure_hnsw_graph root (build first; a serving job must not race
    a build)."""
    import os

    from ..operators.ann import nsw_broadcast_server
    from ..sources.hnsw_index import apply_hnsw_tombstones

    live, live_e0, live_layers, live_levels = apply_hnsw_tombstones(
        spark, corpus, graph_path, max_level=max_level
    )
    server = nsw_broadcast_server(
        live, edges=live_e0, k=k, beam_width=beam_width,
        n_iters=n_iters, dim=dim, exclude_self=exclude_self,
        layer_edges=live_layers, levels=live_levels,
        descent_beam=descent_beam, descent_iters=descent_iters,
    )
    params = {
        "kind": "hnsw_serve",
        "graph_path": os.path.abspath(graph_path),
        "k": int(k),
        "dim": int(dim),
        "beam_width": int(beam_width),
        "n_iters": int(n_iters),
        "max_level": int(max_level),
        "descent_beam": int(descent_beam),
        "descent_iters": int(descent_iters),
        "exclude_self": bool(exclude_self),
    }
    if checkpoint_location is not None:
        from ..sources.graph_index import read_nsw_tombstones
        from ..sources.index_common import (
            corpus_fingerprint,
            read_fingerprint,
        )

        params["corpus_fp"] = corpus_fingerprint(
            corpus, ["vec_id", "embedding"]
        )
        params["graph_fp"] = read_fingerprint(graph_path)
        tombs = read_nsw_tombstones(spark, graph_path, like=corpus)
        params["tombstone_fp"] = corpus_fingerprint(tombs, ["vec_id"])
    return _drain(
        spark,
        queries_stream,
        serve_batch=server,
        tmp_prefix="hnsw_serve_",
        params=params,
        out_path=out_path,
        checkpoint_location=checkpoint_location,
        post_batch_hook=post_batch_hook,
        out_cols=["query_id", "rank", "vec_id", "sim"],
        empty_result=lambda: server(
            spark.createDataFrame([], queries_stream.schema)
        ),
    )
