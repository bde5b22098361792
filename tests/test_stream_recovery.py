"""Streaming fault-tolerance: kill the foreachBatch upsert sink
mid-stream — INSIDE the commit protocol's crash window (table swapped,
checkpoint not yet committed) — restart from the same checkpoint, and
prove the final table is byte-identical to the batch upsert over all
changes: exactly-once OUTCOME via source-offset tracking + idempotent
replay (streaming/upsert_sink.py's documented contract).
"""

from __future__ import annotations

import pytest

from cs6300_vectordbs_spark.operators.upsert import upsert_latest
from cs6300_vectordbs_spark.streaming.upsert_sink import start_stream_upsert

SCHEMA = "id long, val string, ver long"


def _write_change_files(spark, src):
    batches = [
        [(1, "a1", 1), (2, "b1", 1), (3, "c1", 1)],
        [(2, "b2", 2), (3, "c0-late", 0), (4, "d1", 1)],
        [(1, "a3", 3), (4, "d0-late", 0), (5, "e1", 1)],
    ]
    for b in batches:
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return batches


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_crash_after_swap_then_restart_converges(spark, tmp_path):
    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    batches = _write_change_files(spark, src)

    # Run 1: die inside the crash window of the SECOND epoch — the
    # table swap for that epoch has happened, its checkpoint commit
    # has not, so the restart MUST replay it.
    seen: list[int] = []

    def crash_on_second(epoch_id: int) -> None:
        seen.append(epoch_id)
        if len(seen) == 2:
            raise RuntimeError("injected crash after swap, before commit")

    q = start_stream_upsert(
        _stream(spark, src),
        table,
        id_col="id",
        version_col="ver",
        checkpoint_location=ckpt,
        post_merge_hook=crash_on_second,
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    assert len(seen) == 2  # two epochs merged, second uncommitted

    # The dead query left a PARTIAL table on disk (epochs 1-2 merged,
    # epoch 3 never ran) — the state a restart must repair from.
    partial = {tuple(r) for r in spark.read.parquet(table).collect()}
    all_rows = [t for b in batches for t in b]
    assert partial != {
        tuple(r)
        for r in upsert_latest(
            spark.createDataFrame(all_rows[:0], SCHEMA),
            spark.createDataFrame(all_rows, SCHEMA),
            "id",
            version_col="ver",
        ).collect()
    }

    # Run 2: same checkpoint, no fault. availableNow resumes from the
    # offset log — replaying the uncommitted epoch, then the rest.
    q2 = start_stream_upsert(
        _stream(spark, src),
        table,
        id_col="id",
        version_col="ver",
        checkpoint_location=ckpt,
    )
    q2.awaitTermination()

    got = spark.read.parquet(table)
    want = upsert_latest(
        spark.createDataFrame(all_rows[:0], SCHEMA),
        spark.createDataFrame(all_rows, SCHEMA),
        "id",
        version_col="ver",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # Exactly-once outcome: one row per id, and every version-winner
    # survived the replay (no low-version clobber, no duplicates).
    rows = got.collect()
    assert len({r.id for r in rows}) == len(rows) == 5
    vals = {r.id: r.val for r in rows}
    assert vals == {1: "a3", 2: "b2", 3: "c1", 4: "d1", 5: "e1"}


def test_restart_without_new_data_is_a_noop(spark, tmp_path):
    """A clean drain followed by a restart on the same checkpoint must
    not re-merge anything (offsets all committed): the table bytes are
    untouched, proving the file-source log is what dedups work."""
    import os

    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_change_files(spark, src)

    q = start_stream_upsert(
        _stream(spark, src), table, id_col="id", version_col="ver",
        checkpoint_location=ckpt,
    )
    q.awaitTermination()

    def table_sig():
        return sorted(
            (f, os.path.getmtime(os.path.join(table, f)))
            for f in os.listdir(table)
        )

    before = table_sig()
    merged: list[int] = []
    q2 = start_stream_upsert(
        _stream(spark, src), table, id_col="id", version_col="ver",
        checkpoint_location=ckpt, post_merge_hook=merged.append,
    )
    q2.awaitTermination()
    assert merged == []  # zero epochs replayed
    assert table_sig() == before


def _mk_doc_files(spark, src, n_files=3):
    """Three single-file document batches; file 2 contains a near-dup
    of an indexed doc so the crashed epoch has real output to replay."""
    corpus = [
        (i, t)
        for i, t in enumerate(
            [
                "the quick brown fox jumps over the lazy dog today",
                "pack my box with five dozen liquor jugs right now",
                "how vexingly quick daft zebras jump over fences",
            ]
        )
    ]
    batches = [
        [(100, "the quick brown fox jumps over the lazy dog today")],
        [(101, "pack my box with five dozen liquor jugs right now")],
        [(102, "completely unrelated text about query planning")],
    ]
    for b in batches[:n_files]:
        spark.createDataFrame(b, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
    return corpus


def test_dedup_stream_crash_inside_commit_window_converges(spark, tmp_path):
    """Kill the dedup probe stream AFTER an epoch's sink write but
    BEFORE its checkpoint commit; restart from the same checkpoint.
    The final result must be row-identical to the one-shot batch probe
    over the same documents — the replayed epoch overwrites its own
    batch directory instead of duplicating rows."""
    from cs6300_vectordbs_spark.sources.dedup_index import (
        ensure_dedup_index,
        probe_dedup_index,
    )
    from cs6300_vectordbs_spark.streaming.dedup_stream import (
        probe_doc_stream,
    )

    idx = str(tmp_path / "idx")
    src = str(tmp_path / "docs_stream")
    out = str(tmp_path / "probe_out")
    ckpt = str(tmp_path / "probe_ckpt")
    corpus = _mk_doc_files(spark, src)
    ensure_dedup_index(
        spark,
        spark.createDataFrame(corpus, "doc_id long, text string"),
        idx,
    )

    def stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    seen: list[int] = []

    def crash_on_second(bid: int) -> None:
        seen.append(bid)
        if len(seen) == 2:
            raise RuntimeError("injected crash after sink, before commit")

    with pytest.raises(Exception, match="injected crash"):
        probe_doc_stream(
            spark, stream(), idx, min_jaccard=0.3, out_path=out,
            checkpoint_location=ckpt, post_batch_hook=crash_on_second,
        )
    assert len(seen) == 2  # epoch 2's sink write happened, commit didn't

    got = probe_doc_stream(
        spark, stream(), idx, min_jaccard=0.3, out_path=out,
        checkpoint_location=ckpt,
    )
    want = probe_dedup_index(
        spark,
        spark.read.parquet(src),
        idx,
        min_jaccard=0.3,
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0
    # exactly-once: the replayed epoch did not duplicate its rows
    assert len(g) == len(set(g))


def test_search_stream_crash_inside_commit_window_converges(spark, tmp_path):
    """Same kill/restart protocol for the IVF query-serving stream:
    the post-crash drain must produce exactly the batch serving result
    — no duplicated (query, rank) rows from the replayed epoch."""
    from cs6300_vectordbs_spark.sources.vector_index import (
        ensure_ivf_index,
        search_ivf_index,
    )
    from cs6300_vectordbs_spark.streaming.search import serve_query_stream

    import pyspark.sql.functions as F

    dim, n = 8, 64
    emb = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf")
    src = str(tmp_path / "q_stream")
    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    ensure_ivf_index(spark, emb, idx, dim=dim, n_cells=4)

    qrows = [(i, [float((i * 5 + j) % 7 - 3) for j in range(dim)]) for i in range(6)]
    for i in range(0, 6, 2):
        spark.createDataFrame(
            qrows[i : i + 2], "query_id long, query_vec array<double>"
        ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema("query_id long, query_vec array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    seen: list[int] = []

    def crash_on_second(bid: int) -> None:
        seen.append(bid)
        if len(seen) == 2:
            raise RuntimeError("injected crash after sink, before commit")

    with pytest.raises(Exception, match="injected crash"):
        serve_query_stream(
            spark, stream(), idx, 3, dim=dim, out_path=out,
            checkpoint_location=ckpt, post_batch_hook=crash_on_second,
        )
    assert len(seen) == 2

    got = serve_query_stream(
        spark, stream(), idx, 3, dim=dim, out_path=out,
        checkpoint_location=ckpt,
    )
    want = search_ivf_index(
        spark,
        idx,
        spark.createDataFrame(
            qrows, "query_id long, query_vec array<double>"
        ),
        3,
        dim=dim,
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) == 18  # 6 queries x top-3
    assert len(g) == len(set(g))


def test_graph_stream_crash_inside_commit_window_converges(spark, tmp_path):
    """Kill/restart protocol for the NSW broadcast-serving stream: the
    post-crash drain must produce exactly the batch beam result over
    the same query set — no duplicated (query, rank) rows from the
    replayed epoch, and the params sidecar accepts the resume."""
    from cs6300_vectordbs_spark.operators.ann import nsw_beam_search
    from cs6300_vectordbs_spark.sources.graph_index import ensure_nsw_graph
    from cs6300_vectordbs_spark.streaming.search import (
        serve_graph_query_stream,
    )

    dim, n = 8, 64
    emb = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<double>",
    )
    gpath = str(tmp_path / "nswg")
    src = str(tmp_path / "q_stream")
    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    ensure_nsw_graph(spark, emb, gpath, k=4)

    qrows = [
        (i, [float((i * 5 + j) % 7 - 3) for j in range(dim)])
        for i in range(6)
    ]
    for i in range(0, 6, 2):
        spark.createDataFrame(
            qrows[i : i + 2], "query_id long, query_vec array<double>"
        ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema("query_id long, query_vec array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    seen: list[int] = []

    def crash_on_second(bid: int) -> None:
        seen.append(bid)
        if len(seen) == 2:
            raise RuntimeError("injected crash after sink, before commit")

    with pytest.raises(Exception, match="injected crash"):
        serve_graph_query_stream(
            spark, stream(), emb, gpath, 3, dim=dim, beam_width=6,
            n_iters=3, n_entries=4, out_path=out,
            checkpoint_location=ckpt, post_batch_hook=crash_on_second,
        )
    assert len(seen) == 2

    got = serve_graph_query_stream(
        spark, stream(), emb, gpath, 3, dim=dim, beam_width=6,
        n_iters=3, n_entries=4, out_path=out, checkpoint_location=ckpt,
    )
    want = nsw_beam_search(
        emb,
        spark.createDataFrame(
            qrows, "query_id long, query_vec array<double>"
        ),
        3,
        edges=spark.read.parquet(f"{gpath}/edges"),
        beam_width=6, n_iters=3, n_entries=4, dim=dim,
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(
        (r.query_id, r.rank, r.vec_id, r.sim) for r in want.collect()
    )
    assert g == w and len(g) == 18  # 6 queries x top-3
    assert len(g) == len(set(g))


def test_graph_stream_resume_pins_corpus_content(spark, tmp_path):
    """The graph drain's sidecar pins the CORPUS fingerprint: resuming
    a checkpoint after the embeddings changed (same graph_path, same
    params) must raise instead of mixing rows scored against two
    different corpora."""
    from cs6300_vectordbs_spark.sources.graph_index import ensure_nsw_graph
    from cs6300_vectordbs_spark.streaming.search import (
        serve_graph_query_stream,
    )

    dim, n = 8, 32
    def corpus(bump):
        return spark.createDataFrame(
            [
                (i, [float((i * 7 + j * 3) % 11 - 5) + bump
                     for j in range(dim)])
                for i in range(n)
            ],
            "vec_id long, embedding array<double>",
        )

    gpath = str(tmp_path / "nswg")
    src = str(tmp_path / "q_stream")
    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    ensure_nsw_graph(spark, corpus(0.0), gpath, k=4)
    spark.createDataFrame(
        [(0, [1.0] * dim), (1, [0.5] * dim)],
        "query_id long, query_vec array<double>",
    ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema("query_id long, query_vec array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    got = serve_graph_query_stream(
        spark, stream(), corpus(0.0), gpath, 3, dim=dim, out_path=out,
        checkpoint_location=ckpt,
    )
    assert got.count() == 6
    # another query file arrives, but the corpus has been regenerated
    spark.createDataFrame(
        [(2, [0.25] * dim)], "query_id long, query_vec array<double>"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        serve_graph_query_stream(
            spark, stream(), corpus(9.0), gpath, 3, dim=dim,
            out_path=out, checkpoint_location=ckpt,
        )


def test_resumable_drain_requires_explicit_out_path(spark, tmp_path):
    """checkpoint_location without out_path must be rejected up front:
    the checkpoint skips committed batches on restart, so their rows
    live only in the previous call's output dir — a fresh temp dir
    would silently drop them from the returned result."""
    from cs6300_vectordbs_spark.streaming.dedup_stream import (
        probe_doc_stream,
    )
    from cs6300_vectordbs_spark.streaming.search import serve_query_stream

    # the guard fires before the stream or index is touched
    with pytest.raises(ValueError, match="out_path"):
        probe_doc_stream(
            spark, None, "unused", checkpoint_location=str(tmp_path / "c1")
        )
    with pytest.raises(ValueError, match="out_path"):
        serve_query_stream(
            spark, None, "unused", 3, dim=8,
            checkpoint_location=str(tmp_path / "c2"),
        )


def test_dedup_drain_checkpoint_pins_out_path(spark, tmp_path):
    """r08 review finding: the sidecar lived only in the out dir, so
    resuming an EXISTING checkpoint against a FRESH out_path (whose
    own sidecar just re-pins) silently skipped every already-committed
    batch — their rows live in the original out dir and the new one
    underreports. The checkpoint now pins its out_path and refuses."""
    from cs6300_vectordbs_spark.sources.dedup_index import ensure_dedup_index
    from cs6300_vectordbs_spark.streaming.dedup_stream import probe_doc_stream

    idx = str(tmp_path / "idx")
    src = str(tmp_path / "docs_stream")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt")
    _mk_doc_files(spark, src)
    ensure_dedup_index(
        spark,
        spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog today")],
            "doc_id long, text string",
        ),
        idx,
    )

    def stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    got = probe_doc_stream(
        spark, stream(), idx, min_jaccard=0.3, out_path=out1,
        checkpoint_location=ckpt,
    )
    assert got.count() > 0  # batches committed under (ckpt, out1)
    with pytest.raises(ValueError, match="mismatch"):
        probe_doc_stream(
            spark, stream(), idx, min_jaccard=0.3, out_path=out2,
            checkpoint_location=ckpt,
        )
    # the original pairing still resumes cleanly (no new data: no-op)
    again = probe_doc_stream(
        spark, stream(), idx, min_jaccard=0.3, out_path=out1,
        checkpoint_location=ckpt,
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, got.collect())
    )


def test_serve_drain_checkpoint_pins_out_path(spark, tmp_path):
    """Same direction-guard for the IVF serving drain."""
    from cs6300_vectordbs_spark.sources.vector_index import ensure_ivf_index
    from cs6300_vectordbs_spark.streaming.search import serve_query_stream

    dim = 8
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)])
         for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf")
    src = str(tmp_path / "q_stream")
    ckpt = str(tmp_path / "ckpt")
    ensure_ivf_index(spark, emb, idx, dim=dim, n_cells=4)
    spark.createDataFrame(
        [(1, [1.0] * dim)], "query_id long, query_vec array<double>"
    ).coalesce(1).write.parquet(src)

    def stream():
        return (
            spark.readStream.schema(
                "query_id long, query_vec array<double>"
            ).parquet(src)
        )

    out1 = str(tmp_path / "out1")
    got = serve_query_stream(
        spark, stream(), idx, 3, dim=dim, out_path=out1,
        checkpoint_location=ckpt,
    )
    assert got.count() == 3
    with pytest.raises(ValueError, match="mismatch"):
        serve_query_stream(
            spark, stream(), idx, 3, dim=dim,
            out_path=str(tmp_path / "out2"), checkpoint_location=ckpt,
        )


def test_upsert_crash_window_retry_with_new_params_refused(spark, tmp_path):
    """r08 review finding: the sink's progress marker was the
    checkpoint's commits dir, but the table swap lands BEFORE the
    commit — a crash in that window left commits/ empty, so a retry
    under DIFFERENT merge params re-pinned and replayed the epoch with
    the new semantics over a table that had already absorbed the old
    merge. Offsets (written before processing) are the marker now: the
    mismatched retry must refuse."""
    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a1", 2), (1, "a0-late", 1)], SCHEMA
    ).coalesce(1).write.parquet(src)

    def crash(epoch_id: int) -> None:
        raise RuntimeError("injected crash after swap, before commit")

    q = start_stream_upsert(
        _stream(spark, src), table, id_col="id", version_col="ver",
        checkpoint_location=ckpt, post_merge_hook=crash,
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    # crash window state: table swapped, epoch NOT committed
    import os

    commits = os.path.join(ckpt, "commits")
    assert not (
        os.path.isdir(commits)
        and any(not e.startswith(".") for e in os.listdir(commits))
    )
    assert os.path.exists(table)
    with pytest.raises(ValueError, match="mismatch"):
        start_stream_upsert(
            _stream(spark, src), table, id_col="id", version_col=None,
            checkpoint_location=ckpt,
        )
    # the ORIGINAL parameters still resume and converge
    q2 = start_stream_upsert(
        _stream(spark, src), table, id_col="id", version_col="ver",
        checkpoint_location=ckpt,
    )
    q2.awaitTermination()
    rows = {tuple(r) for r in spark.read.parquet(table).collect()}
    assert rows == {(1, "a1", 2)}


def test_graph_stream_resume_pins_graph_content(spark, tmp_path):
    """The graph drain's sidecar pins the stored GRAPH fingerprint,
    not just graph_path: an in-place rebuild under different BUILD
    params (k changes the edge list; no pinned serving param changes)
    must make a resume raise instead of silently mixing batches served
    over two different edge lists."""
    from cs6300_vectordbs_spark.sources.graph_index import ensure_nsw_graph
    from cs6300_vectordbs_spark.streaming.search import (
        serve_graph_query_stream,
    )

    dim, n = 8, 32
    corpus = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<double>",
    )
    gpath = str(tmp_path / "nswg")
    src = str(tmp_path / "q_stream")
    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    ensure_nsw_graph(spark, corpus, gpath, k=4)
    spark.createDataFrame(
        [(0, [1.0] * dim), (1, [0.5] * dim)],
        "query_id long, query_vec array<double>",
    ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema("query_id long, query_vec array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    got = serve_graph_query_stream(
        spark, stream(), corpus, gpath, 3, dim=dim, out_path=out,
        checkpoint_location=ckpt,
    )
    assert got.count() == 6
    # the graph is rebuilt IN PLACE with a different build degree —
    # same path, same corpus, same serving params
    ensure_nsw_graph(spark, corpus, gpath, k=6)
    spark.createDataFrame(
        [(2, [0.25] * dim)], "query_id long, query_vec array<double>"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        serve_graph_query_stream(
            spark, stream(), corpus, gpath, 3, dim=dim,
            out_path=out, checkpoint_location=ckpt,
        )


def test_ivf_stream_resume_pins_index_content(spark, tmp_path):
    """The IVF drain's sidecar pins the stored index fingerprint (the
    graph drain's graph_fp rule): an in-place REBUILD over a
    regenerated corpus — same path, same serving params — must make a
    resume raise instead of mixing batches served from two different
    indexes."""
    from cs6300_vectordbs_spark.sources.vector_index import (
        ensure_ivf_index,
    )
    from cs6300_vectordbs_spark.streaming.search import serve_query_stream

    dim, n = 8, 32

    def corpus(bump):
        return spark.createDataFrame(
            [
                (i, [float((i * 7 + j * 3) % 11 - 5) + bump
                     for j in range(dim)])
                for i in range(n)
            ],
            "vec_id long, embedding array<double>",
        )

    ipath = str(tmp_path / "ivf")
    src = str(tmp_path / "q_stream")
    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    ensure_ivf_index(spark, corpus(0.0), ipath, dim=dim, n_cells=4)
    spark.createDataFrame(
        [(0, [1.0] * dim), (1, [0.5] * dim)],
        "query_id long, query_vec array<double>",
    ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema("query_id long, query_vec array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    got = serve_query_stream(
        spark, stream(), ipath, 3, dim=dim, out_path=out,
        checkpoint_location=ckpt,
    )
    assert got.count() == 6
    # the index is rebuilt IN PLACE over a regenerated corpus — every
    # pinned serving param unchanged
    ensure_ivf_index(spark, corpus(9.0), ipath, dim=dim, n_cells=4)
    spark.createDataFrame(
        [(2, [0.25] * dim)], "query_id long, query_vec array<double>"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        serve_query_stream(
            spark, stream(), ipath, 3, dim=dim,
            out_path=out, checkpoint_location=ckpt,
        )


def test_graph_stream_respects_tombstones_and_pins_them(spark, tmp_path):
    """The streaming graph drain serves the SURVIVOR view (tombstoned
    ids never rank, matching the batch path), and a resumable drain
    pins the tombstone snapshot: deletes issued between drains make a
    resume raise instead of mixing batches served over two survivor
    views."""
    from cs6300_vectordbs_spark.sources.graph_index import (
        delete_from_nsw_graph,
        ensure_nsw_graph,
    )
    from cs6300_vectordbs_spark.streaming.search import (
        serve_graph_query_stream,
    )

    dim, n = 8, 32
    corpus = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<double>",
    )
    gpath = str(tmp_path / "nswg")
    src = str(tmp_path / "q_stream")
    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    ensure_nsw_graph(spark, corpus, gpath, k=4)
    delete_from_nsw_graph(
        spark, spark.createDataFrame([(5,), (9,)], "vec_id long"), gpath
    )
    spark.createDataFrame(
        [(0, [1.0] * dim), (1, [0.5] * dim)],
        "query_id long, query_vec array<double>",
    ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema("query_id long, query_vec array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    got = serve_graph_query_stream(
        spark, stream(), corpus, gpath, 3, dim=dim, out_path=out,
        checkpoint_location=ckpt,
    )
    rows = got.collect()
    assert len(rows) == 6
    assert all(r.vec_id not in (5, 9) for r in rows)

    # a further delete between drains changes the survivor view:
    # resuming the old checkpoint must raise
    delete_from_nsw_graph(
        spark, spark.createDataFrame([(12,)], "vec_id long"), gpath
    )
    spark.createDataFrame(
        [(2, [0.25] * dim)], "query_id long, query_vec array<double>"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        serve_graph_query_stream(
            spark, stream(), corpus, gpath, 3, dim=dim,
            out_path=out, checkpoint_location=ckpt,
        )


def test_hnsw_stream_crash_and_tombstone_pin(spark, tmp_path):
    """The layered drain's kill/restart + snapshot contract: a crash
    inside the commit window converges to the batch layered serve
    over the same query set, and a delete issued between drains makes
    a resume over the old checkpoint refuse (tombstone_fp pin)."""
    from cs6300_vectordbs_spark.operators.hnsw import hnsw_search
    from cs6300_vectordbs_spark.sources.graph_index import (
        delete_from_nsw_graph,
    )
    from cs6300_vectordbs_spark.sources.hnsw_index import (
        apply_hnsw_tombstones,
        ensure_hnsw_graph,
    )
    from cs6300_vectordbs_spark.streaming.search import (
        serve_hnsw_query_stream,
    )

    dim, n = 8, 64
    emb = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<double>",
    )
    gpath = str(tmp_path / "hnswg")
    src = str(tmp_path / "q_stream")
    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    kw = dict(k=4, branch=2, max_level=2, k_upper=3)
    ensure_hnsw_graph(spark, emb, gpath, **kw)

    qrows = [
        (i, [float((i * 5 + j) % 7 - 3) for j in range(dim)])
        for i in range(6)
    ]
    for i in range(0, 6, 2):
        spark.createDataFrame(
            qrows[i : i + 2], "query_id long, query_vec array<double>"
        ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema("query_id long, query_vec array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    seen: list[int] = []

    def crash_on_second(bid: int) -> None:
        seen.append(bid)
        if len(seen) == 2:
            raise RuntimeError("injected crash after sink, before commit")

    skw = dict(
        dim=dim, beam_width=6, n_iters=3, max_level=2,
        descent_beam=2, descent_iters=1,
    )
    with pytest.raises(Exception, match="injected crash"):
        serve_hnsw_query_stream(
            spark, stream(), emb, gpath, 3, out_path=out,
            checkpoint_location=ckpt, post_batch_hook=crash_on_second,
            **skw,
        )
    assert len(seen) == 2

    got = serve_hnsw_query_stream(
        spark, stream(), emb, gpath, 3, out_path=out,
        checkpoint_location=ckpt, **skw,
    )
    live, e0, lay, lv = apply_hnsw_tombstones(spark, emb, gpath,
                                              max_level=2)
    want = hnsw_search(
        live,
        spark.createDataFrame(
            qrows, "query_id long, query_vec array<double>"
        ),
        3, edges0=e0, layer_edges=lay, levels=lv,
        beam_width=6, n_iters=3, descent_beam=2, descent_iters=1,
        dim=dim,
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(
        (r.query_id, r.rank, r.vec_id, r.sim) for r in want.collect()
    )
    assert g == w and len(g) == 18
    assert len(g) == len(set(g))

    # delete between drains -> resume over the old checkpoint refuses
    from pyspark.sql import functions as F

    delete_from_nsw_graph(
        spark, emb.filter(F.col("vec_id") % 9 == 1).select("vec_id"),
        gpath,
    )
    with pytest.raises(ValueError, match="parameter mismatch"):
        serve_hnsw_query_stream(
            spark, stream(), emb, gpath, 3, out_path=out,
            checkpoint_location=ckpt, **skw,
        )
