"""Ingestion/sinks round-trips, streaming-vs-batch equivalence,
multimodal plumbing, and pipeline integration."""

import os

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.multimodal import (
    decode_image_stub,
    sample_frames,
    with_blob_metadata,
)
from cs6300_vectordbs_spark.operators.pipeline import (
    pipeline_report,
    search_pipeline,
)
from cs6300_vectordbs_spark.operators.upsert import idempotent_load_needed
from cs6300_vectordbs_spark.sources.ingest import (
    append_query_cache,
    create_table_if_absent,
    load_corpus_csv,
    read_query_cache,
    table_exists,
    write_table,
)
from cs6300_vectordbs_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    windowed_event_counts,
)


def test_csv_ingest_projection_rename_ids(spark, tmp_path):
    csv = tmp_path / "movies.csv"
    csv.write_text(
        "Title,Release Year,Plot,Genre,Director,Cast,Origin/Ethnicity,Wiki Page,Junk\n"
        'B movie,1999,"plot b, with comma",drama,d1,c1,o1,w1,x\n'
        "A movie,2001,plot a,comedy,d2,c2,o2,w2,y\n"
    )
    out = load_corpus_csv(spark, str(csv))
    rows = {r.title: r for r in out.collect()}
    assert set(out.columns) == {
        "text", "title", "year", "director", "cast", "genre", "origin",
        "wiki_page", "id",
    }
    assert rows["B movie"].text == "plot b, with comma"
    assert rows["B movie"].year == "1999"  # year stays string
    # id dense by order of first projected column (text)
    ids = sorted(r.id for r in rows.values())
    assert ids == ["movie-000001", "movie-000002"]


def test_csv_ingest_empty_whitespace_null_fidelity(spark, tmp_path):
    """DictReader-parity reader contract (reference db.py:36): empty
    field → '', interior whitespace preserved, '\\N' sentinel → NULL.
    Spark's CSV defaults (trim + empty==null) silently corrupt hostile
    corpora — this pins the tuned reader options in load_corpus_csv
    and the matching writer recipe used by q_csv_ingest."""
    csv = tmp_path / "edge.csv"
    csv.write_text(
        "Title,Plot\n"
        '"t-empty",""\n'
        '"t-ws","   \t  "\n'
        '"t-null",\\N\n'
        '"t-ok","plain"\n'
    )
    out = load_corpus_csv(spark, str(csv), column_map={"Plot": "text", "Title": "title"})
    got = {r.title: r.text for r in out.collect()}
    assert got["t-empty"] == ""
    assert got["t-ws"] == "   \t  "
    assert got["t-null"] is None
    assert got["t-ok"] == "plain"

    # full writer→reader roundtrip with the q_csv_ingest recipe
    src = spark.createDataFrame(
        [("1", ""), ("2", "  \t "), ("3", None), ("4", 'a,"q"\nb')],
        "Title string, Plot string",
    )
    p = str(tmp_path / "rt")
    (src.write.mode("overwrite").option("header", True).option("escape", '"')
        .option("quoteAll", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("nullValue", "\\N").csv(p))
    back = load_corpus_csv(spark, p, column_map={"Plot": "text", "Title": "title"})
    got = {r.title: r.text for r in back.collect()}
    assert got == {"1": "", "2": "  \t ", "3": None, "4": 'a,"q"\nb'}


def test_write_table_roundtrip_and_partitioning(spark, docs, tmp_path):
    path = str(tmp_path / "docs_parquet")
    write_table(docs, path, partition_by=["lang"])
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    # partition dirs exist → partition pruning is available on read
    assert any(d.startswith("lang=") for d in os.listdir(path))


def test_create_table_if_absent_is_idempotent(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    assert not table_exists(spark, path)
    first = create_table_if_absent(spark, path, docs.limit(10))
    assert first.count() == 10
    # second call must NOT overwrite with different data
    again = create_table_if_absent(spark, path, docs.limit(3))
    assert again.count() == 10


def test_query_cache_roundtrip_append(spark, tmp_path):
    path = str(tmp_path / "qcache")
    q1 = spark.createDataFrame([("first query",), ("second query",)], ["query"])
    append_query_cache(q1, path)
    assert read_query_cache(spark, path).count() == 2
    append_query_cache(q1.limit(1), path)
    assert read_query_cache(spark, path).count() == 3


def test_idempotent_load_guard(spark, docs, tmp_path):
    path = str(tmp_path / "guard")
    assert idempotent_load_needed(spark, path, 10)  # missing → load
    write_table(docs.limit(10), path)
    assert not idempotent_load_needed(spark, path, 10)  # count matches
    assert idempotent_load_needed(spark, path, 11)


def test_streaming_equals_batch(spark):
    from cs6300_vectordbs_spark.io import read_events

    sf = "/root/testdata/sf0.001"
    batch = windowed_event_counts(read_events(spark, sf), "1 hour")
    stream = windowed_event_counts(read_events_stream(spark, sf), "1 hour")
    run_stream_to_memory(stream, "t_events_counts")
    got = spark.table("t_events_counts")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert b == s  # exactly-once availableNow drain == batch result


def test_stateful_sessionize_stream_gap_and_timeout(spark, tmp_path):
    """Two micro-batches: batch 1's open sessions must be flushed by
    EVENT-TIME TIMEOUT once batch 2 advances the watermark past
    last_event + gap — covering the state-timeout branch that the
    single-batch oracle path never exercises."""
    import datetime as dt

    from cs6300_vectordbs_spark.streaming.sessions import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, minutes, value):
        return (eid, uid, t0 + dt.timedelta(minutes=minutes), float(value), "c")

    schema = "event_id long, user_id long, ts timestamp, value double, event_type string"
    # file 1: user 1 has two sessions (gap at 40 > 30), second still open
    f1 = spark.createDataFrame(
        [ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 50, 4.0)], schema
    )
    # file 2: much later event of user 2 drives the watermark forward,
    # timing out user 1's open session
    f2 = spark.createDataFrame([ev(4, 2, 600, 8.0)], schema)
    d = str(tmp_path / "stream")
    f1.coalesce(1).write.parquet(d)
    f2.coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(f1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
    run_stream_to_memory(out, "sess_timeout_test", output_mode="append")
    got = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in spark.table("sess_timeout_test").collect()
    }
    # session 1 closed by the in-batch gap; session 2 closed by timeout
    assert (1, t0, 2, 3.0) in got
    assert (1, t0 + dt.timedelta(minutes=50), 1, 4.0) in got
    # user 2's session is still open (nothing advanced the watermark past it)
    assert all(u != 2 for (u, *_rest) in got)


def test_blob_metadata_and_decode_stub(spark, docs):
    bm = docs.limit(20).select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    meta = with_blob_metadata(bm).select("doc_id", "meta.*").collect()
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in meta)
    dec = decode_image_stub(bm).collect()
    assert all(16 <= r.width <= 256 and r.n_channels == 3 for r in dec)
    assert all(len(r.feature) == 8 for r in dec)
    # deterministic: same bytes → same fake features
    dec2 = decode_image_stub(bm).collect()
    assert {(r.doc_id, tuple(r.feature)) for r in dec} == {
        (r.doc_id, tuple(r.feature)) for r in dec2
    }


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, 95), (2, 0), (3, 30)], ["vid", "n_frames"])
    rows = sample_frames(df, every=30).collect()
    got = sorted((r.vid, r.frame_idx) for r in rows)
    assert got == [(1, 0), (1, 30), (1, 60), (1, 90), (3, 0)]


def test_pipeline_end_to_end_shape(docs):
    rep = pipeline_report(search_pipeline(docs)).first()
    assert rep.n_queries > 0
    assert rep.n_results == rep.n_queries * 5
    assert 0.0 <= rep.avg_recall <= 1.0
    assert 0.0 <= rep.avg_ndcg <= 1.0
    assert rep.n_ndcg_queries == rep.n_queries  # A5 includes all
    assert rep.n_recall_queries <= rep.n_queries  # A4 excludes zero-relevant


def test_stream_upsert_sink_converges_to_batch_upsert(spark, tmp_path):
    """Two micro-batches of changes through the foreachBatch upsert
    sink must yield exactly the table the BATCH upsert produces over
    the same changes — the streaming sink is the S4/S5 surface, not a
    new semantics."""
    from cs6300_vectordbs_spark.operators.upsert import upsert_latest
    from cs6300_vectordbs_spark.streaming.upsert_sink import run_stream_upsert

    schema = "id long, val string, ver long"
    b1 = spark.createDataFrame(
        [(1, "a1", 1), (2, "b1", 1), (3, "c1", 1)], schema
    )
    b2 = spark.createDataFrame(
        [(2, "b2", 2), (3, "c0-late", 0), (4, "d1", 1)], schema
    )
    src = str(tmp_path / "changes")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    changes = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = str(tmp_path / "table")
    got = run_stream_upsert(changes, table, id_col="id", version_col="ver")

    want = upsert_latest(b1, b2, "id", version_col="ver")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # id 3: the late low-version update must NOT have clobbered c1
    assert {t[:2] for t in got.collect()} >= {(3, "c1"), (2, "b2"), (4, "d1")}


def test_stream_stream_interval_join_across_batches(spark, tmp_path):
    """A click arriving in micro-batch 1 must still match an error in
    micro-batch 2 — the buffered-state path a single-batch drain never
    exercises."""
    import datetime as dt

    from cs6300_vectordbs_spark.streaming.joins import interval_join_streams

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    f1 = spark.createDataFrame(
        [(1, 7, t0, "click"), (2, 8, t0, "click")], schema
    )
    f2 = spark.createDataFrame(
        [(3, 7, t0 + dt.timedelta(minutes=2), "error"),
         (4, 8, t0 + dt.timedelta(minutes=20), "error")], schema
    )
    d = str(tmp_path / "ev")
    f1.coalesce(1).write.parquet(d)
    f2.coalesce(1).write.mode("append").parquet(d)

    src = (
        spark.readStream.schema(f1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    err = src.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clk = src.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = interval_join_streams(
        err, clk, "user_id", lower_us=0, upper_us=300_000_000,
        watermark="1 hour",
    )
    run_stream_to_memory(out, "ssj_test", output_mode="append")
    got = {
        (r.event_id, r.r_event_id)
        for r in spark.table("ssj_test").collect()
    }
    # user 7: error 2 min after click -> pair; user 8: 20 min -> outside window
    assert got == {(3, 1)}


def test_stream_dedup_restores_exactly_once(spark):
    from cs6300_vectordbs_spark.streaming.events import (
        dedup_events_stream,
        run_stream_to_memory,
    )
    from tests.conftest import SF_DIR

    out = dedup_events_stream(spark, SF_DIR)
    run_stream_to_memory(
        out, query_name="t_dedup_stream", output_mode="append"
    )
    got = spark.table("t_dedup_stream")
    n_batch = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert got.count() == n_batch  # doubled delivery collapsed
    assert got.select("event_id").distinct().count() == n_batch


def test_sliding_window_triples_tumbling_mass(spark):
    """Every event lands in exactly window/slide = 3 sliding windows,
    so total event mass is exactly 3x the table count."""
    from cs6300_vectordbs_spark.io import read_events
    from cs6300_vectordbs_spark.streaming.events import sliding_event_counts
    from tests.conftest import SF_DIR

    ev = read_events(spark, SF_DIR)
    out = sliding_event_counts(ev)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 3 * ev.count()


def test_load_corpus_jsonl_splits_good_and_corrupt(spark, tmp_path):
    from cs6300_vectordbs_spark.sources.ingest import load_corpus_jsonl

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha", "lang": "en"}\n'
        'THIS IS NOT JSON\n'
        '{"doc_id": 2, "text": "beta", "lang": "de"}\n'
        '{"doc_id": 3, "text": "gamma"'  # truncated line
        "\n"
    )
    good, bad = load_corpus_jsonl(
        spark, str(p), "doc_id bigint, text string, lang string",
        column_map={"doc_id": "doc_id", "text": "text"},
    )
    rows = sorted((r.doc_id, r.text) for r in good.collect())
    assert rows == [(1, "alpha"), (2, "beta")]
    assert good.columns == ["doc_id", "text"]
    badlines = sorted(r.raw_line for r in bad.collect())
    assert badlines == ['THIS IS NOT JSON', '{"doc_id": 3, "text": "gamma"']


def test_write_corpus_shards_bounds_file_sizes(spark, tmp_path):
    from cs6300_vectordbs_spark.sources.ingest import write_corpus_shards

    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    out = str(tmp_path / "shards")
    n = write_corpus_shards(df, out, rows_per_shard=300)
    assert n == 4
    back = spark.read.parquet(out)
    assert back.count() == 1000
    # every parquet file holds <= rows_per_shard rows
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    assert all(r["count"] <= 300 for r in per_file)
    assert len(per_file) >= 4


def test_load_corpus_jsonl_all_corrupt_inference(spark, tmp_path):
    """schema=None on a file with no parseable line must quarantine
    every line rather than crash on an empty inferred schema."""
    from cs6300_vectordbs_spark.sources.ingest import load_corpus_jsonl

    p = tmp_path / "broken.jsonl"
    p.write_text("NOPE\nALSO NOPE\n")
    good, bad = load_corpus_jsonl(spark, str(p))
    assert good.count() == 0
    assert sorted(r.raw_line for r in bad.collect()) == ["ALSO NOPE", "NOPE"]


def test_load_corpus_jsonl_all_corrupt_keeps_mapped_schema(spark, tmp_path):
    """With a column_map, the empty `good` frame of the all-corrupt
    inference branch must expose the MAPPED columns (r03 advisory:
    it used to leak the raw `value` text schema, so downstream selects
    on mapped columns failed on the empty frame)."""
    from cs6300_vectordbs_spark.sources.ingest import load_corpus_jsonl

    p = tmp_path / "broken.jsonl"
    p.write_text("NOPE\n")
    good, bad = load_corpus_jsonl(
        spark, str(p), column_map={"a": "doc_id", "b": "text"}
    )
    assert good.columns == ["doc_id", "text"]
    assert good.select("doc_id", "text").count() == 0
    assert bad.count() == 1


def test_ensure_bucketed_table_rejects_bad_identifier(spark, docs):
    """Table names are interpolated into DDL and a warehouse path —
    anything but a plain identifier must be rejected."""
    import pytest

    from cs6300_vectordbs_spark.sources.ingest import ensure_bucketed_table

    with pytest.raises(ValueError, match="invalid table identifier"):
        ensure_bucketed_table(
            spark, docs, "t; DROP TABLE x--", by="doc_id"
        )
    with pytest.raises(ValueError, match="invalid table identifier"):
        ensure_bucketed_table(spark, docs, "../escape", by="doc_id")


def test_split_csv_lines_quarantines_malformed(spark, tmp_path):
    """Typed-CSV PERMISSIVE split: bad typed fields and wrong-arity
    rows quarantine; clean rows parse with their types; the repeated
    per-file header line is dropped."""
    from cs6300_vectordbs_spark.sources.ingest import split_csv_lines

    from pyspark.sql import functions as F

    p = tmp_path / "c.csv"
    p.write_text(
        "id,name,n\n1,a,10\nxx,b,20\n2,c,30\nshort\n3,d,40,extra\n"
    )
    raw = spark.read.text(str(p)).filter(F.trim("value") != "")
    good, bad = split_csv_lines(
        raw, "id bigint, name string, n bigint", header="id,name,n"
    )
    rows = sorted((r.id, r.name, r.n) for r in good.collect())
    # r05: the explicit arity check quarantines OVER-LONG rows too
    # (PERMISSIVE alone silently drops the extra tokens).
    assert rows == [(1, "a", 10), (2, "c", 30)]
    badlines = sorted(r.raw_line for r in bad.collect())
    assert badlines == ["3,d,40,extra", "short", "xx,b,20"]
