"""Session-memo safety guards (r08, from the r07 ADVICE items):

- non-file sources (empty ``inputFiles()``, leaves that are not
  plan-embedded immutable relations) must NOT be memoized — an
  in-place table mutation under a stable semanticHash would serve
  stale group/signature tables;
- the memo dicts are lock-guarded: concurrent construction over a
  shared SparkSession must neither race eviction nor double-build
  into divergent results;
- resumable stream drains pin their parameterization to a sidecar
  and refuse to resume under a different one.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.dedup import (
    _group_cache_key,
    _memo_checkpoint,
    _TABLE_CACHE,
    clear_exact_group_cache,
    prime_table_memo,
)
from cs6300_vectordbs_spark.streaming.params_guard import (
    check_params_sidecar,
)


def test_memo_key_none_for_non_file_non_local_source(spark, tmp_path):
    """A file-format relation with ZERO current files (empty-dir scan)
    has empty inputFiles() and a stable semanticHash — but files can
    appear later under the same plan, so the key must be None (skip
    memoization, recompute). This is the cheapest reproducible member
    of the mutable-source class (catalog/JDBC/DSv2 tables behave the
    same way: empty inputFiles, stable hash, mutable data)."""
    d = tmp_path / "empty_corpus"
    d.mkdir()
    df = spark.read.schema("doc_id long, text string").parquet(str(d))
    assert df.inputFiles() == []
    assert _group_cache_key(df, "doc_id", "text") is None


def test_memo_key_present_for_rdd_backed_frame(spark):
    """LogicalRDD (createDataFrame / parallelize) hashes by RDD
    identity — immutable data, no false hits — so it stays
    memoizable (the pre-r08 fixture behavior)."""
    rdd = spark.sparkContext.parallelize([(1, "a"), (2, "b")])
    df = rdd.toDF(["doc_id", "text"])
    assert df.inputFiles() == []
    assert _group_cache_key(df, "doc_id", "text") is not None
    # identical-data frames must get DIFFERENT keys (identity-hashed):
    # collisions between distinct fixtures are impossible
    df2 = spark.sparkContext.parallelize([(1, "a"), (2, "b")]).toDF(
        ["doc_id", "text"]
    )
    assert _group_cache_key(df2, "doc_id", "text") != _group_cache_key(
        df, "doc_id", "text"
    )


def test_memo_key_present_for_local_relation_and_files(spark, docs):
    """LocalRelation embeds its rows in the plan (semanticHash covers
    the data) and file sources carry the size/mtime snapshot — both
    stay memoizable."""
    local = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert _group_cache_key(local, "doc_id", "text") is not None
    key = _group_cache_key(docs, "doc_id", "text")
    assert key is not None
    # the file snapshot is part of the key for file sources
    assert any(docs.inputFiles()[0] in str(part) for part in key[-1])


def test_memo_key_present_for_range(spark):
    df = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    assert df.inputFiles() == []
    assert _group_cache_key(df, "doc_id", "text") is not None


def test_memo_concurrent_builders_converge(spark):
    """8 threads racing the same (corpus, tag) slot: every thread gets
    the same row set and the cache holds exactly one entry for the
    key afterwards."""
    clear_exact_group_cache()
    src = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    results, errors = [], []

    def work():
        try:
            out = _memo_checkpoint(
                src,
                ("race_test",),
                lambda: src.select("doc_id"),
            )
            results.append(sorted(r[0] for r in out.collect()))
        except Exception as e:  # pragma: no cover - failure reporter
            errors.append(e)

    threads = [threading.Thread(target=work) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(r == list(range(10)) for r in results)
    assert sum(1 for k in _TABLE_CACHE if k[-1] == "race_test") == 1
    clear_exact_group_cache()


def test_prime_table_memo_read_through(spark, tmp_path):
    """A primed entry is served back by _memo_checkpoint without
    invoking the builder."""
    clear_exact_group_cache()
    src = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, text string"
    )
    pre = src.select("doc_id").localCheckpoint(eager=True)
    assert prime_table_memo(src, ("prime_test",), pre)

    def boom():  # the builder must never run on a primed slot
        raise AssertionError("builder invoked despite primed memo")

    out = _memo_checkpoint(src, ("prime_test",), boom)
    assert out is pre
    # priming an occupied slot is a no-op
    assert not prime_table_memo(src, ("prime_test",), pre)
    clear_exact_group_cache()


def test_params_sidecar_roundtrip_and_mismatch(tmp_path):
    d = str(tmp_path / "out")
    params = {"kind": "dedup_probe", "min_jaccard": 0.3, "x": None}
    check_params_sidecar(d, params)  # first run writes
    check_params_sidecar(d, dict(params))  # identical resume passes
    with pytest.raises(ValueError, match="mismatch"):
        check_params_sidecar(d, {**params, "min_jaccard": 0.5})


def test_params_sidecar_repins_when_no_progress(tmp_path):
    """A first run that died before committing anything pinned
    nothing: a mismatched retry with has_progress=False re-pins the
    sidecar instead of demanding manual cleanup."""
    d = str(tmp_path / "out")
    check_params_sidecar(d, {"k": 1})
    check_params_sidecar(d, {"k": 2}, has_progress=False)  # re-pins
    check_params_sidecar(d, {"k": 2})  # now the stored params
    with pytest.raises(ValueError, match="mismatch"):
        check_params_sidecar(d, {"k": 3})  # progress default: refuse


def test_dedup_resume_param_mismatch_rejected(spark, tmp_path):
    """A drain resumed over an out_path populated under different
    parameters must raise before any stream work happens."""
    import os

    from cs6300_vectordbs_spark.streaming.dedup_stream import (
        probe_doc_stream,
    )

    out = str(tmp_path / "probe_out")
    ckpt = str(tmp_path / "probe_ckpt")
    check_params_sidecar(
        out,
        {
            "kind": "dedup_probe",
            "index_path": os.path.abspath(str(tmp_path / "idx")),
            "min_jaccard": 0.3,
            "checkpoint_location": os.path.abspath(ckpt),
        },
    )
    # committed progress exists -> a mismatched resume must refuse
    os.makedirs(os.path.join(out, "batch=0"), exist_ok=True)
    with pytest.raises(ValueError, match="mismatch"):
        probe_doc_stream(
            spark,
            None,  # guard fires before the stream is touched
            str(tmp_path / "idx"),
            min_jaccard=0.7,
            out_path=out,
            checkpoint_location=ckpt,
        )


def test_serve_resume_param_mismatch_rejected(spark, tmp_path):
    import os

    from cs6300_vectordbs_spark.streaming.search import serve_query_stream

    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    check_params_sidecar(
        out,
        {
            "kind": "ivf_serve",
            "index_path": os.path.abspath(str(tmp_path / "ivf")),
            "k": 3,
            "dim": 8,
            "n_probe": 4,
            "exclude_self": False,
            "checkpoint_location": os.path.abspath(ckpt),
        },
    )
    import os as _os

    _os.makedirs(_os.path.join(out, "batch=0"), exist_ok=True)
    with pytest.raises(ValueError, match="mismatch"):
        serve_query_stream(
            spark, None, str(tmp_path / "ivf"), 5,
            dim=8, out_path=out, checkpoint_location=ckpt,
        )


def test_upsert_resume_param_mismatch_rejected(spark, tmp_path):
    """The upsert sink pins id/version columns to its checkpoint dir —
    resuming with a different merge rule is refused."""
    import os

    from cs6300_vectordbs_spark.streaming.upsert_sink import (
        start_stream_upsert,
    )

    src = str(tmp_path / "changes")
    spark.createDataFrame(
        [(1, "a", 1)], "id long, val string, ver long"
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("id long, val string, ver long")
        .parquet(src)
    )
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    q = start_stream_upsert(
        stream, table, id_col="id", version_col="ver",
        checkpoint_location=ckpt,
    )
    q.awaitTermination()
    assert os.path.exists(os.path.join(ckpt, "_PARAMS.json"))
    with pytest.raises(ValueError, match="mismatch"):
        start_stream_upsert(
            stream, table, id_col="id", version_col=None,
            checkpoint_location=ckpt,
        )


def test_memo_key_none_for_mutable_leaf_behind_files(spark, docs):
    """r08 review finding: a plan that JOINS a file corpus with a
    non-file, non-immutable leaf reports the parquet files from the
    file side, so the pre-fix guard (which walked leaves only when
    inputFiles() was empty) memoized it — and an in-place mutation of
    the non-file side would then serve stale tables. The leaf audit
    must run unconditionally and disqualify the whole plan."""
    from cs6300_vectordbs_spark.operators.dedup import _leaf_audit

    rate = spark.readStream.format("rate").load()
    # a streaming relation is the sandbox-constructible member of the
    # mutable-under-stable-hash leaf class (JDBC/Hive/DSv2 tables
    # behave the same: no file evidence, data changes in place)
    assert _leaf_audit(rate)[0] is False
    mixed = docs.join(rate, docs.doc_id == rate.value)
    assert _leaf_audit(mixed)[0] is False
    assert _group_cache_key(mixed, "doc_id", "text") is None


def test_leaf_audit_accepts_snapshotable_plans(spark, docs):
    """File scans, LocalRelation, Range, and RDD-backed frames — and
    compositions of them — all pass the audit (and file leaves are
    reported so the empty-dir conservatism can key off them)."""
    from cs6300_vectordbs_spark.operators.dedup import _leaf_audit

    ok, has_files = _leaf_audit(docs)
    assert ok and has_files
    local = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    ok, has_files = _leaf_audit(local)
    assert ok and not has_files
    joined = docs.join(local, "doc_id", "left")
    ok, has_files = _leaf_audit(joined)
    assert ok and has_files
    assert _group_cache_key(joined, "doc_id", "text") is not None
