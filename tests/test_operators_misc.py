"""Upsert, sampling, judge parsing, text functions, ids, embedding."""

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.functions.embed import embed_text
from cs6300_vectordbs_spark.functions.ids import format_doc_id, sequential_id
from cs6300_vectordbs_spark.functions.querygen import (
    clean_query_lines,
    template_query,
)
from cs6300_vectordbs_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    truncate,
)
from cs6300_vectordbs_spark.operators.judge import (
    clamp_score,
    is_relevant,
    parse_judge_response,
    sim_judge_score,
)
from cs6300_vectordbs_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    seeded_topn,
)
from cs6300_vectordbs_spark.operators.upsert import upsert_latest


# ---- upsert (V5) ----------------------------------------------------------

def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "val", "ver"])


def test_upsert_updates_win_without_version(spark):
    base = _df(spark, [(1, "a", 1), (2, "b", 1)])
    upd = _df(spark, [(2, "B", 0), (3, "c", 0)])
    out = {r.id: r.val for r in upsert_latest(base, upd, "id").collect()}
    assert out == {1: "a", 2: "B", 3: "c"}


def test_upsert_version_beats_priority(spark):
    base = _df(spark, [(1, "new", 5)])
    upd = _df(spark, [(1, "old", 2)])
    out = upsert_latest(base, upd, "id", version_col="ver").collect()
    assert out[0].val == "new"  # higher version in base wins over update


def test_upsert_version_tie_update_wins(spark):
    base = _df(spark, [(1, "b", 3)])
    upd = _df(spark, [(1, "u", 3)])
    out = upsert_latest(base, upd, "id", version_col="ver").collect()
    assert out[0].val == "u"


def test_upsert_preserves_schema_and_column_order(spark):
    base = _df(spark, [(1, "a", 1)])
    upd = spark.createDataFrame([(2, 9, "z")], ["id", "ver", "val"])
    out = upsert_latest(base, upd, "id")
    assert out.columns == ["id", "val", "ver"]


# ---- sampling (T3) --------------------------------------------------------

def test_hash_bucket_safe_on_extreme_keys(spark):
    df = spark.createDataFrame(
        [(0,), (-1,), (2**40,), (3_500_000_000,), (-(2**62),)], ["k"]
    )
    rows = df.select(hash_bucket("k", 100).alias("b")).collect()
    assert all(0 <= r.b < 100 for r in rows)


def test_hash_sample_deterministic_and_sized(docs):
    a = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 10).collect())
    b = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 10).collect())
    assert a == b
    assert 0.03 <= len(a) / docs.count() <= 0.25  # ~10%, loose bounds


def test_seeded_topn_exact_count_and_stable(docs):
    a = [r.doc_id for r in seeded_topn(docs, 7, seed=42).collect()]
    b = [r.doc_id for r in seeded_topn(docs, 7, seed=42).collect()]
    assert len(a) == 7 and a == b


# ---- judge (F2-F4, U2) ----------------------------------------------------

def test_parse_judge_response_golden(spark):
    df = spark.createDataFrame(
        [
            ("Score: 4.5\nExplanation: on point",),
            ("Score: 99\nExplanation: over",),
            ("no score here",),
            ("Score: 0.2",),
        ],
        ["resp"],
    )
    rows = df.select(parse_judge_response("resp").alias("p")).collect()
    assert rows[0].p.score == 4.5 and rows[0].p.explanation == "on point"
    assert rows[1].p.score == 5.0  # clamped high
    assert rows[2].p.score == 3.0  # fallback (src/queries.py:194)
    assert rows[3].p.score == 1.0  # clamped low


def test_threshold_and_clamp(spark):
    df = spark.createDataFrame([(3.99,), (4.0,), (4.01,)], ["s"])
    got = [r.r for r in df.select(is_relevant("s").alias("r")).collect()]
    assert got == [0, 1, 1]
    c = spark.createDataFrame([(7.0,), (-2.0,)], ["s"])
    vals = [r.c for r in c.select(clamp_score("s").alias("c")).collect()]
    assert vals == [5.0, 1.0]


def test_sim_judge_score_mapping(spark):
    df = spark.createDataFrame([(1.0,), (0.5,), (0.0,)], ["sim"])
    vals = [r.j for r in df.select(sim_judge_score("sim").alias("j")).collect()]
    assert vals == [5.0, 3.0, 1.0]


# ---- text functions -------------------------------------------------------

def test_token_count_and_truncate(spark):
    df = spark.createDataFrame([("  The quick  brown fox ",)], ["t"])
    assert df.select(token_count("t").alias("n")).first().n == 4
    assert df.select(truncate("t", 5).alias("x")).first().x == "  The"


def test_quality_score_bounds(docs):
    rows = docs.select(quality_score("text").alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of it is",), ("el que de la los",),
         ("zzz qqq www",)],
        ["t"],
    )
    got = [r.l for r in df.select(lang_id("t").alias("l")).collect()]
    assert got == ["en", "es", "und"]


def test_doc_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], ["t"]
    )
    fps = [r.f for r in df.select(doc_fingerprint("t").alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]
    assert len(fps[0]) == 16


# ---- ids, embedding, querygen --------------------------------------------

def test_sequential_id_dense_and_formatted(spark):
    df = spark.createDataFrame([(30,), (10,), (20,)], ["k"])
    out = sequential_id(df, "k")
    rows = {r.k: r.seq_id for r in out.collect()}
    assert rows == {10: 1, 20: 2, 30: 3}
    fmt = out.select(format_doc_id("seq_id").alias("m")).collect()
    assert {r.m for r in fmt} == {"movie-000001", "movie-000002", "movie-000003"}


def test_embed_text_deterministic_dim_range(spark):
    df = spark.createDataFrame([("some text",), ("some text",), ("other",)], ["t"])
    rows = df.select(embed_text("t", 8).alias("e")).collect()
    assert rows[0].e == rows[1].e != rows[2].e
    assert len(rows[0].e) == 8
    assert all(-1.0 <= v <= 1.0 for v in rows[0].e)


def test_template_query_and_cleanup(spark):
    df = spark.createDataFrame([("alpha beta gamma delta epsilon zeta",)], ["t"])
    q = df.select(template_query("t", 3).alias("q")).first().q
    assert q == "find documents about alpha beta gamma"
    lines = spark.createDataFrame(
        [("12. keep me",), ("# drop me",), ("   ",), ("3) also kept",)], ["value"]
    )
    got = {r.query for r in clean_query_lines(lines).collect()}
    assert got == {"keep me", "also kept"}


def test_percentile_approx_within_tolerance_of_exact(spark):
    """The sketch path must track the exact percentiles within the
    accuracy bound at the test scale (value range ~[0, 100])."""
    import __spark_entry__ as m
    from tests.conftest import SF_DIR

    exact = m.q_latency_percentiles(spark, SF_DIR).collect()[0]
    approx = m.q_latency_percentiles_approx(spark, SF_DIR).collect()[0]
    for p in ("p50", "p95", "p99"):
        assert abs(exact[p] - approx[p]) < 1.0, (p, exact[p], approx[p])


def test_audio_frames_windowing_contract(spark):
    """Frame count = (n - L)//H + 1 for n >= L; short blobs emit no
    rows; features are exact integer-sum/2^k doubles."""
    from cs6300_vectordbs_spark.operators.multimodal import (
        extract_audio_frames,
    )

    rows = [
        (1, bytes(range(256)) * 2),      # 512 bytes -> 3 frames
        (2, b"x" * 255),                 # short -> 0 frames
        (3, None),                       # null -> 0 frames
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = extract_audio_frames(df, frame_len=256, hop=128).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1}
    frames = sorted(by_doc[1], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in frames] == [0, 1, 2]
    # frame 0 = bytes 0..255: mean = 255/2
    assert frames[0].f_mean == 127.5
    assert frames[0].f_energy == sum(i * i for i in range(256)) / 256


def test_driver_contract_registration_invariants():
    """Every oracle key must have a queries() entry; rows-only entries
    are the known approximate/sketch paths and nothing else."""
    import __spark_entry__ as m

    q, o = m.queries(), m.oracle_sql()
    assert set(o) <= set(q)
    rows_only = set(q) - set(o)
    # r03 gave srp_lsh_topk / ivfpq_topk full value-hash oracles
    # (literal hyperplanes / sequential ADC folds); r04 did the same
    # for brp_lsh_pairs (literal projections) and ivf_kmeans_topk
    # (deterministic Lloyd's with rounded per-iteration means); r05
    # split search_latency so its deterministic result rows are
    # oracle-checked and only the wall-clock companion stays
    # rows-only. The remainder are genuinely non-SQL-expressible: an
    # engine-native approx sketch and a wall-clock column.
    assert rows_only == {
        "latency_percentiles_approx",
        "search_latency_wallclock",
    }
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
