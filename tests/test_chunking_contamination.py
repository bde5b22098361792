"""Golden cases for document chunking, decontamination, and balanced
per-label sampling."""

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.chunking import chunk_documents
from cs6300_vectordbs_spark.operators.quality import contamination_check
from cs6300_vectordbs_spark.operators.sampling import balanced_sample


# ---------------------------------------------------------------- chunking

def _chunks(spark, text, chunk_tokens=4, overlap=1):
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens, overlap)
    return [
        (r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
        for r in out.orderBy("chunk_idx").collect()
    ]


def test_chunk_overlap_and_short_tail(spark):
    # 8 tokens, window 4, stride 3 -> starts 0,3,6; last chunk short
    got = _chunks(spark, "a b c d e f g h")
    assert got == [
        (0, "a b c d", 4),
        (1, "d e f g", 4),
        (2, "g h", 2),
    ]


def test_chunk_exact_multiple_no_empty_tail(spark):
    # 7 tokens, stride 3 -> starts 0,3,6 all < 7; start 9 never emitted
    got = _chunks(spark, "a b c d e f g")
    assert [c[0] for c in got] == [0, 1, 2]
    assert got[-1] == (2, "g", 1)


def test_chunk_doc_shorter_than_window(spark):
    assert _chunks(spark, "a b") == [(0, "a b", 2)]


def test_chunk_empty_doc_yields_nothing(spark):
    assert _chunks(spark, "   ") == []


def test_chunk_zero_overlap(spark):
    got = _chunks(spark, "a b c d e", chunk_tokens=2, overlap=0)
    assert got == [(0, "a b", 2), (1, "c d", 2), (2, "e", 1)]


def test_chunk_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_coverage_on_corpus(docs):
    """Every token position is covered: chunk i has size
    least(32, n - 24*i), there are exactly ceil(n/24) chunks, and the
    final chunk reaches the last token."""
    ch = chunk_documents(docs, chunk_tokens=32, overlap=8)
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    j = ch.join(toks, "doc_id")
    bad_size = j.filter(
        F.col("n_chunk_tokens")
        != F.least(F.lit(32), F.col("n_tokens") - 24 * F.col("chunk_idx"))
    ).count()
    assert bad_size == 0
    agg = ch.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max(24 * F.col("chunk_idx") + F.col("n_chunk_tokens")).alias("end"),
    )
    bad_count = (
        agg.join(toks, "doc_id")
        .filter(
            (F.col("n_chunks") != F.ceil(F.col("n_tokens") / 24))
            | (F.col("end") != F.col("n_tokens"))
        )
        .count()
    )
    assert bad_count == 0


# ----------------------------------------------------------- contamination

def test_contamination_golden(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [
            (10, "a b c x"),   # bigrams {a b, b c, c x}: 2/3 hit
            (11, "x y z"),     # 0/2 hit
            (12, "solo"),      # < n tokens -> omitted
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in contamination_check(train, test, n=2, threshold=0.5).collect()
    }
    assert set(out) == {10, 11}
    assert out[10].n_shingles == 3 and out[10].n_hits == 2
    assert out[10].contamination_frac == pytest.approx(2 / 3, abs=1e-15)
    assert out[10].is_contaminated
    assert out[11].n_hits == 0 and not out[11].is_contaminated


def test_contamination_counts_distinct_shingles_once(spark):
    # repeated bigram in the test doc counts once (distinct shingles)
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    test = spark.createDataFrame(
        [(10, "a b a b")], "doc_id long, text string"
    )
    r = contamination_check(train, test, n=2).collect()[0]
    # distinct bigrams: {a b, b a} -> 1 of 2 in train
    assert (r.n_shingles, r.n_hits) == (2, 1)
    assert r.contamination_frac == pytest.approx(0.5, abs=1e-15)


# --------------------------------------------------------- balanced sample

def test_balanced_sample_caps_and_determinism(emb):
    out = balanced_sample(emb, cap=5)
    per = out.groupBy("label").agg(
        F.count("*").alias("n"), F.max("sample_rank").alias("mx")
    )
    assert per.filter((F.col("n") > 5) | (F.col("mx") > 5)).count() == 0
    # deterministic: two runs pick the identical id set
    a = sorted(r.vec_id for r in out.select("vec_id").collect())
    b = sorted(r.vec_id for r in balanced_sample(emb, cap=5).collect())
    assert a == b


def test_balanced_sample_small_class_kept_whole(spark):
    df = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(100 + i, 1) for i in range(2)],
        "vec_id long, label long",
    )
    out = balanced_sample(df, cap=3)
    per = {r.label: r.n for r in
           out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert per == {0: 3, 1: 2}


def test_balanced_sample_plan_has_window_group_limit(emb):
    plan = balanced_sample(emb, cap=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
