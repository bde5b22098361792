"""The pluggable real-model hooks, driven end-to-end with deterministic
toy models — proving the Arrow-batch / schema / lazy-initialization
plumbing that breaks in production, not just the column-expression
stand-ins the oracles cover.

Reference: SentenceTransformer encode loop (/root/reference/src/
db.py:115-135) and Ollama judge POSTs (/root/reference/src/
queries.py:147-248) — both external calls the engine exposes as
injected callables running inside mapInPandas.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.functions.embed import embed_text_model
from cs6300_vectordbs_spark.operators.judge import llm_judge_scores
from cs6300_vectordbs_spark.operators.latency import search_with_latency
from cs6300_vectordbs_spark.operators.similarity import similarity_topk


def test_embed_text_model_through_arrow_path(docs):
    """A deterministic toy encoder through the actual mapInPandas
    stage: per-executor lazy singleton, list-of-texts batch contract,
    schema widening by one array<double> column."""
    sub = docs.limit(40).select("doc_id", "text")

    def encode(texts):
        # lazy per-process "model" (the production init-once pattern);
        # module attribute survives across batches in one worker
        import builtins

        model = getattr(builtins, "_toy_model_calls", None)
        if model is None:
            builtins._toy_model_calls = 0
        builtins._toy_model_calls += 1
        return [
            [float(len(t)), float(t.count("a")), 1.0] for t in texts
        ]

    out = embed_text_model(sub, encode, text_col="text")
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "text", "embedding",
    ]
    assert out.schema["embedding"].dataType.simpleString() == "array<double>"
    rows = {r.doc_id: r.embedding for r in out.collect()}
    check = {r.doc_id: r.text for r in sub.collect()}
    assert len(rows) == 40
    for did, text in check.items():
        assert rows[did] == [
            float(len(text)), float(text.count("a")), 1.0
        ]


def test_embed_text_model_empty_partitions(spark):
    """Empty Arrow batches must not reach/break the encoder."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string").repartition(8)
    out = embed_text_model(df, lambda ts: [[1.0]] * len(ts))
    assert out.count() == 1


def test_llm_judge_scores_parse_clamp_threshold(spark):
    """Injected deterministic judge through mapInPandas, then the F4
    parse -> F3 clamp -> F2 threshold pipeline on its raw responses."""
    pairs = spark.createDataFrame(
        [
            ("q1", "good doc"),
            ("q2", "bad doc"),
            ("q3", "weird doc"),
            ("q4", "broken doc"),
        ],
        "query string, document string",
    )

    def judge(query, doc):
        if "good" in doc:
            return "Score: 5\nExplanation: on-topic"
        if "bad" in doc:
            return "Score: 1.5\nExplanation: off-topic"
        if "weird" in doc:
            return "Score: 99\nExplanation: over-range"  # must clamp to 5
        return "no score line at all"  # must default to 3.0

    out = {
        r.document: (r.relevancy_score, r.is_relevant, r.judge_response)
        for r in llm_judge_scores(pairs, judge).collect()
    }
    assert out["good doc"][0] == 5.0 and out["good doc"][1] == 1
    assert out["bad doc"][0] == 1.5 and out["bad doc"][1] == 0
    assert out["weird doc"][0] == 5.0 and out["weird doc"][1] == 1
    assert out["broken doc"][0] == 3.0 and out["broken doc"][1] == 0


def test_search_with_latency_matches_exact_search(emb):
    """U3: per-query latency rows carry positive wall-clock and the
    SAME (query_id, rank, id, sim) tuples as the exact batch plan."""
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    timed = search_with_latency(emb, queries, 5, exclude_self=True)
    rows = timed.collect()
    assert all(r.latency_ms > 0 for r in rows)
    got = sorted((r.query_id, r.rank, r.vec_id) for r in rows)
    exact = similarity_topk(emb, queries, 5, exclude_self=True, dim=64)
    want = sorted(
        (r.query_id, r.rank, r.vec_id) for r in exact.collect()
    )
    assert got == want
    sims = {(r.query_id, r.rank): r.sim for r in rows}
    for r in exact.collect():
        assert sims[(r.query_id, r.rank)] == pytest.approx(r.sim, abs=1e-12)


def test_rerank_with_model_matches_column_stand_in(spark, docs):
    """rerank_with_model (mapInPandas, real-model slot) must produce
    the identical ranking to the verified column-expression stand-in
    when the injected scorer implements the same md5 pair score."""
    import hashlib

    from cs6300_vectordbs_spark.operators.rerank import (
        rerank_topk,
        rerank_with_model,
    )

    d = docs.limit(30).select("doc_id", "text")
    qd = d.limit(3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    pairs = qd.crossJoin(
        d.select("doc_id", F.col("text").alias("doc_text"))
    )

    def score(qs, ds):
        out = []
        for q, t in zip(qs, ds):
            h = hashlib.md5(f"ce|{q}|{t}".encode()).hexdigest()
            out.append((int(h[:15], 16) % 1000001) / 1000000.0)
        return out

    via_model = rerank_with_model(pairs, score, 3)
    via_expr = rerank_topk(pairs, 3)
    a = sorted(map(tuple, via_model.collect()))
    b = sorted(map(tuple, via_expr.collect()))
    assert a == b and len(a) == 9
