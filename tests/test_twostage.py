"""Two-stage compressed serving (operators/twostage.py) and MMR
diversified re-rank (operators/rerank.py mmr_rerank).

Covers: sign-bit packing correctness against a pure-Python reference,
degeneration of each two-stage search to the exact kernel when the
coarse pass keeps everything, candidate-budget semantics, MMR's greedy
objective (lambda endpoints, negative redundancy, id tie-breaks), NULL
handling, argument validation, and the scale-critical plan shapes.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.rerank import mmr_rerank
from cs6300_vectordbs_spark.operators.similarity import similarity_topk
from cs6300_vectordbs_spark.operators.twostage import (
    WORD_BITS,
    bq_pack_words,
    bq_topk,
    matryoshka_topk,
)

DIM = 64


def _queries(emb, n=5):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# sign-bit packing
# ---------------------------------------------------------------------------

def _py_pack(vec, word_bits=WORD_BITS):
    words = []
    for w in range(0, len(vec), word_bits):
        acc = 0
        for x in vec[w : w + word_bits]:
            acc = acc * 2 + (1 if x > 0.0 else 0)
        words.append(acc)
    return words


def test_bq_pack_matches_python_reference(spark, emb):
    rows = emb.select(
        "vec_id",
        "embedding",
        *[c.alias(f"w{i}") for i, c in enumerate(bq_pack_words("embedding", DIM))],
    ).limit(50).collect()
    n_words = (DIM + WORD_BITS - 1) // WORD_BITS
    assert n_words == 2
    for r in rows:
        expect = _py_pack([float(x) for x in r.embedding])
        got = [r[f"w{i}"] for i in range(n_words)]
        assert got == expect, f"vec {r.vec_id}"


def test_bq_pack_edge_vectors(spark):
    df = spark.createDataFrame(
        [
            (1, [0.0] * DIM),          # zero vector -> all-zero words
            (2, [1.0] * DIM),          # all-positive -> all-ones words
            (3, [-1.0] * DIM),         # all-negative -> all-zero words
            (4, [1.0] + [-1.0] * (DIM - 1)),  # MSB of word 0 only
        ],
        "vec_id int, embedding array<double>",
    )
    got = {
        r.vec_id: [r.w0, r.w1]
        for r in df.select(
            "vec_id",
            *[c.alias(f"w{i}") for i, c in enumerate(bq_pack_words("embedding", DIM))],
        ).collect()
    }
    assert got[1] == [0, 0]
    assert got[2] == [2**WORD_BITS - 1, 2**WORD_BITS - 1]
    assert got[3] == [0, 0]
    assert got[4] == [2 ** (WORD_BITS - 1), 0]


def test_bq_pack_null_vector_yields_null_words(spark):
    df = spark.createDataFrame(
        [(1, None)], "vec_id int, embedding array<double>"
    )
    r = df.select(
        *[c.alias(f"w{i}") for i, c in enumerate(bq_pack_words("embedding", DIM))]
    ).collect()[0]
    assert r.w0 is None and r.w1 is None


def test_bq_pack_odd_dim_partial_last_word(spark):
    # dim=40 -> word 0 packs 32 dims, word 1 packs the remaining 8.
    df = spark.createDataFrame(
        [(1, [1.0] * 40)], "vec_id int, embedding array<double>"
    )
    r = df.select(
        *[c.alias(f"w{i}") for i, c in enumerate(bq_pack_words("embedding", 40))]
    ).collect()[0]
    assert r.w0 == 2**32 - 1 and r.w1 == 2**8 - 1


# ---------------------------------------------------------------------------
# bq_topk
# ---------------------------------------------------------------------------

def test_bq_topk_schema_and_budget(spark, emb):
    out = bq_topk(emb, _queries(emb), 3, dim=DIM, refine=4).collect()
    assert {r.query_id for r in out} == {0, 1, 2, 3, 4}
    for qid in range(5):
        rows = sorted((r for r in out if r.query_id == qid), key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3]
        sims = [r.sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.dist == 1.0 - r.sim for r in rows)
        assert all(0 <= r.hamming <= DIM for r in rows)


def test_bq_topk_degenerates_to_exact_when_refine_covers_corpus(spark, emb):
    n = emb.count()
    exact = similarity_topk(emb, _queries(emb), 5, dim=DIM).collect()
    bq = bq_topk(emb, _queries(emb), 5, dim=DIM, refine=(n // 5) + 1).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.vec_id, r.sim) for r in rows)
    assert key(bq) == key(exact)  # bit-identical, not approximately


def test_bq_topk_exclude_self(spark, emb):
    out = bq_topk(emb, _queries(emb), 5, dim=DIM, exclude_self=True).collect()
    assert all(r.vec_id != r.query_id for r in out)
    # Self has hamming 0 and sim 1.0; without exclusion it ranks first.
    withself = bq_topk(emb, _queries(emb), 1, dim=DIM).collect()
    assert all(r.vec_id == r.query_id for r in withself)


def test_bq_topk_null_vector_never_ranks(spark, emb):
    emb_d = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    nulled = emb_d.union(
        spark.range(1).select(
            F.lit(999999).alias("vec_id"),
            F.lit(None).cast("array<double>").alias("embedding"),
        )
    )
    out = bq_topk(nulled, _queries(emb_d), 5, dim=DIM, refine=1000).collect()
    assert all(r.vec_id != 999999 for r in out)


# ---------------------------------------------------------------------------
# matryoshka_topk
# ---------------------------------------------------------------------------

def test_matryoshka_full_prefix_degenerates_to_exact(spark, emb):
    n = emb.count()
    exact = similarity_topk(emb, _queries(emb), 5, dim=DIM).collect()
    mat = matryoshka_topk(
        emb, _queries(emb), 5, dim=DIM, prefix_dim=DIM, refine=(n // 5) + 1
    ).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.vec_id, r.sim) for r in rows)
    assert key(mat) == key(exact)
    # With prefix == dim the coarse score IS the exact score.
    assert all(r.sim_coarse == r.sim for r in mat)


def test_matryoshka_recall_reasonable_at_small_prefix(spark, emb):
    exact = similarity_topk(emb, _queries(emb, 10), 5, dim=DIM).collect()
    mat = matryoshka_topk(
        emb, _queries(emb, 10), 5, dim=DIM, prefix_dim=16, refine=4
    ).collect()
    truth = {(r.query_id, r.vec_id) for r in exact}
    got = {(r.query_id, r.vec_id) for r in mat}
    recall = len(truth & got) / len(truth)
    # Hash embeddings have NO matryoshka training bias, so this is the
    # floor case; trained MRL embeddings only do better.
    assert recall >= 0.3, recall


def test_matryoshka_prefix_dim_validation(spark, emb):
    with pytest.raises(ValueError, match="prefix_dim"):
        matryoshka_topk(emb, _queries(emb), 5, dim=DIM, prefix_dim=0)
    with pytest.raises(ValueError, match="prefix_dim"):
        matryoshka_topk(emb, _queries(emb), 5, dim=DIM, prefix_dim=DIM + 1)


# ---------------------------------------------------------------------------
# mmr_rerank
# ---------------------------------------------------------------------------

def _cand_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id bigint, vec_id bigint, sim double, embedding array<double>"
    )


def test_mmr_lambda_one_is_pure_relevance(spark, emb):
    cand = similarity_topk(emb, _queries(emb), 10, dim=DIM).select(
        "query_id", "vec_id", "sim"
    ).join(emb.select("vec_id", "embedding"), on="vec_id")
    out = mmr_rerank(cand, 5, lambda_=1.0).collect()
    exact = similarity_topk(emb, _queries(emb), 5, dim=DIM).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.vec_id) for r in rows)
    assert key(out) == key(exact)


def test_mmr_diversifies_duplicate_candidates(spark):
    # Two near-identical top candidates + one diverse: plain top-2 takes
    # the twins; MMR's second pick must be the diverse one.
    v = [1.0, 0.0, 0.0, 0.0]
    v_dup = [0.999, 0.001, 0.0, 0.0]
    v_div = [0.0, 1.0, 0.0, 0.0]
    cand = _cand_df(
        spark,
        [
            (7, 1, 0.99, v),
            (7, 2, 0.98, v_dup),
            (7, 3, 0.50, v_div),
        ],
    )
    out = sorted(mmr_rerank(cand, 2, lambda_=0.5).collect(), key=lambda r: r.rank)
    assert [r.vec_id for r in out] == [1, 3]
    assert out[0].mmr == 0.5 * 0.99 - 0.5 * 0.0


def test_mmr_negative_redundancy_is_a_bonus(spark):
    # The remaining candidate anti-correlates with the selected set:
    # its mmr EXCEEDS lambda*sim (paper semantics — no clamping at 0).
    v1 = [1.0, 0.0]
    v2 = [-1.0, 0.0]
    cand = _cand_df(spark, [(1, 1, 0.9, v1), (1, 2, 0.1, v2)])
    out = {r.rank: r for r in mmr_rerank(cand, 2, lambda_=0.5).collect()}
    assert out[1].vec_id == 1
    # redundancy of v2 vs {v1} is cos = -1.0 -> mmr = .5*.1 - .5*(-1)
    assert out[2].mmr == 0.5 * 0.1 - 0.5 * (-1.0)
    assert out[2].mmr > 0.5 * 0.1


def test_mmr_tie_breaks_by_id_ascending(spark):
    v = [1.0, 0.0]
    w = [0.0, 1.0]
    cand = _cand_df(spark, [(1, 9, 0.5, v), (1, 4, 0.5, w)])
    out = {r.rank: r.vec_id for r in mmr_rerank(cand, 2, lambda_=1.0).collect()}
    assert out[1] == 4 and out[2] == 9


def test_mmr_short_group_and_null_sims(spark):
    v = [1.0, 0.0]
    cand = _cand_df(
        spark, [(1, 1, 0.9, v), (1, 2, None, v), (2, 5, 0.4, v)]
    )
    out = mmr_rerank(cand, 3, lambda_=0.5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    assert by_q == {1: [1], 2: [5]}  # null-sim row dropped, short groups ok


def test_mmr_lambda_validation(spark):
    cand = _cand_df(spark, [(1, 1, 0.5, [1.0, 0.0])])
    with pytest.raises(ValueError, match="lambda_"):
        mmr_rerank(cand, 2, lambda_=1.5)


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------

def test_bq_plan_partial_topk_broadcast_no_python(spark, emb):
    plan = plan_of(bq_topk(emb, _queries(emb), 5, dim=DIM))
    assert "WindowGroupLimit" in plan  # both stages keep the partial top-k
    assert "BroadcastNestedLoopJoin" in plan  # queries broadcast, corpus in place
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_matryoshka_plan_partial_topk_broadcast_no_python(spark, emb):
    plan = plan_of(matryoshka_topk(emb, _queries(emb), 5, dim=DIM, prefix_dim=16))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mmr_plan_single_group_exchange(spark, emb):
    cand = similarity_topk(emb, _queries(emb), 10, dim=DIM).select(
        "query_id", "vec_id", "sim"
    ).join(emb.select("vec_id", "embedding"), on="vec_id")
    plan = plan_of(mmr_rerank(cand, 5))
    # The greedy kernel is Arrow-batched per query group (formatted
    # explain names each node twice: tree + detail section), and never
    # a row-at-a-time Python stage.
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# facade integration: search(..., diversify='mmr')
# ---------------------------------------------------------------------------

def test_search_facade_mmr_matches_explicit_pipeline(spark, emb):
    from cs6300_vectordbs_spark.operators.search import search

    got = search(
        emb, _queries(emb, 10), 5, dim=DIM, diversify="mmr",
        mmr_candidates=20, exclude_self=True,
    ).collect()
    cand = similarity_topk(emb, _queries(emb, 10), 20, dim=DIM,
                           exclude_self=True).select(
        "query_id", "vec_id", "sim"
    ).join(emb.select("vec_id", "embedding"), on="vec_id")
    want = mmr_rerank(cand, 5, lambda_=0.5).collect()
    key = lambda rows: sorted(
        (r.query_id, r.rank, r.vec_id, r.sim, r.mmr) for r in rows
    )
    assert key(got) == key(want) and len(want) == 50


def test_search_facade_diversify_validation(spark, emb):
    from cs6300_vectordbs_spark.operators.search import search

    with pytest.raises(ValueError, match="diversify"):
        search(emb, _queries(emb), 5, dim=DIM, diversify="dpp")


def test_matryoshka_prefix_above_unroll_is_true_prefix(spark):
    """prefix_dim > UNROLL_MAX_DIM must still score the PREFIX: the
    dim=N early-stop is unavailable there (dot/l2_norm fall back to a
    whole-array fold), so the operator slices explicitly. The original
    form silently made sim_coarse the exact full-dim cosine."""
    import random

    from cs6300_vectordbs_spark.functions.vector import (
        UNROLL_MAX_DIM,
        cosine_sim,
    )

    dim, pref = UNROLL_MAX_DIM + 44, UNROLL_MAX_DIM + 24
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(dim)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    qs = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = matryoshka_topk(
        df, qs, 3, dim=dim, prefix_dim=pref, refine=5, exclude_self=True
    )
    # Expected coarse score: cosine over the sliced arrays (HOF form).
    expect = (
        df.crossJoin(
            qs.select(
                F.col("query_id"), F.col("query_vec").alias("__qv")
            )
        )
        .select(
            "query_id",
            "vec_id",
            cosine_sim(
                F.slice(F.col("__qv"), 1, pref),
                F.slice(F.col("embedding"), 1, pref),
            ).alias("want_coarse"),
        )
    )
    joined = out.join(expect, on=["query_id", "vec_id"]).collect()
    assert len(joined) == 9
    assert all(r.sim_coarse == r.want_coarse for r in joined)
    # And the coarse score is genuinely the prefix, not the full cosine.
    assert any(r.sim_coarse != r.sim for r in joined)
