"""Hand-computed golden cases for Gopher-style repetition signals."""

import pytest

from cs6300_vectordbs_spark.operators.quality import repetition_stats


@pytest.fixture(scope="module")
def stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a b"),        # dup_token 1/3; bigrams {a a, a b} distinct
            (2, "x x x x"),      # dup_token 3/4; bigram "x x" ×3 -> top 1.0
            (3, ""),             # no tokens at all
            (4, "solo"),         # one token, no bigrams
        ],
        "doc_id long, text string",
    )
    return {r.doc_id: r for r in repetition_stats(docs).collect()}


def test_mixed_doc(stats):
    r = stats[1]
    assert r.n_tokens == 3
    assert r.dup_token_frac == pytest.approx(1 / 3, abs=1e-15)
    assert r.dup_bigram_frac == 0.0
    assert r.top_bigram_frac == pytest.approx(1 / 2, abs=1e-15)


def test_fully_repeated_doc(stats):
    r = stats[2]
    assert r.n_tokens == 4
    assert r.dup_token_frac == pytest.approx(3 / 4, abs=1e-15)
    assert r.dup_bigram_frac == pytest.approx(2 / 3, abs=1e-15)
    assert r.top_bigram_frac == 1.0


def test_empty_and_single_token_docs_zero_filled(stats):
    assert len(stats) == 4
    for doc_id in (3, 4):
        r = stats[doc_id]
        assert (r.dup_token_frac, r.dup_bigram_frac, r.top_bigram_frac) == (
            0.0, 0.0, 0.0,
        )
    assert stats[3].n_tokens == 0
    assert stats[4].n_tokens == 1


def test_heavy_hitters_golden(spark):
    from cs6300_vectordbs_spark.operators.quality import heavy_hitters

    docs = spark.createDataFrame(
        [(1, "b a b c"), (2, "b a a")], "doc_id long, text string"
    )
    got = [(r.rank, r.token, r.cnt) for r in heavy_hitters(docs, n=2).collect()]
    # a and b tie at 3 -> token-ascending breaks the tie
    assert sorted(got) == [(1, "a", 3), (2, "b", 3)]


def test_heavy_hitters_plan_partial_agg_and_heap_topn(spark):
    from cs6300_vectordbs_spark.operators.quality import heavy_hitters
    from tests.test_plans import plan_of

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = plan_of(heavy_hitters(docs, n=5))
    # count must partial-aggregate map-side (skew absorption) and the
    # top-n must be a heap merge, not a global sort
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
