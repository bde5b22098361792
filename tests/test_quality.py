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
