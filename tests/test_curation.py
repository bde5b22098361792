"""Unit semantics for operators/curation.py: BPE pair statistics and
DSIR importance weights."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.curation import (
    bpe_pair_counts,
    dsir_log_weights,
    source_kl_divergence,
    word_counts,
)


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "low lower lowest", "a"),
            (2, "low low newer", "a"),
            (3, "wider wider", "b"),
            (4, "", "b"),          # token-less: must not crash / contribute
            (5, None, "b"),        # NULL text: same
        ],
        "doc_id long, text string, source string",
    )


def test_word_counts(tiny):
    got = {r.w: r.wc for r in word_counts(tiny).collect()}
    assert got == {
        "low": 3, "lower": 1, "lowest": 1, "newer": 1, "wider": 2,
    }


def test_bpe_pair_counts_matches_hand_count(tiny):
    got = {r.pair: r.cnt for r in bpe_pair_counts(tiny).collect()}
    # 'lo'/'ow': low(x3) + lower + lowest = 5 each;
    # 'er': lower + newer + wider(x2) = 4; 'we': lower+lowest+newer = 3
    assert got["lo"] == 5
    assert got["ow"] == 5
    assert got["er"] == 4
    assert got["we"] == 3
    assert got["wi"] == 2 and got["id"] == 2 and got["de"] == 2
    # BPE's first merge = the argmax pair; with (cnt DESC, pair ASC)
    # total order the winner is deterministic: 'lo' beats tied 'ow'
    top = bpe_pair_counts(tiny, top_n=1).collect()[0]
    assert (top.cnt, top.pair) == (5, "lo")

def test_bpe_first_merge_exact(spark):
    # classic Sennrich example shape: counts weighted by word frequency
    docs = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "abc")], "doc_id long, text string"
    )
    got = {r.pair: r.cnt for r in bpe_pair_counts(docs).collect()}
    assert got == {"ab": 4, "bc": 1}


def test_dsir_weights_direction(spark):
    # target docs use 'alpha'; raw background uses 'beta'. A doc made of
    # 'alpha' must get a strictly higher weight than one made of 'beta'.
    rows = [(i, "alpha " * 5, "tgt") for i in range(10)]
    rows += [(100 + i, "beta " * 5, "raw") for i in range(10)]
    rows += [(200, "alpha alpha alpha alpha alpha", "raw"),
             (201, "beta beta beta beta beta", "raw")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r.log_w_micro
        for r in dsir_log_weights(docs, F.col("source") == "tgt").collect()
    }
    assert out[200] > out[201]
    # weight of an all-alpha doc: 5 tokens x quantized log-ratio; exact
    # reproduction of the add-1 unigram model
    t_cnt, q_cnt = 50.0, 55.0   # alpha tokens in target / in all docs
    t_tot, q_tot = 50.0, 110.0  # total target tokens / total tokens
    r = round(
        (math.log((t_cnt + 1) / (t_tot + 64)) - math.log((q_cnt + 1) / (q_tot + 64)))
        * 1e6
    )
    assert out[200] == 5 * r


def test_dsir_zero_token_docs_absent(tiny):
    out = dsir_log_weights(tiny, F.col("source") == "a")
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 2, 3}  # empty/NULL-text docs produce no row


def test_source_kl_divergence_golden(spark):
    # A: "x x y" (p_x=2/3, p_y=1/3); B: "y". Corpus: p_x=p_y=1/2.
    # KL_A = 2/3 ln(4/3) + 1/3 ln(2/3); KL_B = ln(2).
    docs = spark.createDataFrame(
        [("A", "x x y"), ("B", "y")], "source string, text string"
    )
    out = {r.source: r for r in source_kl_divergence(docs).collect()}
    assert out["A"].n_tokens == 3 and out["A"].vocab == 2
    assert out["B"].n_tokens == 1 and out["B"].vocab == 1
    kl_a = 2 / 3 * math.log(4 / 3) + 1 / 3 * math.log(2 / 3)
    # per-term nano-nat quantization: each term is within 0.5 nano,
    # two terms -> within 1 nano of the exact value.
    assert abs(out["A"].kl_nano - round(kl_a * 1e9)) <= 1
    assert abs(out["B"].kl_nano - round(math.log(2) * 1e9)) <= 1
