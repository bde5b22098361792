"""Sequence packing + mixture-weight operators (training-data stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.functions.text import token_count
from cs6300_vectordbs_spark.operators.packing import (
    global_running_totals,
    mixture_epoch_plan,
    pack_sequences,
    source_mixture_weights,
)

BUDGET = 64


def _tok_table(docs):
    return docs.select(
        F.col("doc_id").cast("bigint"),
        token_count("text").cast("bigint").alias("n_tokens"),
    )


def test_global_running_totals_matches_serial_cumsum(docs):
    toks = _tok_table(docs)
    got = {
        r.doc_id: r["__end"]
        for r in global_running_totals(
            toks, ["doc_id"], "n_tokens", num_partitions=7
        ).collect()
    }
    acc, want = 0, {}
    for r in sorted(toks.collect(), key=lambda r: r.doc_id):
        acc += r.n_tokens
        want[r.doc_id] = acc
    assert got == want


def test_pack_sequences_invariants(docs):
    toks = _tok_table(docs)
    out = pack_sequences(toks, budget=BUDGET, num_partitions=5).collect()
    total = sum(r.n_tokens for r in toks.collect())
    n_seqs = (total + BUDGET - 1) // BUDGET

    # Every sequence id in [0, n_seqs) appears; all but the last are
    # exactly full; the stream has no holes and no overlaps.
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append(r)
    assert sorted(by_seq) == list(range(n_seqs))
    for sid, rows in by_seq.items():
        rows.sort(key=lambda r: r.offset)
        assert rows[0].offset == 0
        for a, b in zip(rows, rows[1:]):
            assert a.offset + a.n_tok == b.offset  # contiguous
        filled = rows[-1].offset + rows[-1].n_tok
        assert filled == (BUDGET if sid < n_seqs - 1 else total - BUDGET * sid)

    # Per-document: spans cover the doc's tokens exactly once, in order.
    per_doc = {}
    for r in out:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_tok
    for r in toks.collect():
        assert per_doc.get(r.doc_id, 0) == r.n_tokens


def test_pack_sequences_split_doc_spans_adjacent_sequences(spark):
    toks = spark.createDataFrame(
        [(1, 10), (2, 100), (3, 20)], "doc_id long, n_tokens long"
    )
    out = sorted(
        pack_sequences(toks, budget=BUDGET, num_partitions=2).collect(),
        key=lambda r: (r.doc_id, r.seq_id),
    )
    # doc 2: starts at 10, ends at 110 -> spans seq0 [10,64) and seq1 [0,46)
    d2 = [r for r in out if r.doc_id == 2]
    assert [(r.seq_id, r.offset, r.n_tok) for r in d2] == [
        (0, 10, 54), (1, 0, 46),
    ]


def test_source_mixture_weights_sum_to_one_and_upsample_rare(docs):
    out = source_mixture_weights(docs, temperature=0.7).collect()
    assert sum(r.weight for r in out) == pytest.approx(1.0, abs=1e-6)
    assert sum(r.share for r in out) == pytest.approx(1.0, abs=1e-6)
    # T < 1 compresses the range: rare sources gain weight vs share,
    # dominant sources lose.
    rare = min(out, key=lambda r: r.n_items)
    big = max(out, key=lambda r: r.n_items)
    if rare.n_items != big.n_items:
        assert rare.weight > rare.share
        assert big.weight < big.share


def test_mixture_epoch_plan_golden(spark):
    # two sources: A has 100 tokens over 2 docs, B has 400 over 1 doc.
    # T=0.5 weights: sqrt(0.2)=0.4472136, sqrt(0.8)=0.8944272 ->
    # w_A = 1/3, w_B = 2/3 exactly (sqrt(.2)/(sqrt(.2)+sqrt(.8))).
    docs = spark.createDataFrame(
        [("A", 40), ("A", 60), ("B", 400)], "source string, n_tokens long"
    )
    out = {r.source: r for r in mixture_epoch_plan(docs, budget=600).collect()}
    assert out["A"].n_docs == 2 and out["A"].avail_tokens == 100
    assert out["A"].weight == pytest.approx(1 / 3, abs=1e-9)
    # target 600 * 1/3 = 200 tokens but only 100 available -> 2 epochs
    assert out["A"].target_tokens == pytest.approx(200.0, abs=1e-3)
    assert out["A"].epochs == pytest.approx(2.0, abs=1e-6)
    assert bool(out["A"].oversampled) is True
    # B: target 400.0 of 400 available -> exactly one pass, NOT
    # oversampled even though round(9) weight dust puts raw epochs at
    # 1.000000001 (the flag compares the 3-decimal target to the
    # integer avail, not epochs to 1.0).
    assert out["B"].epochs == pytest.approx(1.0, abs=1e-6)
    assert bool(out["B"].oversampled) is False


def test_mixture_epoch_plan_keeps_null_source_group(spark):
    # a NULL source is a legal GROUP BY group; the doc-count join is
    # null-safe so the row survives (a plain equi-join drops it).
    docs = spark.createDataFrame(
        [("A", 100), (None, 50)], "source string, n_tokens long"
    )
    out = mixture_epoch_plan(docs, budget=300).collect()
    assert len(out) == 2
    nullrow = [r for r in out if r.source is None][0]
    assert nullrow.n_docs == 1 and nullrow.avail_tokens == 50
