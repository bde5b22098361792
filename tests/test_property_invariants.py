"""Hypothesis property tests for the invariants the oracle
differential can't randomize on its own: the driver gate replays FIXED
testdata, so these generate adversarial inputs per run (SURVEY §5's
determinism rules say the operators must hold for ANY input, not just
the checked-in parquet).

Each property is cheap (tiny frames, one shared session,
max_examples bounded) — the goal is shape coverage, not soak time.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(
    toks=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=64),
)
def test_pack_sequences_partitions_every_token_exactly_once(spark, toks, budget):
    """Every document's tokens land in exactly one contiguous run of
    spans: per-doc span n_tok sums to the doc's token count, spans
    never exceed the budget, and per-sequence occupancy is exactly
    budget for every sequence except possibly the last."""
    from cs6300_vectordbs_spark.operators.packing import pack_sequences

    rows = [(i, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    spans = pack_sequences(df, budget=budget, num_partitions=2).collect()

    per_doc: dict[int, int] = {}
    per_seq: dict[int, int] = {}
    for r in spans:
        assert 0 < r.n_tok <= budget
        assert 0 <= r.offset and r.offset + r.n_tok <= budget
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_tok
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_tok
    assert per_doc == {i: n for i, n in rows if n > 0}
    if per_seq:
        last = max(per_seq)
        for s, occ in per_seq.items():
            assert occ == budget or s == last, (s, occ)


@SETTINGS
@given(
    vals=st.lists(
        st.floats(
            min_value=-1.0, max_value=1.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_quantized_mean_is_partition_order_independent(spark, vals):
    """The r05 k-means mean rule (quantize 1e12 -> exact bigint sum ->
    divide -> round 9) must give bit-identical results under ANY
    partitioning/merge order, and match the python fold."""
    rows = [(i, [v]) for i, v in enumerate(vals)]

    def mean_of(df):
        got = (
            df.groupBy(F.lit(1).alias("g"))
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.expr(
                    "sum(CAST(ROUND(CAST(vec[0] AS DOUBLE) * 1.0E12)"
                    " AS BIGINT))"
                ).alias("__s"),
            )
            .select(
                F.expr("round(CAST(__s AS DOUBLE) / __n / 1.0E12, 9)")
                .alias("m")
            )
            .collect()[0]["m"]
        )
        return got

    df = spark.createDataFrame(rows, "id long, vec array<double>")
    m1 = mean_of(df.repartition(1))
    m8 = mean_of(df.repartition(8, "id"))
    assert m1 == m8

    def half_up(x, exp):
        return Decimal(repr(x)).quantize(Decimal(exp), rounding=ROUND_HALF_UP)

    q = [int(half_up(v * 1e12, "1")) for v in vals]
    ref = float(half_up(float(sum(q)) / len(q) / 1e12, "1E-9"))
    assert m1 == ref


_LINE_CHARS = st.text(
    alphabet=st.sampled_from("abc,0123456789 x"), min_size=0, max_size=20
)


@SETTINGS
@given(lines=st.lists(_LINE_CHARS, min_size=1, max_size=20))
def test_split_csv_lines_loses_nothing(spark, tmp_path_factory, lines):
    """Conservation law for the quarantine split: every non-header
    input line lands in exactly one of (good, bad) — nothing dropped,
    nothing duplicated, regardless of content."""
    from cs6300_vectordbs_spark.sources.ingest import split_csv_lines

    header = "a,b,c"
    p = tmp_path_factory.mktemp("csv") / "f.csv"
    p.write_text("\n".join([header] + lines) + "\n")
    raw = spark.read.text(str(p)).filter(F.trim("value") != "")
    good, bad = split_csv_lines(
        raw, "a bigint, b string, c bigint", header=header
    )
    n_input = len([
        ln for ln in lines if ln.strip() != "" and ln != header
    ])
    assert good.count() + bad.count() == n_input


@SETTINGS
@given(
    text=st.text(
        alphabet=st.sampled_from("ab cd\n.!"), min_size=0, max_size=80
    ),
    dup=st.integers(min_value=2, max_value=4),
)
def test_minhash_identical_docs_always_pair(spark, text, dup):
    """Exact duplicates share every shingle, hence every MinHash band —
    the LSH candidate join must ALWAYS emit the duplicate pairs with
    jaccard 1.0 (no false negatives on true duplicates)."""
    from cs6300_vectordbs_spark.operators.dedup import minhash_lsh_pairs

    body = "filler " * 4 + text  # ensure enough shingles to sign
    rows = [(i, body) for i in range(dup)] + [(99, "totally other words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, min_jaccard=0.99).collect()
    }
    expect = {(a, b) for a in range(dup) for b in range(dup) if a < b}
    assert expect <= pairs
