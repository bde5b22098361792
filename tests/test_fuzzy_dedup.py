"""Unit semantics for edit_distance_neardup: byte-level Levenshtein
verification over MinHash-LSH candidates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.dedup import (
    _byte_form,
    edit_distance_neardup,
)


def test_byte_form_levenshtein_matches_duckdb(spark):
    """Spark levenshtein over the latin-1 byte form must equal
    DuckDB's byte-based levenshtein on multibyte input."""
    import duckdb

    cases = [("café x", "cafe x"), ("ab", "aéb"), ("kitten", "sitting")]
    df = spark.createDataFrame(cases, "a string, b string")
    got = [
        r[0]
        for r in df.select(
            F.levenshtein(_byte_form(F.col("a")), _byte_form(F.col("b")))
        ).collect()
    ]
    want = [
        duckdb.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0]
        for a, b in cases
    ]
    assert got == want


def test_candidate_verify_flags(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("delta", "delXa")),   # tiny edit: near-dup
            (3, " ".join(sorted(base.split(), reverse=True))),  # same
            # shingle-less reordering partner intentionally absent:
            (4, "totally different words entirely unrelated content here now"),
        ],
        "doc_id long, text string",
    )
    out = edit_distance_neardup(
        docs, num_hashes=16, bands=8, shingle_n=2,
        min_est_jaccard=0.1, max_rel_dist=0.2,
    ).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    r12 = pairs[(1, 2)]
    # normalization lowercases: delta -> delxa is ONE substitution
    assert r12.edit_dist == 1 and r12.is_dup
    # candidate set never includes the unrelated doc
    assert not any(4 in p for p in pairs)


def test_rel_dist_normalization(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h x y z w q r s t")],
        "doc_id long, text string",
    )
    out = edit_distance_neardup(
        docs, num_hashes=16, bands=8, shingle_n=2,
        min_est_jaccard=0.1, max_rel_dist=0.5,
    ).collect()
    if out:  # pair only surfaces if LSH bands collide
        r = out[0]
        assert r.rel_dist == pytest.approx(r.edit_dist / 31)  # longer text


class TestDupSpanRemoval:
    def test_hand_removal(self, spark):
        from cs6300_vectordbs_spark.operators.dedup import dup_span_removal

        df = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "x x a b c d y"),
                (3, "p q r s"),
                (4, None),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in dup_span_removal(df, n=4).collect()}
        # 'a b c d' is the only duplicated span; its 4 positions go.
        assert got[1].cleaned_text == "e f" and got[1].kept_tokens == 2
        assert got[2].cleaned_text == "x x y" and got[2].kept_tokens == 3
        assert got[3].cleaned_text == "p q r s"  # untouched
        assert got[4].cleaned_text == "" and got[4].n_tokens == 0

    def test_counts_consistent_with_stats(self, spark):
        from cs6300_vectordbs_spark.operators.dedup import (
            dup_span_removal,
            dup_span_stats,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        stats = {r.doc_id: r for r in dup_span_stats(docs, n=4).collect()}
        rem = {r.doc_id: r for r in dup_span_removal(docs, n=4).collect()}
        for did, s in stats.items():
            r = rem[did]
            assert r.n_tokens == s.n_tokens
            assert r.kept_tokens == s.n_tokens - s.covered_tokens


class TestKnnLabelVote:
    def test_hand_vote(self, spark):
        from cs6300_vectordbs_spark.operators.similarity import (
            knn_label_vote,
        )
        from pyspark.sql import functions as F

        # query 0 at origin-ish; labels: two 'A'(1) close, one 'B'(2)
        # closer than one of the As -> majority still A.
        vecs = [
            (0, [1.0, 0.0], 9),
            (1, [0.99, 0.1], 1),
            (2, [0.95, 0.2], 1),
            (3, [0.999, 0.05], 2),
            (4, [0.0, 1.0], 2),
        ]
        emb = spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        )
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        out = knn_label_vote(emb, q, 3, exclude_self=True).collect()
        assert len(out) == 1
        assert out[0].pred_label == 1 and out[0].n_votes == 2
