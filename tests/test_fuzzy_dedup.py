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
