"""Dedup family: exact, shingles, jaccard, minhash-vs-exact, simhash."""

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_buckets,
    word_shingles,
)


def test_exact_dedup_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),
            (3, "HELLO\tWORLD "),
            (4, "something else"),
        ],
        ["doc_id", "text"],
    )
    out = exact_dedup(df).collect()
    assert len(out) == 2
    by_id = {r.doc_id: r.dup_count for r in out}
    assert by_id == {1: 3, 4: 1}  # min id wins, count preserved


def test_word_shingles_basics(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, ""), (4, "x x x x")], ["id", "t"]
    )
    rows = {r.id: r.sh for r in df.select("id", word_shingles("t", 3).alias("sh")).collect()}
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == []  # shorter than n → empty, not crash
    assert rows[3] == []
    assert rows[4] == ["x x x"]  # distinct


def test_ngram_jaccard_exact_value(spark):
    # doc1: shingles {ab,bc,cd}; doc2: {ab,bc,ce} with n=2 →
    # intersection 2, union 4 → jaccard 0.5
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    out = ngram_jaccard_pairs(df, n=2, min_jaccard=0.0).collect()
    assert len(out) == 1
    assert out[0].jaccard == pytest.approx(2 / 4)


def test_minhash_estimates_track_exact_jaccard(docs):
    sub = docs.limit(200)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(sub, n=3, min_jaccard=0.2).collect()
    }
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(
            sub, num_hashes=16, bands=8, shingle_n=3, min_jaccard=None
        ).collect()
    }
    # every strongly-similar exact pair should be found by LSH with
    # bands=8 (collision prob at j=0.5 is 1-(1-0.5^2)^8 ≈ 0.9)
    strong = {k: v for k, v in exact.items() if v >= 0.5}
    found = [k for k in strong if k in est]
    assert len(strong) == 0 or len(found) / len(strong) >= 0.8
    # estimates within 0.35 of exact for found pairs (16 hashes is coarse)
    for k in found:
        assert abs(est[k] - exact[k]) <= 0.35


def test_simhash_identical_texts_share_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "utterly different content entirely")],
        ["doc_id", "text"],
    )
    out = {r.min_id: (r.simhash, r.dup_count) for r in simhash_buckets(df).collect()}
    assert out[1][1] == 2  # docs 1,2 share a bucket
    assert len(out) == 2


def test_simhash_hamming_close_for_near_dups(spark):
    a = "one two three four five six seven eight nine ten"
    b = a + " eleven"
    c = "totally unrelated words appear in this sentence here now"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["id", "t"])
    fps = {r.id: r.f for r in df.select("id", simhash64("t").alias("f")).collect()}

    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert hamming(fps[1], fps[2]) < hamming(fps[1], fps[3])


def test_simhash_empty_text_is_zero(spark):
    df = spark.createDataFrame([(1, ""), (2, "one")], ["id", "t"])
    fps = {r.id: r.f for r in df.select("id", simhash64("t", 2).alias("f")).collect()}
    assert fps[1] == 0 and fps[2] == 0  # both below shingle length


def test_jaccard_plan_has_no_forced_broadcast(docs):
    # the per-doc sizes table must not carry a broadcast HINT (a
    # scale-killer at 1e9 docs); AQE choosing broadcast at runtime for
    # genuinely small inputs is fine — hints are not
    plan = (
        ngram_jaccard_pairs(docs, min_jaccard=0.5)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ResolvedHint" not in plan and "UnresolvedHint" not in plan


def test_simhash_pairs_equal_brute_force(spark, docs):
    """Banded candidate generation must be recall-EXACT for hamming<=3
    (pigeonhole over 4x16-bit bands) — compare against the all-pairs
    XOR popcount on the same fingerprints, including sign-bit cases."""
    from cs6300_vectordbs_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(docs, n=2, max_hamming=3).collect()
    }
    fp = simhash_fingerprints(docs, n=2)
    a = fp.select(F.col("id").alias("id_a"), F.col("simhash").alias("fa"))
    b = fp.select(F.col("id").alias("id_b"), F.col("simhash").alias("fb"))
    want = {
        (r.id_a, r.id_b, r.h)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
            .cast("bigint")
            .alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert got == want and len(want) > 0
