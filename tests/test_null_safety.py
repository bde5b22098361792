"""Null/empty-input safety: real corpora contain null text, empty
strings, and null embedding vectors — every operator must degrade
gracefully (empty/neutral output), never throw."""

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.functions.embed import embed_text
from cs6300_vectordbs_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from cs6300_vectordbs_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_rows,
    simhash_buckets,
)
from cs6300_vectordbs_spark.operators.similarity import similarity_topk


@pytest.fixture(scope="module")
def dirty_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat here", "en", "a", 27),
            (2, None, "en", "b", 0),
            (3, "", "de", "c", 0),
            (4, "   \t  ", "fr", "d", 6),
            (5, "dog ran far away from home", "fr", "e", 26),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_dedup_family_survives_null_and_empty_text(dirty_docs):
    assert exact_dedup(dirty_docs).count() >= 3
    # null/empty/whitespace docs simply produce no shingles
    ids_with_shingles = {
        r.id for r in shingle_rows(dirty_docs, n=3).select("id").distinct().collect()
    }
    assert ids_with_shingles == {1, 5}
    assert ngram_jaccard_pairs(dirty_docs, n=3, min_jaccard=0.1).count() == 0
    assert (
        minhash_lsh_pairs(
            dirty_docs, num_hashes=16, bands=4, shingle_n=3, min_jaccard=0.1
        ).count()
        == 0
    )


def test_simhash_keeps_every_doc_with_zero_fingerprint_fallback(dirty_docs):
    out = simhash_buckets(dirty_docs, n=2)
    assert out.agg(F.sum("dup_count")).collect()[0][0] == 5
    zero = out.filter(F.col("simhash") == 0).collect()
    assert zero and zero[0].dup_count >= 3  # docs 2,3,4 share fingerprint 0


def test_text_functions_null_in_null_or_neutral_out(dirty_docs):
    rows = dirty_docs.select(
        "doc_id",
        token_count("text").alias("tc"),
        quality_score("text").alias("q"),
        lang_id("text").alias("l"),
        doc_fingerprint("text").alias("fp"),
        embed_text("text", dim=4).alias("e"),
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[2].tc is None or by_id[2].tc == 0  # null text
    assert by_id[3].tc == 0 and by_id[3].l == "und"  # empty text
    assert by_id[4].tc == 0  # whitespace-only


def test_topk_null_corpus_vector_ranks_last(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "query_id long, query_vec array<float>"
    )
    got = similarity_topk(emb, q, 2, dim=2, exclude_self=True).collect()
    assert [r.vec_id for r in got] == [3]  # null-vec row never outranks real sims
