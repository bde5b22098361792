"""Persistent binary-quantization index (sources/bq_index.py):
lifecycle, serving parity with the in-memory twin, and the
words-only first-pass plan shape."""

import contextlib
import io
import os

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.twostage import bq_topk
from cs6300_vectordbs_spark.sources.bq_index import (
    bq_index_exists,
    ensure_bq_index,
    search_bq_index,
)


def _queries(emb, n=10):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_persisted_search_equals_in_memory_bq(spark, emb, tmp_path):
    path = str(tmp_path / "bq")
    ensure_bq_index(spark, emb, path, dim=64)
    stored = search_bq_index(
        spark, path, emb, _queries(emb), 5, dim=64, refine=4,
        exclude_self=True,
    )
    direct = bq_topk(
        emb, _queries(emb), 5, dim=64, refine=4, exclude_self=True
    )
    got = {
        (r.query_id, r.rank, r.id, r.hamming, r.sim) for r in stored.collect()
    }
    want = {
        (r.query_id, r.rank, r.vec_id, r.hamming, r.sim)
        for r in direct.collect()
    }
    assert got == want and len(want) == 50  # bit-identical serving parity


def test_ensure_is_create_if_absent_and_param_addressed(spark, emb, tmp_path):
    path = str(tmp_path / "bq")
    assert not bq_index_exists(path)
    ensure_bq_index(spark, emb, path, dim=64)
    assert bq_index_exists(path)
    marker = f"{path}/words/_SUCCESS"
    before = os.path.getmtime(marker)
    ensure_bq_index(spark, emb, path, dim=64)  # unchanged -> reuse
    assert os.path.getmtime(marker) == before
    # A packing-parameter change over the SAME corpus must rebuild:
    # stored words under a different dim would produce wrong Hamming.
    ensure_bq_index(spark, emb, path, dim=40)
    assert os.path.getmtime(marker) > before


def test_ensure_rebuilds_on_corpus_change(spark, emb, tmp_path):
    path = str(tmp_path / "bq")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    ensure_bq_index(spark, half, path, dim=64)
    marker = f"{path}/words/_SUCCESS"
    before = os.path.getmtime(marker)
    ensure_bq_index(spark, emb, path, dim=64)  # content changed
    assert os.path.getmtime(marker) > before
    # Serving after the rebuild sees the full corpus.
    out = search_bq_index(
        spark, path, emb, _queries(emb, 1), 5, dim=64, refine=1000
    ).collect()
    assert {r.id for r in out} <= {r.vec_id for r in emb.collect()}


def test_null_vectors_quarantined_at_build(spark, emb, tmp_path):
    path = str(tmp_path / "bq")
    emb_d = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    withnull = emb_d.union(
        spark.range(1).select(
            F.lit(999999).alias("vec_id"),
            F.lit(None).cast("array<double>").alias("embedding"),
        )
    )
    ensure_bq_index(spark, withnull, path, dim=64)
    words = spark.read.parquet(f"{path}/words")
    assert words.filter(F.col("id") == 999999).count() == 0


def test_first_pass_reads_words_table_only(spark, emb, tmp_path):
    """The Hamming pass must scan the packed table, not the corpus:
    the corpus parquet appears in the plan only under the candidate
    row-fetch join (reading id/embedding), and the words scan carries
    no float column."""
    path = str(tmp_path / "bq")
    ensure_bq_index(spark, emb, path, dim=64)
    df = search_bq_index(spark, path, emb, _queries(emb), 5, dim=64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    words_reads = [ln for ln in reads if "w0:bigint" in ln]
    assert words_reads and all("embedding" not in ln for ln in words_reads)
    assert "WindowGroupLimit" in plan
