"""sq8 scalar-quantized ANN: recall vs exact, determinism, plan."""

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.ann import sq8_topk
from cs6300_vectordbs_spark.operators.similarity import similarity_topk
from tests.conftest import SF_DIR


def _setup(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return emb, qs


def test_sq8_recall_at_5_vs_exact(spark):
    emb, qs = _setup(spark)
    exact = similarity_topk(emb, qs, 5, exclude_self=True, dim=64)
    approx = sq8_topk(
        emb, qs, 5, dim=64, candidates_per_query=50, exclude_self=True
    )
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # int8 quantization at 64-d barely perturbs cosine ordering; with a
    # 50-candidate pool recall@5 should be essentially perfect
    assert recall >= 0.9, recall


def test_sq8_integer_dots_bounded(spark):
    emb, qs = _setup(spark)
    out = sq8_topk(emb, qs, 5, dim=64, exclude_self=True)
    mx = out.agg(F.max(F.abs("q8_dot"))).first()[0]
    assert mx <= 64 * 127 * 127


def test_sq8_candidate_stage_uses_window_group_limit(spark):
    from tests.test_plans import plan_of

    emb, qs = _setup(spark)
    plan = plan_of(sq8_topk(emb, qs, 5, dim=64))
    assert "WindowGroupLimit" in plan
