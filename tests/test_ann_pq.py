"""Product-quantized ANN: recall vs exact, code validity, plan shape."""

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.ann import pq_topk
from cs6300_vectordbs_spark.operators.similarity import similarity_topk
from tests.conftest import SF_DIR


def _setup(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return emb, qs


def test_pq_recall_at_5_vs_exact(spark):
    emb, qs = _setup(spark)
    exact = similarity_topk(emb, qs, 5, exclude_self=True, dim=64)
    approx = pq_topk(
        emb, qs, 5, dim=64, candidates_per_query=100, exclude_self=True
    )
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 16-entry sampled codebooks are coarse; with a 100-candidate pool
    # the exact re-rank recovers most of the true top-5.
    assert recall >= 0.6, recall


def test_pq_exact_rerank_sims_match_brute_force(spark):
    """Whatever candidates PQ surfaces, their reported sims must equal
    the exact cosine — the re-rank stage is not approximate."""
    emb, qs = _setup(spark)
    approx = pq_topk(emb, qs, 5, dim=64, exclude_self=True)
    exact = similarity_topk(emb, qs, 500, exclude_self=True, dim=64)
    ex = {
        (r.query_id, r.vec_id): r.sim for r in exact.collect()
    }
    for r in approx.collect():
        assert abs(ex[(r.query_id, r.vec_id)] - r.sim) == 0.0


def test_pq_candidate_stage_uses_window_group_limit(spark):
    from tests.test_plans import plan_of

    emb, qs = _setup(spark)
    plan = plan_of(pq_topk(emb, qs, 5, dim=64))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_recall_against_exact(spark, emb):
    """The IVF-PQ composite must behave like an ANN index: high recall
    vs the exact search at generous probe/candidate settings, exact
    ranks within its shortlist, deterministic across runs."""
    from cs6300_vectordbs_spark.operators.ann import ivfpq_topk
    from cs6300_vectordbs_spark.operators.similarity import similarity_topk
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    approx = ivfpq_topk(
        emb, queries, 5, dim=64, n_cells=8, n_probe=8, m=8, ksub=16,
        candidates_per_query=40, exclude_self=True,
    )
    got = {(r.query_id, r.vec_id) for r in approx.collect()}
    exact = similarity_topk(emb, queries, 5, exclude_self=True, dim=64)
    want = {(r.query_id, r.vec_id) for r in exact.collect()}
    # n_probe == n_cells probes every cell, so IVF prunes nothing and
    # recall loss can only come from the PQ shortlist.
    assert len(got & want) / len(want) >= 0.6
    # determinism: a second run returns the identical result set
    again = {
        (r.query_id, r.vec_id)
        for r in ivfpq_topk(
            emb, queries, 5, dim=64, n_cells=8, n_probe=8, m=8, ksub=16,
            candidates_per_query=40, exclude_self=True,
        ).collect()
    }
    assert again == got


def test_ivfpq_64bit_ids(spark):
    """r08 kernel review: the driver-built probe table declared
    `cell int` although cells carry raw corpus ids — 64-bit ids
    crashed createDataFrame. The schema now keeps the native types."""
    from cs6300_vectordbs_spark.operators.ann import ivfpq_topk

    big = spark.createDataFrame(
        [(2 ** 40 + i, [float((i * 7 + j) % 5 - 2) for j in range(8)])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    bq = spark.createDataFrame(
        [(2 ** 40 + i, [float((i * 3 + j) % 4 - 1) for j in range(8)])
         for i in range(3)],
        "query_id long, query_vec array<double>",
    )
    out = ivfpq_topk(big, bq, 3, dim=8, m=2, n_cells=4, n_probe=2)
    assert out.count() == 9
    assert all(r["vec_id"] >= 2 ** 40 for r in out.collect())
