"""Persistent IVF index: lifecycle, pruning, and parity with ivf_topk."""

import os

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.ann import ivf_topk
from cs6300_vectordbs_spark.sources.vector_index import (
    ensure_ivf_index,
    ivf_index_exists,
    search_ivf_index,
)
from tests.conftest import SF_DIR


def _queries(emb, n=10):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_persisted_search_equals_in_memory_ivf(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    ensure_ivf_index(spark, emb, path, dim=64, n_cells=16)
    stored = search_ivf_index(
        spark, path, _queries(emb), 5, dim=64, n_probe=4, exclude_self=True
    )
    direct = ivf_topk(
        emb, _queries(emb), 5, dim=64, n_cells=16, n_probe=4,
        exclude_self=True,
    )
    got = {(r.query_id, r.rank, r.id, r.sim) for r in stored.collect()}
    want = {(r.query_id, r.rank, r.vec_id, r.sim) for r in direct.collect()}
    assert got == want and len(want) > 0


def test_ensure_index_is_create_if_absent(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    assert not ivf_index_exists(path)
    ensure_ivf_index(spark, emb, path, dim=64)
    assert ivf_index_exists(path)
    marker = f"{path}/cells/_SUCCESS"
    before = os.path.getmtime(marker)
    ensure_ivf_index(spark, emb, path, dim=64)  # must reuse, not rebuild
    assert os.path.getmtime(marker) == before


def test_probed_search_prunes_cell_partitions(spark, emb, tmp_path):
    """The stored-cells scan must carry the literal cell IN filter as a
    partition filter — unprobed cell directories are never listed."""
    from tests.test_plans import plan_of

    path = str(tmp_path / "ivf")
    ensure_ivf_index(spark, emb, path, dim=64)
    out = search_ivf_index(spark, path, _queries(emb, 3), 5, dim=64, n_probe=2)
    plan = plan_of(out)
    assert "PartitionFilters" in plan and "cell#" in plan
    # and the results are still k-deep per query
    assert out.groupBy("query_id").count().agg(F.min("count")).first()[0] == 5


def test_incremental_upsert_then_search_and_compact(spark, emb, tmp_path):
    """Build on 90% of the corpus, upsert the held-out 10% + an updated
    version of one existing id; serving sees the union with latest-wins,
    and compaction restores one row per id."""
    from cs6300_vectordbs_spark.sources.vector_index import (
        compact_ivf_index,
        upsert_ivf_index,
    )

    path = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") % 10 != 9)
    held = emb.filter(F.col("vec_id") % 10 == 9)
    ensure_ivf_index(spark, base, path, dim=64)
    upsert_ivf_index(spark, held, path, dim=64, gen=1)
    # re-upsert one existing id with a sentinel vector
    sentinel = emb.filter(F.col("vec_id") == 20).select(
        "vec_id", F.expr("transform(embedding, x -> float(0.5))").alias("embedding")
    )
    upsert_ivf_index(spark, sentinel, path, dim=64, gen=2)

    cells = spark.read.parquet(f"{path}/cells")
    n_ids = emb.count()
    assert cells.count() == n_ids + 1  # one duplicated id pre-compaction

    out = search_ivf_index(spark, path, _queries(emb), 5, dim=64, n_probe=16)
    # full probe (all 16 cells) -> latest-wins must serve the sentinel,
    # and every indexed id must be visible exactly once
    assert out.groupBy("query_id").count().agg(F.min("count")).first()[0] == 5

    compact_ivf_index(spark, path)
    after = spark.read.parquet(f"{path}/cells")
    assert after.count() == n_ids
    assert after.select("id").distinct().count() == n_ids
    # the compacted row for id 20 is the gen-2 sentinel
    v = after.filter(F.col("id") == 20).select("vec").first()[0]
    assert abs(v[0] - 0.5) < 1e-6
