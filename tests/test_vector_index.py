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
