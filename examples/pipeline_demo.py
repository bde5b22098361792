"""End-to-end pipeline demo — the reference harness's full lifecycle
(ingest -> embed -> index -> search -> judge -> metrics,
/root/reference/src/chroma.py:48-155) plus the training-data curation
stages this engine adds, strung together through the public library
API. Runs in ~30 s on sf0.001:

    python examples/pipeline_demo.py [sf_dir]

Every stage is the same operator the driver-checked queries use; this
file exists to show the composition, not new logic (it is smoke-tested
in tests/test_example_pipeline.py).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from cs6300_vectordbs_spark import get_spark
    from cs6300_vectordbs_spark.functions.embed import embed_documents
    from cs6300_vectordbs_spark.functions.text import lang_id, quality_score
    from cs6300_vectordbs_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )
    from cs6300_vectordbs_spark.operators.graph import dedup_clusters
    from cs6300_vectordbs_spark.operators.judge import sim_judge_score
    from cs6300_vectordbs_spark.operators.latency import search_with_latency
    from cs6300_vectordbs_spark.operators.metrics_ir import (
        latency_percentiles,
        recall_at_k,
    )
    from cs6300_vectordbs_spark.sources.vector_index import (
        ensure_ivf_index,
        search_ivf_index,
    )

    import shutil

    spark = get_spark(app_name="pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="demo_")
    try:

        # 1. Ingest + text analysis: quality/language gates.
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scored = docs.select(
            "doc_id", "text",
            F.round(quality_score("text"), 9).alias("quality"),
            lang_id("text").alias("lang_guess"),
        )
        kept = scored.filter(F.col("quality") >= 0.2)

        # 2. Dedup: keep exact-content canonicals, then drop near-dup
        #    cluster non-representatives (MinHash-LSH -> connected
        #    components, min-id representative).
        canon_ids = exact_dedup(kept, id_col="doc_id", text_col="text").select(
            "doc_id"
        )
        canon = kept.join(canon_ids, on="doc_id", how="left_semi")
        pairs = minhash_lsh_pairs(canon, min_jaccard=0.5)
        drop = (
            dedup_clusters(pairs)
            .filter(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id")
        )
        corpus = canon.join(drop, on="doc_id", how="left_anti")

        # 3. Embed (deterministic stand-in; swap in embed_text_model for a
        #    real encoder) and build the persisted IVF index (S9
        #    create-if-absent, content-addressed invalidation).
        emb = embed_documents(corpus, dim=16).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        index_path = f"{work}/ivf"
        ensure_ivf_index(spark, emb, index_path, dim=16, n_cells=8)

        # 4a. Serve from the stored index (cell-pruned scan)...
        queries = emb.limit(5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        hits = search_ivf_index(
            spark, index_path, queries, 5, dim=16, n_probe=4, exclude_self=True
        )

        # 4b. ...and once through the per-query latency capture path (U3).
        timed = search_with_latency(emb, queries, 5, exclude_self=True)

        # 5. Judge + IR metrics (A1-A6 shapes).
        judged = hits.withColumn(
            "is_relevant", (sim_judge_score("sim") >= 3).cast("int")
        )
        recall = recall_at_k(
            judged.select("query_id", "rank", "is_relevant")
        ).collect()[0]
        pct = latency_percentiles(
            timed.filter(F.col("rank") == 1), value_col="latency_ms"
        ).collect()[0]

        report = {
            "n_raw": docs.count(),
            "n_kept": kept.count(),
            "n_after_dedup": corpus.count(),
            "n_hits": hits.count(),
            "avg_recall": float(recall["avg_recall"]),
            "p50_latency_ms": float(pct["p50"]),
        }
        print(report)
        return report
    finally:
        shutil.rmtree(work, ignore_errors=True)



if __name__ == "__main__":
    main(*sys.argv[1:2])
