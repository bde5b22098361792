"""Persistent IVF vector index: build -> store -> serve.

The reference's index is a PERSISTENT store (Chroma PersistentClient
at ./db/chroma, /root/reference/src/chroma.py:69-70; Pinecone serverless
index, /root/reference/src/pineconeDB.py:84-95) that survives the
process and is reused on re-run (the S8 idempotent-load guard counts
it). This module is the Spark-native equivalent of that lifecycle:

  build_ivf_index    assign every corpus vector to its nearest sampled
                     centroid and WRITE the assignment as parquet
                     partitioned BY CELL, plus the tiny centroid table.
  ensure_ivf_index   create-if-absent (S9): reuse a complete index on
                     disk, (re)build otherwise.
  search_ivf_index   serve top-k from the STORED index: probe cells per
                     query, scan ONLY the probed cell partitions
                     (directory-level partition pruning — the probed
                     cell ids are literal filters, so at 100 TB a
                     16-of-4096-cell probe reads 0.4% of the index),
                     exact cosine re-rank inside.

Algorithmic parity with operators/ann.ivf_topk (same sampled centroids,
same argmax assignment, same tie rules) — so the stored-index serving
path shares ivf's full value-hash oracle. The round-trip through
parquet float32 is lossless: vectors are stored exactly as read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import cosine_from_parts, dot, l2_norm
from ..operators.util import spread
from .index_common import (
    build_lock,
    corpus_fingerprint,
    invalidate_fingerprint,
    read_fingerprint,
    write_fingerprint,
)


def _centroids(corpus: DataFrame, corpus_id: str, corpus_vec: str,
               n_cells: int) -> DataFrame:
    return (
        corpus.orderBy(F.col(corpus_id).asc())
        .limit(n_cells)
        .select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cvec"))
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    dim: int,
    n_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Write the IVF index: ``{path}/centroids`` (n_cells rows) and
    ``{path}/cells`` partitioned by cell id. The assignment argmax
    (max cosine, ties to lowest centroid id) matches ann.ivf_topk."""
    # Ingest quarantine: NULL vectors can never be assigned or scored
    # (DuckDB's list math refuses them too); they are dropped here,
    # counted by corpus_null_audit upstream.
    corpus = corpus.filter(F.col(corpus_vec).isNotNull())
    cent = _centroids(corpus, corpus_id, corpus_vec, n_cells)
    # Norms factored under the cross join (r09, the similarity_topk
    # discipline): one norm per row / per centroid instead of three
    # unrolled chains per (row, centroid) pair. cosine_from_parts is
    # bit-identical; every row is scored by the argmax anyway, so
    # error/NULL semantics are unchanged.
    cent = cent.select("cid", "cvec", l2_norm("cvec", dim).alias("__cn"))
    sim = cosine_from_parts(
        dot(corpus_vec, "cvec", dim), F.col("__vn"), F.col("__cn")
    )
    assigned = (
        spread(corpus)
        .select("*", l2_norm(corpus_vec, dim).alias("__vn"))
        .crossJoin(F.broadcast(cent))
        .groupBy(corpus_id)
        .agg(
            F.max_by(
                F.struct(F.col("cid").alias("cell"),
                         F.col(corpus_vec).alias("vec")),
                F.struct(sim.alias("s"), (-F.col("cid")).alias("nc")),
            ).alias("best")
        )
        .select(
            F.col(corpus_id).alias("id"),
            F.col("best.cell").alias("cell"),
            F.col("best.vec").alias("vec"),
            F.lit(0).alias("gen"),
        )
    )
    # __cn is a plan-side artifact; the stored format stays (cid, cvec).
    cent.select("cid", "cvec").write.mode("overwrite").parquet(
        f"{path}/centroids"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/cells"
    )


def ivf_index_exists(path: str) -> bool:
    return os.path.exists(f"{path}/cells/_SUCCESS") and os.path.exists(
        f"{path}/centroids/_SUCCESS"
    )




def ensure_ivf_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    dim: int,
    n_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """S9 create-if-absent: a complete on-disk index whose stored
    corpus fingerprint matches the live corpus is reused as-is (the
    reference's count-guard analog, src/chroma.py:81-87 — but content-
    addressed, so a regenerated corpus with the same row count still
    invalidates); anything partial, missing, or stale is rebuilt.
    The fingerprint also encodes the build parameters (dim/n_cells):
    changing the cell count over an unchanged corpus must rebuild —
    a stale-geometry index would serve different cells than the
    caller's probe math assumes."""
    fp = corpus_fingerprint(
        corpus, [corpus_id, corpus_vec],
        {"dim": dim, "n_cells": n_cells},
    )
    if ivf_index_exists(path) and read_fingerprint(path) == fp:
        return
    with build_lock(path):
        # Re-check under the lock: a concurrent builder we blocked on
        # may have committed exactly this fingerprint.
        if ivf_index_exists(path) and read_fingerprint(path) == fp:
            return
        invalidate_fingerprint(path)  # crash mid-rebuild => no marker
        build_ivf_index(
            corpus, path, dim=dim, n_cells=n_cells,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
        )
        write_fingerprint(path, fp)


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    *,
    dim: int,
    n_probe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k cosine from the stored index. The probed cell set is
    collected driver-side (n_queries x n_probe SMALL ints — the same
    contract as broadcasting the query batch) and applied as a literal
    IN filter, which prunes cell directories at the file listing level:
    the scan never touches unprobed partitions."""
    # Norms factored under the joins (r09): the centroid and query
    # norms are computed once per row before the probe cross join, and
    # the stored-cell norm once per candidate ROW below the candidate
    # join — per-pair work is the dot alone. Bit-identical
    # (cosine_from_parts); every row of a probed cell was already
    # scored, so error/NULL semantics are unchanged.
    cent = F.broadcast(
        spark.read.parquet(f"{path}/centroids")
        .select("cid", "cvec", l2_norm("cvec", dim).alias("__cn"))
    )
    qsim = cosine_from_parts(
        dot("__qvec", "cvec", dim), F.col("__qn"), F.col("__cn")
    )
    qw = Window.partitionBy("__qid").orderBy(qsim.desc(), F.col("cid").asc())
    probes = (
        queries.select(
            F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
        )
        .select("__qid", "__qvec", l2_norm("__qvec", dim).alias("__qn"))
        .crossJoin(cent)
        .withColumn("__rn", F.row_number().over(qw))
        .filter(F.col("__rn") <= n_probe)
        .select("__qid", "__qvec", "__qn", F.col("cid").alias("cell"))
    )
    probed_cells = sorted(
        {r.cell for r in probes.select("cell").distinct().collect()}
    )
    cells = spark.read.parquet(f"{path}/cells").filter(
        F.col("cell").isin(probed_cells)
    )
    # Latest-wins dedup for upserted ids (gen from upsert_ivf_index).
    # Within a cell this resolves re-upserts exactly; a vector whose
    # NEW version moved to a different cell is only shadowed once
    # compact_ivf_index runs — the standard LSM-style contract.
    dw = Window.partitionBy("id").orderBy(F.col("gen").desc())
    cells = (
        cells.withColumn("__rn", F.row_number().over(dw))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    cells = cells.select("*", l2_norm("vec", dim).alias("__vn"))
    cand = cells.join(F.broadcast(probes), on="cell")
    if exclude_self:
        cand = cand.filter(F.col("id") != F.col("__qid"))
    scored = cand.select(
        F.col("__qid").alias("query_id"),
        F.col("id"),
        cosine_from_parts(
            dot("__qvec", "vec", dim), F.col("__qn"), F.col("__vn")
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "id", "sim",
            (1.0 - F.col("sim")).alias("dist"),
        )
    )


def upsert_ivf_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    *,
    dim: int,
    gen: int = 1,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Incremental index maintenance (V5 against the stored index):
    assign ONLY the new/changed vectors against the EXISTING centroids
    and append them into their cell partitions — no index rebuild, no
    touch of unaffected cells. Re-upserted ids are resolved at read
    time by ``search_ivf_index``'s latest-wins dedup (the plain-parquet
    MERGE pattern of operators/upsert.py; on Delta/Iceberg this maps to
    MERGE INTO + dynamic partition overwrite). At 100 TB this is the
    difference between a nightly full rebuild and a streaming-rate
    index feed."""
    cent = F.broadcast(
        spark.read.parquet(f"{path}/centroids")
        .select("cid", "cvec", l2_norm("cvec", dim).alias("__cn"))
    )
    # Norms factored under the cross join (r09) — see build_ivf_index.
    sim = cosine_from_parts(
        dot(corpus_vec, "cvec", dim), F.col("__vn"), F.col("__cn")
    )
    new_vectors = new_vectors.filter(F.col(corpus_vec).isNotNull())
    assigned = (
        new_vectors.select(
            "*", l2_norm(corpus_vec, dim).alias("__vn")
        )
        .crossJoin(cent)
        .groupBy(corpus_id)
        .agg(
            F.max_by(
                F.struct(F.col("cid").alias("cell"),
                         F.col(corpus_vec).alias("vec")),
                F.struct(sim.alias("s"), (-F.col("cid")).alias("nc")),
            ).alias("best")
        )
        .select(
            F.col(corpus_id).alias("id"),
            F.col("best.cell").alias("cell"),
            F.col("best.vec").alias("vec"),
            F.lit(gen).alias("gen"),
        )
    )
    assigned.write.mode("append").partitionBy("cell").parquet(f"{path}/cells")


def compact_ivf_index(spark: SparkSession, path: str) -> None:
    """Resolve all upsert generations: keep each id's latest row (ties
    impossible — generations are caller-ordered), rewrite the cell
    partitions, reset gen to 0. Restores the one-row-per-id invariant
    that makes probed serving exact even for vectors whose newest
    version changed cells. At scale: a periodic partition-parallel
    rewrite, the LSM compaction of the index."""
    cells = spark.read.parquet(f"{path}/cells")
    dw = Window.partitionBy("id").orderBy(F.col("gen").desc())
    latest = (
        cells.withColumn("__rn", F.row_number().over(dw))
        .filter(F.col("__rn") == 1)
        .select("id", F.lit(0).alias("gen"), "vec", "cell")
    )
    # Write the full compacted generation BESIDE the live one, then
    # swap. The source files stay intact until the replacement is
    # completely materialized, so a mid-write failure leaves the old
    # index serving (overwrite-in-place is delete-then-write and a
    # crash mid-write destroys the index). On an object store the
    # rename pair becomes a generation-pointer flip.
    import shutil

    tmp = f"{path}/cells.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    latest.write.mode("overwrite").partitionBy("cell").parquet(tmp)
    old = f"{path}/cells.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(f"{path}/cells", old)
    os.rename(tmp, f"{path}/cells")
    shutil.rmtree(old, ignore_errors=True)
