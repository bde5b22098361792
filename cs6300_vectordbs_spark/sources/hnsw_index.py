"""Persisted hierarchical (HNSW) graph — create-if-absent (S9) for
the layered serving path, same lifecycle discipline as the flat NSW
store (sources/graph_index.py): content-addressed fingerprint over
(id, vector) rows plus EVERY build-affecting parameter, atomic
fingerprint-last commit, per-path build lock.

Layout under ``path``:
  edges/   layer-0 edge list (a, b) — the standard NSW graph
           (exact k-NN + hash shortcuts), built by
           graph_index.build_nsw_graph
  layers/  upper-layer edge lists (layer, a, b), layer >= 1
  levels/  the geometric layer assignment (node, lvl)

The reference gets exactly this artifact from Chroma's persisted
hnswlib index (/root/reference/src/chroma.py:74-87: the collection
dir holds the layered graph; re-runs skip the build). At 100 TB the
upper layers total ~N/(branch-1) extra edge rows — noise next to the
layer-0 list, which is itself tiny next to the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph_index import build_nsw_graph
from .index_common import (
    build_lock,
    corpus_fingerprint,
    invalidate_fingerprint,
    read_fingerprint,
    write_fingerprint,
)


def hnsw_graph_exists(path: str) -> bool:
    return all(
        os.path.exists(f"{path}/{p}")
        for p in ("edges", "layers", "levels", "FINGERPRINT")
    )


def build_hnsw_graph(
    corpus: DataFrame,
    path: str,
    *,
    k: int = 12,
    salt: int = 17,
    branch: int = 4,
    max_level: int = 3,
    level_salt: str = "hl1",
    k_upper: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Layer 0 = the flat NSW build (exact k-NN + shortcuts); layers
    1..max_level = exact k_upper-NN over each promoted subset; levels
    = the md5 geometric assignment. All three written as parquet."""
    from concurrent.futures import ThreadPoolExecutor

    from ..operators.hnsw import hnsw_layer_edges, hnsw_levels

    # The layer-0 build and the upper-layer builds are independent
    # (upper layers need only `levels`), so the flat-NSW build runs on
    # a second driver thread and Spark overlaps the jobs — the upper
    # layers back-fill executors the layer-0 tail leaves idle (guide
    # §2.6). Writes target disjoint subdirectories. Same artifacts.
    with ThreadPoolExecutor(max_workers=1) as pool:
        f0 = pool.submit(
            build_nsw_graph,
            corpus, path, k=k, salt=salt, id_col=id_col, vec_col=vec_col,
        )
        levels = hnsw_levels(
            corpus, branch=branch, max_level=max_level,
            salt=level_salt, id_col=id_col,
        ).localCheckpoint(eager=True)
        layers = None
        for layer in range(1, max_level + 1):
            e = hnsw_layer_edges(
                corpus, levels, layer, k_upper=k_upper,
                id_col=id_col, vec_col=vec_col,
            ).select(F.lit(layer).cast("int").alias("layer"), "a", "b")
            layers = e if layers is None else layers.unionByName(e)
        layers.write.mode("overwrite").parquet(f"{path}/layers")
        levels.write.mode("overwrite").parquet(f"{path}/levels")
        f0.result()


def ensure_hnsw_graph(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    k: int = 12,
    salt: int = 17,
    branch: int = 4,
    max_level: int = 3,
    level_salt: str = "hl1",
    k_upper: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict[int, DataFrame], DataFrame]:
    """Create-if-absent; returns (edges0, {layer: edges}, levels) read
    from the store. The fingerprint covers the corpus content and all
    seven build parameters — a changed branch/max_level/k_upper/salt
    rebuilds instead of silently serving a graph built under a
    different rule (routing quality depends on every one of them)."""
    fp = corpus_fingerprint(
        corpus,
        [id_col, vec_col],
        {
            "k": k,
            "salt": salt,
            "branch": branch,
            "max_level": max_level,
            "level_salt": level_salt,
            "k_upper": k_upper,
            "scheme": "hnsw-v1",
        },
    )
    if not (hnsw_graph_exists(path) and read_fingerprint(path) == fp):
        with build_lock(path):
            if not (hnsw_graph_exists(path) and read_fingerprint(path) == fp):
                invalidate_fingerprint(path)
                build_hnsw_graph(
                    corpus, path, k=k, salt=salt, branch=branch,
                    max_level=max_level, level_salt=level_salt,
                    k_upper=k_upper, id_col=id_col, vec_col=vec_col,
                )
                write_fingerprint(path, fp)
    edges0 = spark.read.parquet(f"{path}/edges")
    stored = spark.read.parquet(f"{path}/layers")
    layer_edges = {
        layer: stored.filter(F.col("layer") == layer).select("a", "b")
        for layer in range(1, max_level + 1)
    }
    levels = spark.read.parquet(f"{path}/levels")
    return edges0, layer_edges, levels


def append_hnsw_graph(
    spark: SparkSession,
    corpus: DataFrame,
    new_vecs: DataFrame,
    path: str,
    *,
    k: int = 12,
    salt: int = 17,
    branch: int = 4,
    max_level: int = 3,
    level_salt: str = "hl1",
    k_upper: int = 6,
    beam_width: int = 32,
    n_iters: int = 6,
    descent_iters: int = 1,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict[int, DataFrame], DataFrame]:
    """Persisted incremental maintenance for the LAYERED graph — the
    stored form of operators/hnsw.hnsw_insert, mirroring
    graph_index.append_nsw_graph's two-layer layout:

    - ``{path}/base``: the full layered build for ``corpus``
      (ensure_hnsw_graph — levels + upper layers + layer-0 edges).
    - ``{path}/merged``: the base structures plus the batch's levels
      and per-layer insert links, committed under a fingerprint
      covering the BASE fingerprint transitively, the batch content,
      and every insert parameter. Unchanged inputs serve the stored
      merged hierarchy without re-running the insert beams.

    Returns (edges0, {layer: edges}, levels) read from the merged
    store — the SAME order as ensure_hnsw_graph, so callers unpack
    both sources of a servable hierarchy identically. Same crash
    discipline as every store here (invalidate-first,
    fingerprint-last, per-path lock); new ids must be disjoint
    (enforced inside hnsw_insert)."""
    base_e0, base_layers, base_levels = ensure_hnsw_graph(
        spark, corpus, f"{path}/base", k=k, salt=salt, branch=branch,
        max_level=max_level, level_salt=level_salt, k_upper=k_upper,
        id_col=id_col, vec_col=vec_col,
    )
    base_fp = read_fingerprint(f"{path}/base")
    batch_fp = corpus_fingerprint(new_vecs, [id_col, vec_col])
    merged_fp = (
        f"base={base_fp}|batch={batch_fp}"
        f"|beam={beam_width},iters={n_iters},di={descent_iters}"
        f",dim={dim},scheme=hnsw-append-v1"
    )
    mpath = f"{path}/merged"
    if not (hnsw_graph_exists(mpath) and read_fingerprint(mpath) == merged_fp):
        with build_lock(mpath):
            if not (
                hnsw_graph_exists(mpath)
                and read_fingerprint(mpath) == merged_fp
            ):
                from ..operators.hnsw import hnsw_insert

                invalidate_fingerprint(mpath)
                me0, mlay, mlv = hnsw_insert(
                    corpus, new_vecs, edges0=base_e0,
                    layer_edges=base_layers, levels=base_levels,
                    k=k, k_upper=k_upper, branch=branch,
                    max_level=max_level, level_salt=level_salt,
                    beam_width=beam_width, n_iters=n_iters,
                    descent_iters=descent_iters, dim=dim,
                    id_col=id_col, vec_col=vec_col,
                )
                me0.write.mode("overwrite").parquet(f"{mpath}/edges")
                layers = None
                for layer, e in sorted(mlay.items()):
                    tagged = e.select(
                        F.lit(layer).cast("int").alias("layer"), "a", "b"
                    )
                    layers = (
                        tagged if layers is None
                        else layers.unionByName(tagged)
                    )
                layers.write.mode("overwrite").parquet(f"{mpath}/layers")
                mlv.write.mode("overwrite").parquet(f"{mpath}/levels")
                write_fingerprint(mpath, merged_fp)
    edges0 = spark.read.parquet(f"{mpath}/edges")
    stored = spark.read.parquet(f"{mpath}/layers")
    layer_edges = {
        layer: stored.filter(F.col("layer") == layer).select("a", "b")
        for layer in range(1, max_level + 1)
    }
    levels = spark.read.parquet(f"{mpath}/levels")
    return edges0, layer_edges, levels


def apply_hnsw_tombstones(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    max_level: int = 3,
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame, dict[int, DataFrame], DataFrame]:
    """(live_corpus, live_edges0, live_layer_edges, live_levels) for
    serving the LAYERED graph at ``path`` under its tombstone set —
    the delete verb (graph_index.delete_from_nsw_graph writes the
    same ``{path}/tombstones`` table; the store layout is what
    differs). Tombstoned nodes drop from the scoring corpus, the
    level table (so a deleted node can never be the descent entry),
    the layer-0 edge list, and EVERY upper layer's edge list (either
    endpoint) — no descent step or beam hop routes through a deleted
    node on any layer, on both serve strategies. All filters are
    anti-joins against the deletes-sized tombstone table."""
    from .graph_index import read_nsw_tombstones

    tombs = read_nsw_tombstones(spark, path, like=corpus, id_col=id_col)
    live = corpus.join(F.broadcast(tombs), id_col, "left_anti")
    t_a = tombs.select(F.col(id_col).alias("a"))
    t_b = tombs.select(F.col(id_col).alias("b"))

    def _filt(e: DataFrame) -> DataFrame:
        return e.join(F.broadcast(t_a), "a", "left_anti").join(
            F.broadcast(t_b), "b", "left_anti"
        )

    live_edges0 = _filt(spark.read.parquet(f"{path}/edges"))
    stored = spark.read.parquet(f"{path}/layers")
    live_layers = {
        layer: _filt(stored.filter(F.col("layer") == layer).select("a", "b"))
        for layer in range(1, max_level + 1)
    }
    live_levels = spark.read.parquet(f"{path}/levels").join(
        F.broadcast(tombs.select(F.col(id_col).alias("node"))),
        "node",
        "left_anti",
    )
    return live, live_edges0, live_layers, live_levels


def compact_hnsw_tombstones(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    threshold: float = 0.2,
    k: int = 12,
    salt: int = 17,
    branch: int = 4,
    max_level: int = 3,
    level_salt: str = "hl1",
    k_upper: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """Fold the tombstone set into the layered store once the
    tombstoned fraction reaches ``threshold``: rebuild ALL layers over
    the survivors (restoring the per-layer kNN connectivity the
    endpoint filtering eroded) and clear the tombstone table —
    graph_index.compact_nsw_tombstones' policy on the layered layout,
    with the same crash order (tombstones cleared only AFTER the new
    fingerprint commits)."""
    from .graph_index import read_nsw_tombstones

    tombs = read_nsw_tombstones(spark, path, like=corpus, id_col=id_col)
    n_tomb = tombs.count()
    if n_tomb == 0:
        return False
    n_corpus = corpus.count()
    if n_corpus == 0 or (n_tomb / n_corpus) < threshold:
        return False
    survivors = corpus.join(F.broadcast(tombs), id_col, "left_anti")
    survivors = survivors.localCheckpoint(eager=True)
    ensure_hnsw_graph(
        spark, survivors, path, k=k, salt=salt, branch=branch,
        max_level=max_level, level_salt=level_salt, k_upper=k_upper,
        id_col=id_col, vec_col=vec_col,
    )
    import shutil

    shutil.rmtree(f"{path}/tombstones", ignore_errors=True)
    return True
