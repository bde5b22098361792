"""Persisted NSW graph lifecycle (sources/graph_index.py): build once,
reuse byte-identically while the fingerprint matches, rebuild on
corpus-content or build-parameter change — the same create-if-absent
contract as the IVF/BM25/MinHash persisted indexes.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.sources.graph_index import ensure_nsw_graph


def _corpus(spark, n=40, dim=8, bump=0.0):
    rows = [
        (i, [float(((i * 7 + d * 3) % 11) - 5) + (bump if i == 0 else 0.0)
             for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _edge_files_sig(path):
    d = f"{path}/edges"
    return sorted(
        (f, os.path.getmtime(os.path.join(d, f))) for f in os.listdir(d)
    )


def test_build_reuse_invalidate(spark, tmp_path):
    path = str(tmp_path / "nsw")
    corpus = _corpus(spark)

    e1 = ensure_nsw_graph(spark, corpus, path, k=4)
    n1 = e1.count()
    assert n1 > 0
    sig1 = _edge_files_sig(path)
    # every edge a < b, ids in range
    bad = e1.filter(
        (F.col("a") >= F.col("b")) | (F.col("a") < 0) | (F.col("b") >= 40)
    ).count()
    assert bad == 0

    # unchanged corpus + params -> byte-identical reuse (no rebuild)
    e2 = ensure_nsw_graph(spark, corpus, path, k=4)
    assert e2.count() == n1
    assert _edge_files_sig(path) == sig1

    # changed degree -> rebuild (files rewritten, more edges)
    e3 = ensure_nsw_graph(spark, corpus, path, k=6)
    assert _edge_files_sig(path) != sig1
    assert e3.count() > n1

    # changed corpus content (same row count!) -> rebuild
    sig3 = _edge_files_sig(path)
    e4 = ensure_nsw_graph(spark, _corpus(spark, bump=9.0), path, k=6)
    assert _edge_files_sig(path) != sig3
    assert e4.count() > 0

    # changed shortcut salt -> rebuild (the fingerprint covers every
    # build-affecting parameter, not just k — a stale-salt graph would
    # silently serve a different shortcut layout)
    sig4 = _edge_files_sig(path)
    e5 = ensure_nsw_graph(spark, _corpus(spark, bump=9.0), path, k=6, salt=23)
    assert _edge_files_sig(path) != sig4
    assert e5.count() > 0


def test_build_with_custom_columns(spark, tmp_path):
    """build_nsw_graph must honor id_col/vec_col end-to-end (the kNN
    grid kernel, the shortcut edges, and the fingerprint all see the
    renamed columns)."""
    corpus = _corpus(spark).select(
        F.col("vec_id").alias("node_id"), F.col("embedding").alias("vec")
    )
    path = str(tmp_path / "nsw_custom")
    edges = ensure_nsw_graph(
        spark, corpus, path, k=4, id_col="node_id", vec_col="vec"
    )
    n = edges.count()
    assert n > 0
    # identical graph to the default-named build over the same vectors
    want = ensure_nsw_graph(
        spark, _corpus(spark), str(tmp_path / "nsw_default"), k=4
    )
    assert sorted(map(tuple, edges.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_append_lifecycle(spark, tmp_path):
    """Incremental layer (append_nsw_graph): base builds once, merged
    commits under its own fingerprint, reuse/rebuild independence
    between the layers, and the crash window (no merged fingerprint)
    re-runs only the insert."""
    from cs6300_vectordbs_spark.sources.graph_index import append_nsw_graph

    path = str(tmp_path / "nswa")
    corpus = _corpus(spark, n=40)
    new = spark.createDataFrame(
        [(100 + i, [float((i * 5 + d) % 9 - 4) for d in range(8)])
         for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    m1 = append_nsw_graph(
        spark, corpus, new, path, k=4, beam_width=6, n_iters=3,
        n_entries=4, dim=8,
    )
    links = m1.filter((F.col("a") >= 100) | (F.col("b") >= 100)).collect()
    touched = {a for r in links for a in (r.a, r.b) if a >= 100}
    assert touched == {100, 101, 102, 103, 104}
    # every new link pairs a new id with an OLD id (disjoint contract)
    assert all((r.a >= 100) != (r.b >= 100) for r in links)
    base_sig = _edge_files_sig(f"{path}/base")
    merged_sig = _edge_files_sig(f"{path}/merged")

    # unchanged inputs -> both layers reuse byte-identically
    append_nsw_graph(
        spark, corpus, new, path, k=4, beam_width=6, n_iters=3,
        n_entries=4, dim=8,
    )
    assert _edge_files_sig(f"{path}/base") == base_sig
    assert _edge_files_sig(f"{path}/merged") == merged_sig

    # changed batch -> merged rebuilds, base reuses
    new2 = new.withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(1.0))
    )
    append_nsw_graph(
        spark, corpus, new2, path, k=4, beam_width=6, n_iters=3,
        n_entries=4, dim=8,
    )
    assert _edge_files_sig(f"{path}/base") == base_sig
    assert _edge_files_sig(f"{path}/merged") != merged_sig

    # changed insert-beam parameter -> merged rebuilds again
    sig2 = _edge_files_sig(f"{path}/merged")
    append_nsw_graph(
        spark, corpus, new2, path, k=4, beam_width=7, n_iters=3,
        n_entries=4, dim=8,
    )
    assert _edge_files_sig(f"{path}/merged") != sig2

    # crash window: merged fingerprint missing -> insert re-runs,
    # base untouched
    import os

    os.remove(f"{path}/merged/FINGERPRINT")
    sig3 = _edge_files_sig(f"{path}/merged")
    append_nsw_graph(
        spark, corpus, new2, path, k=4, beam_width=7, n_iters=3,
        n_entries=4, dim=8,
    )
    assert _edge_files_sig(f"{path}/merged") != sig3
    assert _edge_files_sig(f"{path}/base") == base_sig


def _batch(spark, start, n=5, dim=8, mult=5):
    return spark.createDataFrame(
        [(start + i, [float((i * mult + d) % 9 - 4) for d in range(dim)])
         for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def test_chain_lifecycle(spark, tmp_path):
    """Multi-batch chain (append_nsw_graph_chain): batch N+1 appends
    onto stored merged-N without re-paying batches 1..N; unchanged
    prefixes serve stored layers byte-identically; editing an early
    batch invalidates transitively."""
    from cs6300_vectordbs_spark.sources.graph_index import (
        append_nsw_graph,
        append_nsw_graph_chain,
    )

    path = str(tmp_path / "chain")
    corpus = _corpus(spark, n=40)
    b1 = _batch(spark, 100, mult=5)
    b2 = _batch(spark, 200, mult=3)

    kw = dict(k=4, beam_width=6, n_iters=3, n_entries=4, dim=8,
              compact_depth=4)
    e2 = append_nsw_graph_chain(spark, corpus, [b1, b2], path, **kw)
    # both batches linked, all new links pair new-vs-existing
    l2 = e2.filter((F.col("a") >= 200) | (F.col("b") >= 200)).collect()
    assert {a for r in l2 for a in (r.a, r.b) if a >= 200} == set(
        range(200, 205)
    )
    sigs = {
        lay: _edge_files_sig(f"{path}/{lay}")
        for lay in ("base", "layer-0001", "layer-0002")
    }

    # a 1-batch chain's layer equals the two-layer append's merged list
    apath = str(tmp_path / "two_layer")
    merged = append_nsw_graph(
        spark, corpus, b1, apath, k=4, beam_width=6, n_iters=3,
        n_entries=4, dim=8,
    )
    chain1 = spark.read.parquet(f"{path}/layer-0001/edges")
    assert sorted(map(tuple, chain1.collect())) == sorted(
        map(tuple, merged.collect())
    )

    # unchanged inputs -> every layer reuses byte-identically
    append_nsw_graph_chain(spark, corpus, [b1, b2], path, **kw)
    for lay, sig in sigs.items():
        assert _edge_files_sig(f"{path}/{lay}") == sig, lay

    # appending batch 3 builds ONLY layer-0003 (earlier layers and
    # their insert beams are never re-run — the O(batch) claim)
    b3 = _batch(spark, 300, mult=7)
    e3 = append_nsw_graph_chain(spark, corpus, [b1, b2, b3], path, **kw)
    for lay, sig in sigs.items():
        assert _edge_files_sig(f"{path}/{lay}") == sig, lay
    assert e3.filter((F.col("a") >= 300) | (F.col("b") >= 300)).count() > 0

    # editing batch 1 invalidates layers 1.. transitively (its
    # fingerprint feeds every later layer's), base reuses
    b1x = b1.withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(1.0))
    )
    append_nsw_graph_chain(spark, corpus, [b1x, b2, b3], path, **kw)
    assert _edge_files_sig(f"{path}/base") == sigs["base"]
    assert _edge_files_sig(f"{path}/layer-0001") != sigs["layer-0001"]
    assert _edge_files_sig(f"{path}/layer-0002") != sigs["layer-0002"]


def test_chain_compaction(spark, tmp_path):
    """Every compact_depth-th insert layer folds into a full rebuild
    over the accumulated corpus: the stored compact layer's edge set
    equals a from-scratch ensure_nsw_graph over the union, its
    fingerprint says kind=compact, and the depth counter resets."""
    from cs6300_vectordbs_spark.sources.graph_index import (
        append_nsw_graph_chain,
    )
    from cs6300_vectordbs_spark.sources.index_common import (
        read_fingerprint,
    )

    path = str(tmp_path / "chainc")
    corpus = _corpus(spark, n=40)
    b1 = _batch(spark, 100, mult=5)
    b2 = _batch(spark, 200, mult=3)
    b3 = _batch(spark, 300, mult=7)

    kw = dict(k=4, beam_width=6, n_iters=3, n_entries=4, dim=8,
              compact_depth=2)
    append_nsw_graph_chain(spark, corpus, [b1, b2, b3], path, **kw)
    fp1 = read_fingerprint(f"{path}/layer-0001")
    fp2 = read_fingerprint(f"{path}/layer-0002")
    fp3 = read_fingerprint(f"{path}/layer-0003")
    assert "kind=insert" in fp1
    assert "kind=compact" in fp2  # depth hit 2 -> fold
    assert "kind=insert" in fp3  # counter reset after the fold

    # the compact layer IS the full build over corpus + b1 + b2
    union = corpus.unionByName(b1).unionByName(b2)
    ref = ensure_nsw_graph(
        spark, union, str(tmp_path / "full"), k=4
    )
    got = spark.read.parquet(f"{path}/layer-0002/edges")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_tombstone_lifecycle(spark, tmp_path):
    """Delete verb: tombstoned nodes leave the scoring corpus and the
    edge list (either endpoint) at serve time; deletes are idempotent;
    serving over the filtered view equals nsw_beam_search over the
    survivor corpus with the filtered edges."""
    from cs6300_vectordbs_spark.operators.ann import nsw_beam_search
    from cs6300_vectordbs_spark.sources.graph_index import (
        apply_nsw_tombstones,
        delete_from_nsw_graph,
        read_nsw_tombstones,
    )

    path = str(tmp_path / "nswt")
    corpus = _corpus(spark, n=40)
    ensure_nsw_graph(spark, corpus, path, k=4)

    dels = spark.createDataFrame([(3,), (7,), (11,)], "vec_id long")
    delete_from_nsw_graph(spark, dels, path)
    # idempotent: replaying the delete never grows the table
    delete_from_nsw_graph(spark, dels, path)
    tombs = read_nsw_tombstones(spark, path, like=corpus)
    assert sorted(r.vec_id for r in tombs.collect()) == [3, 7, 11]

    live, live_edges = apply_nsw_tombstones(spark, corpus, path)
    assert live.count() == 37
    assert live_edges.filter(
        F.col("a").isin(3, 7, 11) | F.col("b").isin(3, 7, 11)
    ).count() == 0

    queries = live.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = nsw_beam_search(
        live, queries, 3, edges=live_edges, beam_width=6, n_iters=3,
        n_entries=4, dim=8, exclude_self=True, serve="broadcast",
    )
    rows = got.collect()
    assert rows and all(r.vec_id not in (3, 7, 11) for r in rows)
    # broadcast and join serving agree on the filtered view
    got_j = nsw_beam_search(
        live, queries, 3, edges=live_edges, beam_width=6, n_iters=3,
        n_entries=4, dim=8, exclude_self=True, serve="joins",
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, got_j.collect()))


def test_tombstone_compaction(spark, tmp_path):
    """Compaction threshold: below it nothing happens (soft delete
    keeps serving); at/above it the edge list rebuilds over the
    survivors (equal to a from-scratch build) and the tombstone table
    clears."""
    from cs6300_vectordbs_spark.sources.graph_index import (
        compact_nsw_tombstones,
        delete_from_nsw_graph,
        read_nsw_tombstones,
    )

    path = str(tmp_path / "nswc")
    corpus = _corpus(spark, n=40)
    ensure_nsw_graph(spark, corpus, path, k=4)
    sig = _edge_files_sig(path)

    # 3/40 = 7.5% < 20% threshold -> no-op
    delete_from_nsw_graph(
        spark, spark.createDataFrame([(1,), (2,), (3,)], "vec_id long"),
        path,
    )
    assert not compact_nsw_tombstones(
        spark, corpus, path, threshold=0.2, k=4
    )
    assert _edge_files_sig(path) == sig
    assert read_nsw_tombstones(spark, path, like=corpus).count() == 3

    # push past the threshold: 10/40 = 25%
    delete_from_nsw_graph(
        spark,
        spark.createDataFrame([(i,) for i in range(4, 11)], "vec_id long"),
        path,
    )
    assert compact_nsw_tombstones(spark, corpus, path, threshold=0.2, k=4)
    assert _edge_files_sig(path) != sig
    assert read_nsw_tombstones(spark, path, like=corpus).count() == 0
    # the compacted graph IS the from-scratch build over the survivors
    survivors = corpus.filter(~F.col("vec_id").isin(*range(1, 11)))
    ref = ensure_nsw_graph(spark, survivors, str(tmp_path / "ref"), k=4)
    got = spark.read.parquet(f"{path}/edges")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # and a re-ensure over the SURVIVOR corpus reuses it byte-identically
    sig2 = _edge_files_sig(path)
    ensure_nsw_graph(spark, survivors, path, k=4)
    assert _edge_files_sig(path) == sig2
