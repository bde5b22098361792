"""Round-3 additions: TF-IDF keywords, SCD2 state history, random
projection, split summary — each vs an independent pure-Python
reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.functions.vector import (
    projection_signs,
    random_projection,
)
from cs6300_vectordbs_spark.operators.text_search import tfidf_topterms
from cs6300_vectordbs_spark.operators.timeseries import state_history

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat"),
    (3, "quantum entanglement of photons"),
    (4, "the cat and the dog and the mat"),
    (5, "photons scatter off the mat"),
]


def test_tfidf_topterms(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.rank): (r.term, r.score)
        for r in tfidf_topterms(docs, k=2).collect()
    }
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    for d, t in toks.items():
        scores = sorted(
            (
                (-round(t.count(term) * math.log(n / df[term]), 9), term)
                for term in set(t)
            ),
        )
        for i, (neg, term) in enumerate(scores[:2]):
            assert got[(d, i + 1)] == (term, -neg), (d, i)


def test_state_history_runs(spark):
    rows = [
        # user 1: A A B A  -> intervals A(2 events), B(1), A(1, open)
        (1, "2024-01-01 00:00:00", 1, "A"),
        (1, "2024-01-01 01:00:00", 2, "A"),
        (1, "2024-01-01 02:00:00", 3, "B"),
        (1, "2024-01-01 03:00:00", 4, "A"),
        # user 2: single event -> one open interval
        (2, "2024-01-01 00:30:00", 5, "C"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts string, event_id bigint, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sorted(
        (r.user_id, r.state, str(r.valid_from), str(r.valid_to), r.n_events)
        for r in state_history(ev).collect()
    )
    assert out == [
        (1, "A", "2024-01-01 00:00:00", "2024-01-01 02:00:00", 2),
        (1, "A", "2024-01-01 03:00:00", "None", 1),
        (1, "B", "2024-01-01 02:00:00", "2024-01-01 03:00:00", 1),
        (2, "C", "2024-01-01 00:30:00", "None", 1),
    ]


def test_state_history_intervals_partition_time(spark):
    """Intervals of one user never overlap and chain exactly:
    each valid_to equals the next valid_from in time order."""
    from cs6300_vectordbs_spark.io import read_events

    ev = read_events(spark, "/root/testdata/sf0.001")
    hist = state_history(ev.limit(2000)).collect()
    byu = {}
    for r in hist:
        byu.setdefault(r.user_id, []).append(r)
    for u, rows in byu.items():
        rows.sort(key=lambda r: r.valid_from)
        opens = [r for r in rows if r.valid_to is None]
        assert len(opens) == 1  # exactly one current interval
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from


def test_random_projection_matches_numpy(spark, emb):
    import numpy as np

    dim = len(emb.select("embedding").first()[0])
    out_dim = 4
    cols = random_projection("embedding", dim, out_dim)
    got = {
        r.vec_id: [r[f"rp{j}"] for j in range(out_dim)]
        for r in emb.select("vec_id", *cols).limit(50).collect()
    }
    S = np.array(projection_signs(dim, out_dim), dtype=np.float64)
    for r in emb.select("vec_id", "embedding").limit(50).collect():
        v = np.array(r.embedding, dtype=np.float64)
        want = S @ v / math.sqrt(dim)
        assert np.allclose(got[r.vec_id], want, atol=1e-9), r.vec_id


def test_projection_signs_deterministic():
    a = projection_signs(8, 3)
    b = projection_signs(8, 3)
    assert a == b
    assert all(x in (-1, 1) for row in a for x in row)
    # different tag -> different matrix (not a constant function)
    assert projection_signs(8, 3, tag="other") != a


def test_centroid_outliers_invariants(spark, emb):
    from cs6300_vectordbs_spark.operators.similarity import centroid_outliers

    dim = len(emb.select("embedding").first()[0])
    out = centroid_outliers(emb, k=3, dim=dim).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append(r)
    n_labels = emb.select("label").distinct().count()
    assert len(by_label) == n_labels
    for label, rows in by_label.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        # ranks descend in distance
        for a, b in zip(rows, rows[1:]):
            assert a.dist >= b.dist
        assert all(r.dist >= 0 for r in rows)


def test_chunk_dedup_finds_planted_dup(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta " * 16),
            (2, "alpha beta gamma delta " * 16),   # same text, other doc
            (3, "totally different content here " * 16),
        ],
        "doc_id bigint, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text"))
    import __spark_entry__ as e
    from cs6300_vectordbs_spark.operators.chunking import chunk_documents

    chunks = chunk_documents(docs, chunk_tokens=32, overlap=8)
    fp = chunks.select(
        "doc_id",
        F.substring(
            F.md5(F.regexp_replace(F.lower(F.trim("chunk_text")), r"\s+", " ")),
            1, 16,
        ).alias("chunk_fp"),
    )
    dup = (
        fp.groupBy("chunk_fp")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .collect()
    )
    assert len(dup) > 0 and all(r.n_docs == 2 for r in dup)


def test_streaming_search_equals_batch_serve(spark, emb):
    """The drained query stream must produce exactly the batch serving
    result for the same query set (per-query independence)."""
    import tempfile

    from cs6300_vectordbs_spark.sources.vector_index import (
        ensure_ivf_index,
        search_ivf_index,
    )
    from cs6300_vectordbs_spark.streaming.search import (
        read_query_stream,
        serve_query_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    dim = len(emb.select("embedding").first()[0])
    path = tempfile.mkdtemp(prefix="ivf_idx_test_")
    ensure_ivf_index(spark, emb, path, dim=dim, n_cells=8)
    qs = read_query_stream(spark, sf_dir, 20)
    got = serve_query_stream(
        spark, qs, path, 5, dim=dim, n_probe=3, exclude_self=True
    )
    batch_q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    want = search_ivf_index(
        spark, path, batch_q, 5, dim=dim, n_probe=3, exclude_self=True
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0


def test_text_index_lifecycle_and_pruned_serve(spark, docs, tmp_path):
    """Create-if-absent reuses a fingerprint-matched index, rebuilds on
    corpus change, and the serve plan prunes term-bucket partitions."""
    import os

    from cs6300_vectordbs_spark.operators.text_search import bm25_topk
    from cs6300_vectordbs_spark.sources.text_index import (
        ensure_text_index,
        search_text_index,
    )

    path = str(tmp_path / "tix")
    d = docs.limit(200)
    ensure_text_index(spark, d, path)
    mtime = os.path.getmtime(f"{path}/META")
    ensure_text_index(spark, d, path)  # no-op: fingerprint matches
    assert os.path.getmtime(f"{path}/META") == mtime
    d2 = docs.limit(150)
    ensure_text_index(spark, d2, path)  # corpus changed -> rebuild
    assert os.path.getmtime(f"{path}/META") > mtime

    ensure_text_index(spark, d, path)  # back to the 200-doc corpus
    qs = d.limit(20).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query")
    )
    got = search_text_index(spark, path, qs, k=5)
    want = bm25_topk(d, qs, k=5)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0

    # partition pruning: the impacts scan lists only probed buckets
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        search_text_index(spark, path, qs, k=5).explain("formatted")
    plan = buf.getvalue()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines and "bucket" in scan_lines[0]
