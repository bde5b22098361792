"""Persisted MinHash-LSH dedup index: lifecycle + incremental probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.dedup import minhash_lsh_pairs
from cs6300_vectordbs_spark.sources.dedup_index import (
    build_dedup_index,
    dedup_index_exists,
    ensure_dedup_index,
    probe_dedup_index,
)


def test_probe_matches_full_recompute(spark, docs, tmp_path):
    """Probe results == the full-corpus pair set restricted to
    new-vs-indexed pairs (same signatures, same band rule)."""
    path = str(tmp_path / "ddx")
    indexed = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    build_dedup_index(indexed, path, shingle_n=3)
    got = sorted(
        (r.new_id, r.indexed_id, round(r.est_jaccard, 9))
        for r in probe_dedup_index(spark, new, path, min_jaccard=0.3).collect()
    )
    full = minhash_lsh_pairs(docs, shingle_n=3, min_jaccard=0.3)
    want = sorted(
        (
            (r.id_a, r.id_b, round(r.est_jaccard, 9))
            if r.id_a % 10 == 0
            else (r.id_b, r.id_a, round(r.est_jaccard, 9))
        )
        for r in full.collect()
        if (r.id_a % 10 == 0) != (r.id_b % 10 == 0)
    )
    assert got == want


def test_ensure_reuses_then_invalidates(spark, docs, tmp_path):
    path = str(tmp_path / "ddx2")
    indexed = docs.filter(F.col("doc_id") % 10 != 0).limit(50)
    ensure_dedup_index(spark, indexed, path)
    assert dedup_index_exists(path)
    meta0 = open(f"{path}/META").read()
    mtime0 = __import__("os").path.getmtime(f"{path}/bands/_SUCCESS")
    # same corpus -> reused, no rebuild
    ensure_dedup_index(spark, indexed, path)
    assert __import__("os").path.getmtime(f"{path}/bands/_SUCCESS") == mtime0
    # different corpus -> fingerprint mismatch -> rebuilt
    ensure_dedup_index(spark, indexed.limit(20), path)
    assert __import__("os").path.getmtime(f"{path}/bands/_SUCCESS") > mtime0
    assert open(f"{path}/META").read() == meta0


def test_probe_scan_prunes_band_buckets(spark, docs, tmp_path):
    """The index scan must carry a PartitionFilters entry on bucket —
    the directory-pruning that keeps the probe O(batch buckets), not
    O(index)."""
    import contextlib
    import io

    path = str(tmp_path / "ddx3")
    build_dedup_index(docs.filter(F.col("doc_id") % 10 != 0), path)
    out = probe_dedup_index(
        spark, docs.filter(F.col("doc_id") % 10 == 0).limit(5), path
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    pf = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "bucket" in ln
    ]
    assert pf, plan
