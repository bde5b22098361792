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


def test_mega_group_collapsed_in_storage_and_expanded_in_probe(
    spark, tmp_path
):
    """r06 hot-bucket guard: a 30-doc byte-identical mega-group stores
    ONE band row per band (not 30 — a flooded stored bucket would
    multiply every future probe against it, forever); a probing
    near-identical doc still gets all 30 pairs back, expanded through
    the members sidecar with the rep's exact estimate; and a probe doc
    whose id IS in the index (re-ingest) is excluded from its own pair
    but keeps pairs with the other group members."""
    path = str(tmp_path / "ddx3")
    banner = "this website uses cookies to improve your experience ok friend"
    corpus = spark.createDataFrame(
        [(i, banner) for i in range(30)]
        + [(100, "completely different text about query planning engines")],
        "doc_id long, text string",
    )
    build_dedup_index(corpus, path, shingle_n=3)

    bands_rows = spark.read.parquet(f"{path}/bands")
    # 2 distinct contents x 4 bands = 8 stored rows, NOT 30x4+4
    assert bands_rows.count() == 8
    assert spark.read.parquet(f"{path}/members").count() == 30

    # identical-content probe doc under a NEW id (signature-identical,
    # so the band collision is deterministic — a one-word change would
    # only pair with LSH probability) -> pairs with ALL 30 members
    probe = spark.createDataFrame(
        [(500, banner.upper())], "doc_id long, text string"
    )
    got = probe_dedup_index(spark, probe, path, min_jaccard=0.3).collect()
    assert {r.indexed_id for r in got} == set(range(30))
    assert all(r.est_jaccard == 1.0 for r in got)

    # re-ingest of doc 7 (a non-rep member): excluded from itself,
    # paired at est 1.0 with the other 29
    reingest = spark.createDataFrame(
        [(7, banner)], "doc_id long, text string"
    )
    got2 = probe_dedup_index(spark, reingest, path, min_jaccard=0.3).collect()
    assert {r.indexed_id for r in got2} == set(range(30)) - {7}
    assert all(r.est_jaccard == 1.0 for r in got2)


def test_probe_pre_v2_layout_fails_legibly(spark, tmp_path):
    """A v1 on-disk index (no members sidecar) probed DIRECTLY —
    bypassing ensure_dedup_index's fingerprint rebuild — must raise a
    clear layout error, not an opaque parquet path-not-found from the
    members read."""
    import json
    import os

    import pytest

    from cs6300_vectordbs_spark.sources.dedup_index import (
        build_dedup_index,
        probe_dedup_index,
    )

    path = str(tmp_path / "v1idx")
    docs = spark.createDataFrame(
        [(0, "some corpus text here"), (1, "other corpus text there")],
        "doc_id long, text string",
    )
    build_dedup_index(docs, path)
    # simulate a pre-v2 layout: strip the members sidecar
    import shutil

    shutil.rmtree(f"{path}/members")
    probe = spark.createDataFrame(
        [(9, "some corpus text here")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="pre-v2|members sidecar"):
        probe_dedup_index(spark, probe, path)


def test_ensure_dedup_groups_lifecycle(spark, tmp_path):
    """Create-if-absent + content-addressed invalidation for the
    persisted exact-dup group table: reuse on unchanged corpus,
    rebuild on changed content, empty-but-present table on dup-free
    corpora, NULL-text docs grouped via the sentinel."""
    import os

    from cs6300_vectordbs_spark.sources.dedup_index import (
        ensure_dedup_groups,
    )

    path = str(tmp_path / "groups")

    def files_sig():
        d = f"{path}/groups"
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f))) for f in os.listdir(d)
        )

    docs = spark.createDataFrame(
        [
            (0, "same text here"),
            (1, "SAME   text here"),   # normalizes identical to 0
            (2, "other text entirely"),
            (3, None),
            (4, None),                  # NULL group: sentinel key
        ],
        "doc_id long, text string",
    )
    g1 = ensure_dedup_groups(spark, docs, path)
    got = {(r.id, r.rep_id) for r in g1.collect()}
    assert got == {(0, 0), (1, 0), (3, 3), (4, 3)}
    sig1 = files_sig()

    # unchanged corpus -> byte-identical reuse
    ensure_dedup_groups(spark, docs, path).collect()
    assert files_sig() == sig1

    # changed content (same ids/rows) -> rebuild
    docs2 = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e")],
        "doc_id long, text string",
    )
    g2 = ensure_dedup_groups(spark, docs2, path)
    assert g2.count() == 0          # dup-free: empty but readable
    assert files_sig() != sig1
