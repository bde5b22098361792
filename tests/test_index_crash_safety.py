"""Persisted-index crash safety (r08): the fingerprint is the COMMIT
MARKER — written atomically (temp + os.replace) and only after the
index tables are complete. A builder that dies mid-build leaves no
(or the previous complete) fingerprint, so the next ensure_* rebuilds
instead of serving a torn index.
"""

from __future__ import annotations

import os

import pytest

import cs6300_vectordbs_spark.sources.dedup_index as dedup_index_mod
from cs6300_vectordbs_spark.sources.index_common import (
    read_fingerprint,
    write_fingerprint,
)

CORPUS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "alpha beta gamma delta epsilon"),
    (3, "completely different text here now"),
    (4, "the quick brown fox jumps over dogs"),
]


@pytest.fixture()
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_fingerprint_write_is_atomic(tmp_path):
    d = str(tmp_path)
    write_fingerprint(d, "abc:123")
    assert read_fingerprint(d) == "abc:123"
    assert not os.path.exists(f"{d}/FINGERPRINT.tmp")
    write_fingerprint(d, "def:456")
    assert read_fingerprint(d) == "def:456"


def test_missing_fingerprint_triggers_rebuild_never_stale_serve(
    spark, corpus_df, tmp_path, monkeypatch
):
    """Simulate the crash window: tables fully written (all _SUCCESS
    markers exist) but the process died before the fingerprint commit.
    The next ensure_* must REBUILD — a complete-looking layout without
    its commit marker is indistinguishable from a torn one."""
    idx = str(tmp_path / "idx")
    builds = []
    real_build = dedup_index_mod.build_dedup_index

    def counting_build(*a, **kw):
        builds.append(1)
        return real_build(*a, **kw)

    monkeypatch.setattr(dedup_index_mod, "build_dedup_index", counting_build)

    dedup_index_mod.ensure_dedup_index(spark, corpus_df, idx)
    assert len(builds) == 1
    assert dedup_index_mod.dedup_index_exists(idx)
    assert read_fingerprint(idx) is not None

    # unchanged corpus + params: the fingerprint hit skips the build
    dedup_index_mod.ensure_dedup_index(spark, corpus_df, idx)
    assert len(builds) == 1

    # crash simulation: commit marker gone, tables still complete
    os.remove(f"{idx}/FINGERPRINT")
    assert dedup_index_mod.dedup_index_exists(idx)  # looks complete...
    dedup_index_mod.ensure_dedup_index(spark, corpus_df, idx)
    assert len(builds) == 2  # ...but was rebuilt, not served stale

    # and the rebuild recommitted the marker
    assert read_fingerprint(idx) is not None
    probe = dedup_index_mod.probe_dedup_index(
        spark,
        spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        ),
        idx,
        min_jaccard=0.5,
    )
    got = {(r["new_id"], r["indexed_id"]) for r in probe.collect()}
    assert got == {(100, 1), (100, 2)}


def test_interrupted_rebuild_never_serves_torn_layout(
    spark, corpus_df, tmp_path, monkeypatch
):
    """The nastier crash window: a REBUILD (param change) dies after
    some table writes over a previously committed index. Without the
    invalidate-first step the OLD fingerprint would survive next to a
    mixed old/new layout — and a caller using the OLD params would
    fingerprint-match and serve the torn store. The protocol removes
    the marker before the first rebuild write, so the post-crash
    state is always 'no fingerprint' = rebuild."""
    idx = str(tmp_path / "idx")
    dedup_index_mod.ensure_dedup_index(spark, corpus_df, idx, bands=4)
    fp_a = read_fingerprint(idx)
    assert fp_a is not None

    def crash_build(*a, **kw):
        raise RuntimeError("injected crash mid-rebuild")

    monkeypatch.setattr(dedup_index_mod, "build_dedup_index", crash_build)
    with pytest.raises(RuntimeError, match="mid-rebuild"):
        dedup_index_mod.ensure_dedup_index(spark, corpus_df, idx, bands=2)
    # the previous marker was removed BEFORE the rebuild started
    assert read_fingerprint(idx) is None
    monkeypatch.undo()

    # a caller with the ORIGINAL params must rebuild, never serve the
    # (potentially interleaved) on-disk layout
    builds = []
    real = dedup_index_mod.build_dedup_index

    def counting(*a, **kw):
        builds.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(dedup_index_mod, "build_dedup_index", counting)
    dedup_index_mod.ensure_dedup_index(spark, corpus_df, idx, bands=4)
    assert builds == [1]
    assert read_fingerprint(idx) == fp_a


def test_signature_store_interrupted_rebuild(
    spark, corpus_df, tmp_path, monkeypatch
):
    """Same protocol on the signature store: a rebuild that dies after
    the groups write leaves no fingerprint, so the next ensure (any
    params) rebuilds instead of priming the memo with a torn mix."""
    from cs6300_vectordbs_spark.operators.dedup import (
        clear_exact_group_cache,
    )

    store = str(tmp_path / "store")
    clear_exact_group_cache()
    dedup_index_mod.ensure_signature_tables(
        spark, corpus_df, store, num_hashes=16
    )
    fp_a = read_fingerprint(store)
    assert fp_a is not None

    import cs6300_vectordbs_spark.operators.dedup as dedup_ops

    def crash(*a, **kw):
        raise RuntimeError("injected crash mid-rebuild")

    # num_hashes change -> rebuild path; the minhash builder dies
    # AFTER groups were overwritten
    monkeypatch.setattr(dedup_index_mod, "minhash_signature_table", crash)
    clear_exact_group_cache()
    with pytest.raises(RuntimeError, match="mid-rebuild"):
        dedup_index_mod.ensure_signature_tables(
            spark, corpus_df, store, num_hashes=8
        )
    assert read_fingerprint(store) is None  # invalidated up front
    monkeypatch.undo()

    # original-params caller: must take the BUILD path (marker gone)
    clear_exact_group_cache()
    t = dedup_index_mod.ensure_signature_tables(
        spark, corpus_df, store, num_hashes=16
    )
    assert read_fingerprint(store) == fp_a
    assert t["minhash"].count() > 0
    clear_exact_group_cache()
