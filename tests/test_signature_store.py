"""Persisted signature-table store lifecycle (r08 task #4): the
cross-session form of the dedup family's session memo. Build once per
corpus version; a fresh session reads the stored tables through the
memo and the pair operators produce byte-identical results without
re-running the text pipeline.
"""

from __future__ import annotations

import pytest

import cs6300_vectordbs_spark.operators.dedup as dedup_mod
from cs6300_vectordbs_spark.operators.dedup import (
    clear_exact_group_cache,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from cs6300_vectordbs_spark.sources.dedup_index import (
    ensure_signature_tables,
)
from cs6300_vectordbs_spark.sources.index_common import read_fingerprint

CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
    (3, "ALPHA  beta gamma delta epsilon zeta"),  # normalized dup of 1
    (4, "alpha beta gamma delta epsilon eta"),  # near dup
    (5, "the quick brown fox jumps over the lazy dog today"),
    (6, "completely unrelated text about something else entirely"),
    (7, None),  # NULL text
    (8, "short"),  # unshingleable at n=3
]

PARAMS = dict(num_hashes=16, shingle_n=3, ngram_n=3, simhash_n=2)


def _pairs(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture()
def corpus(spark, tmp_path):
    # file-backed so the memo key (and therefore the priming) is
    # plan-stable across separate reads — the cross-session shape
    p = str(tmp_path / "corpus")
    spark.createDataFrame(CORPUS, "doc_id long, text string").write.parquet(p)
    return spark.read.parquet(p)


def test_build_reuse_and_param_invalidation(spark, corpus, tmp_path, monkeypatch):
    store = str(tmp_path / "sig_store")
    builds = []
    real = dedup_mod.minhash_signature_table

    def counting(*a, **kw):
        builds.append(1)
        return real(*a, **kw)

    # ensure_signature_tables imports the symbol lazily from the
    # operators module, so patching the module attr is enough
    monkeypatch.setattr(dedup_mod, "minhash_signature_table", counting)
    import cs6300_vectordbs_spark.sources.dedup_index as di

    monkeypatch.setattr(di, "minhash_signature_table", counting)

    clear_exact_group_cache()
    t1 = ensure_signature_tables(spark, corpus, store, **PARAMS)
    assert len(builds) == 1
    assert read_fingerprint(store) is not None
    assert set(t1) == {"groups", "minhash", "shingles", "simhash"}
    # groups: docs 1,2,3 share normalized content (rep=1)
    assert _pairs(t1["groups"], "id", "rep_id") == [(1, 1), (2, 1), (3, 1)]

    # fresh "session": memo cleared, store complete -> read, no build
    clear_exact_group_cache()
    t2 = ensure_signature_tables(spark, corpus, store, **PARAMS)
    assert len(builds) == 1  # reused from disk
    assert _pairs(t2["minhash"], "id") == _pairs(t1["minhash"], "id")

    # param change invalidates even over the unchanged corpus
    clear_exact_group_cache()
    ensure_signature_tables(
        spark, corpus, store, num_hashes=8, shingle_n=3, ngram_n=3,
        simhash_n=2,
    )
    assert len(builds) == 2


def test_primed_memo_serves_operators_without_rebuild(
    spark, corpus, tmp_path, monkeypatch
):
    """After a reuse-path ensure, the pair operators must run entirely
    off the stored tables: the signature/shingle/fingerprint builders
    are forbidden (monkeypatched to raise) and the results still match
    a from-scratch computation."""
    store = str(tmp_path / "sig_store")
    clear_exact_group_cache()
    ensure_signature_tables(spark, corpus, store, **PARAMS)

    # ground truth, computed with the live builders (memo warm here)
    want_mh = _pairs(
        minhash_lsh_pairs(corpus, min_jaccard=0.3), "id_a", "id_b"
    )
    want_ng = _pairs(
        ngram_jaccard_pairs(corpus, min_jaccard=0.3), "id_a", "id_b"
    )
    want_sh = _pairs(
        simhash_pairs(corpus, max_hamming=3), "id_a", "id_b"
    )
    assert (1, 2) in want_mh and (1, 3) in want_mh  # exact-dup expansion

    # fresh session: memo cleared, builders disabled, store primes
    clear_exact_group_cache()

    def boom(*a, **kw):
        raise AssertionError("text pipeline ran despite persisted store")

    import cs6300_vectordbs_spark.sources.dedup_index as di

    for mod in (dedup_mod, di):
        for name in ("minhash_signature_table",):
            monkeypatch.setattr(mod, name, boom)
    monkeypatch.setattr(dedup_mod, "simhash_fingerprints", boom)
    monkeypatch.setattr(dedup_mod, "shingle_rows", boom)

    ensure_signature_tables(spark, corpus, store, **PARAMS)
    got_mh = _pairs(
        minhash_lsh_pairs(corpus, min_jaccard=0.3), "id_a", "id_b"
    )
    got_ng = _pairs(
        ngram_jaccard_pairs(corpus, min_jaccard=0.3), "id_a", "id_b"
    )
    got_sh = _pairs(simhash_pairs(corpus, max_hamming=3), "id_a", "id_b")
    assert got_mh == want_mh
    assert got_ng == want_ng
    assert got_sh == want_sh
    clear_exact_group_cache()


def test_reuse_after_operator_primes_onto_live_base(
    spark, corpus, tmp_path, monkeypatch
):
    """If an operator already ran this session, the group memo holds
    ITS base — the ensure reuse path must key its table primes off
    that live base (the one operators resolve), not a reconstructed
    plan nobody looks up. Proof: after the reuse-ensure, the ngram
    pipeline builder is forbidden and the operator still runs off
    the primed shingle table."""
    store = str(tmp_path / "sig_store")
    clear_exact_group_cache()
    ensure_signature_tables(spark, corpus, store, **PARAMS)  # build
    want = _pairs(
        ngram_jaccard_pairs(corpus, min_jaccard=0.3), "id_a", "id_b"
    )

    clear_exact_group_cache()
    # a DIFFERENT operator first: the session now holds groups +
    # minhash under ITS OWN base — but no ngram shingle table yet
    _ = _pairs(minhash_lsh_pairs(corpus, min_jaccard=0.3), "id_a", "id_b")

    # reuse-ensure with the group slot occupied: shingles/simhash must
    # be primed onto the EXISTING (live) base
    ensure_signature_tables(spark, corpus, store, **PARAMS)

    # the ngram builder must never run: its table was primed onto the
    # base the session is actually using
    def boom(*a, **kw):
        raise AssertionError("shingle pipeline ran despite primed store")

    monkeypatch.setattr(dedup_mod, "shingle_rows", boom)
    got = _pairs(
        ngram_jaccard_pairs(corpus, min_jaccard=0.3), "id_a", "id_b"
    )
    assert got == want
    clear_exact_group_cache()


def test_clean_corpus_store_roundtrip(spark, tmp_path):
    """No exact dups: groups persists EMPTY, the reuse path primes
    (None, docs, False), and operators still serve from the store."""
    p = str(tmp_path / "clean_corpus")
    spark.createDataFrame(
        [(i, f"totally distinct document number {i} with words {i * 7}")
         for i in range(1, 7)],
        "doc_id long, text string",
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    store = str(tmp_path / "store")
    clear_exact_group_cache()
    t = ensure_signature_tables(spark, docs, store, **PARAMS)
    assert t["groups"].count() == 0
    clear_exact_group_cache()
    t2 = ensure_signature_tables(spark, docs, store, **PARAMS)
    assert t2["minhash"].count() == 6
    # memo primed on docs itself (base == docs on a clean corpus)
    out = minhash_lsh_pairs(docs, min_jaccard=0.0)
    assert out.count() >= 0  # plan constructs and runs off the store
    clear_exact_group_cache()


def test_param_change_rebuild_with_primed_memo_succeeds(
    spark, corpus, tmp_path
):
    """r08 review finding: the reuse path used to prime the memo with
    LAZY reads of the store files, so a later same-session ensure with
    CHANGED params (fingerprint miss -> build path) would resolve its
    memo hits to frames reading from the very paths it overwrites —
    'Cannot overwrite a path that is also being read from' — leaving
    the store fingerprint-less until the memo was cleared by hand.
    Primes are now eager localCheckpoints (decoupled from the store),
    so the rebuild must succeed without any manual clear, and both
    parameterizations must keep producing correct pairs."""
    store = str(tmp_path / "sig_store")
    clear_exact_group_cache()
    ensure_signature_tables(spark, corpus, store, **PARAMS)  # build v1
    clear_exact_group_cache()
    ensure_signature_tables(spark, corpus, store, **PARAMS)  # reuse+prime

    # no clear here — the primed entries are live; changed num_hashes
    # fingerprint-misses into the build path (minhash tag changes,
    # shingles/simhash tags DON'T — those hit the primed entries and
    # get written back onto their own store paths)
    ensure_signature_tables(
        spark, corpus, store, num_hashes=8, shingle_n=3, ngram_n=3,
        simhash_n=2,
    )
    assert read_fingerprint(store) is not None  # rebuild committed

    got = _pairs(
        minhash_lsh_pairs(
            corpus, num_hashes=8, min_jaccard=0.3
        ),
        "id_a", "id_b",
    )
    clear_exact_group_cache()
    want = _pairs(
        minhash_lsh_pairs(corpus, num_hashes=8, min_jaccard=0.3),
        "id_a", "id_b",
    )
    assert got == want
    clear_exact_group_cache()


def test_primed_entries_survive_store_rewrite(spark, corpus, tmp_path):
    """r08 review finding: primed entries must be DECOUPLED from the
    store directory — after another writer rewrites the path, a primed
    operator keeps serving the (checkpointed) tables it was primed
    with instead of failing on vanished part files or silently reading
    different rows."""
    import shutil

    store = str(tmp_path / "sig_store")
    clear_exact_group_cache()
    ensure_signature_tables(spark, corpus, store, **PARAMS)  # build
    want = _pairs(
        simhash_pairs(corpus, max_hamming=3), "id_a", "id_b"
    )
    clear_exact_group_cache()
    ensure_signature_tables(spark, corpus, store, **PARAMS)  # reuse+prime

    # another writer nukes and rewrites the store out from under the
    # session (the cross-job race the single-writer contract allows
    # for DIFFERENT sessions; this session must stay self-consistent)
    shutil.rmtree(store)

    got = _pairs(simhash_pairs(corpus, max_hamming=3), "id_a", "id_b")
    assert got == want
    clear_exact_group_cache()


def test_store_lifecycle_fuzz(spark, corpus, tmp_path):
    """Randomized lifecycle sequences against the store+memo interplay
    — the newest, most stateful code path in the engine. For each
    seeded sequence of {ensure(params A), ensure(params B), memo
    clear, external store deletion, pair query under A or B}, every
    pair-operator result must equal the from-scratch ground truth
    computed before the fuzz began. This covers orderings the
    targeted tests above don't enumerate: param flip-flop rebuilds
    over primed memos, queries between a store deletion and the next
    ensure, ensures racing a warm memo, repeated builds over the same
    path."""
    import random
    import shutil

    A = dict(num_hashes=16, shingle_n=3, ngram_n=3, simhash_n=2)
    B = dict(num_hashes=8, shingle_n=3, ngram_n=3, simhash_n=2)

    clear_exact_group_cache()
    want = {
        "mh_a": _pairs(
            minhash_lsh_pairs(corpus, num_hashes=16, min_jaccard=0.3),
            "id_a", "id_b",
        ),
        "mh_b": _pairs(
            minhash_lsh_pairs(corpus, num_hashes=8, min_jaccard=0.3),
            "id_a", "id_b",
        ),
        "ng": _pairs(
            ngram_jaccard_pairs(corpus, min_jaccard=0.3), "id_a", "id_b"
        ),
        "sh": _pairs(simhash_pairs(corpus, max_hamming=3), "id_a", "id_b"),
    }
    assert want["mh_a"]  # the fixture corpus must produce real pairs

    store = str(tmp_path / "fuzz_store")

    def op_ensure_a():
        ensure_signature_tables(spark, corpus, store, **A)

    def op_ensure_b():
        ensure_signature_tables(spark, corpus, store, **B)

    def op_clear():
        clear_exact_group_cache()

    def op_delete_store():
        shutil.rmtree(store, ignore_errors=True)

    def op_query_mh_a():
        got = _pairs(
            minhash_lsh_pairs(corpus, num_hashes=16, min_jaccard=0.3),
            "id_a", "id_b",
        )
        assert got == want["mh_a"]

    def op_query_mh_b():
        got = _pairs(
            minhash_lsh_pairs(corpus, num_hashes=8, min_jaccard=0.3),
            "id_a", "id_b",
        )
        assert got == want["mh_b"]

    def op_query_ng():
        got = _pairs(
            ngram_jaccard_pairs(corpus, min_jaccard=0.3), "id_a", "id_b"
        )
        assert got == want["ng"]

    def op_query_sh():
        got = _pairs(
            simhash_pairs(corpus, max_hamming=3), "id_a", "id_b"
        )
        assert got == want["sh"]

    ops = [
        op_ensure_a, op_ensure_b, op_clear, op_delete_store,
        op_query_mh_a, op_query_mh_b, op_query_ng, op_query_sh,
    ]
    for seed in (11, 47):
        rng = random.Random(seed)
        clear_exact_group_cache()
        op_delete_store()
        trace = []
        for _ in range(10):
            op = rng.choice(ops)
            trace.append(op.__name__)
            try:
                op()
            except AssertionError as exc:
                raise AssertionError(
                    f"seed {seed}, trace {trace}: {exc}"
                ) from exc
    clear_exact_group_cache()


def test_empty_corpus_store_roundtrip(spark, tmp_path):
    """Degenerate corpus: zero documents. Both the build and reuse
    paths must produce empty tables (not crash on the empty
    aggregate / take(1) / anti-join), and the pair operators must
    return zero rows."""
    p = str(tmp_path / "empty_corpus")
    spark.createDataFrame([], "doc_id long, text string").write.parquet(p)
    docs = spark.read.parquet(p)
    store = str(tmp_path / "store")
    clear_exact_group_cache()
    t = ensure_signature_tables(spark, docs, store, **PARAMS)
    assert {k: v.count() for k, v in t.items()} == {
        "groups": 0, "minhash": 0, "shingles": 0, "simhash": 0
    }
    clear_exact_group_cache()
    t2 = ensure_signature_tables(spark, docs, store, **PARAMS)
    assert t2["minhash"].count() == 0
    assert minhash_lsh_pairs(docs, min_jaccard=0.3).count() == 0
    clear_exact_group_cache()


def test_index_build_rides_primed_signature_store(
    spark, corpus, tmp_path, monkeypatch
):
    """build_dedup_index's signature stage goes through the session
    memo under the pair operators' tag — so an index build over a
    corpus whose signature store was already ensured (cross-session
    warm start: reuse primes the memo) never re-runs the
    text->shingle->hash pipeline. This is the streaming dedup drain's
    cold-start path: ensure_dedup_index over a store-warm corpus pays
    only the band explode + bucketed write."""
    import cs6300_vectordbs_spark.sources.dedup_index as di

    spath = str(tmp_path / "sigs")
    ipath = str(tmp_path / "bands")
    mh = dict(num_hashes=PARAMS["num_hashes"],
              shingle_n=PARAMS["shingle_n"])

    ensure_signature_tables(spark, corpus, spath, **PARAMS)
    clear_exact_group_cache()  # fresh-session simulation
    ensure_signature_tables(spark, corpus, spath, **PARAMS)  # reuse+prime

    def boom(*a, **kw):
        raise AssertionError(
            "index build recomputed the signature pipeline despite a "
            "primed store"
        )

    monkeypatch.setattr(di, "minhash_signature_table", boom)
    di.ensure_dedup_index(spark, corpus, ipath, **mh)
    assert di.dedup_index_exists(ipath)
    # restore: the PROBE side legitimately signatures its (new) batch
    monkeypatch.undo()
    # and the index actually serves correct probes off the warm build
    probe = di.probe_dedup_index(
        spark,
        spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        ),
        ipath,
        min_jaccard=0.3,
    )
    rows = probe.collect()
    # exact dups of the probe text (1, 2, 3) plus the near-dup (4)
    assert sorted(r.indexed_id for r in rows) == [1, 2, 3, 4]
    assert all(
        r.est_jaccard == 1.0 for r in rows if r.indexed_id in (1, 2, 3)
    )
