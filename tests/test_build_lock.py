"""Concurrent-builder contract for the persisted stores
(sources/index_common.build_lock): two builders racing one index path
must never interleave their table overwrites — one builds, the other
blocks on the flock and then serves the winner's committed index via
the double-checked fingerprint read.

Two layers of evidence:
- a PURE-PYTHON two-PROCESS race over the exact check-lock-recheck-
  build protocol (flock is advisory and process-scoped, so this is
  the real mutual-exclusion claim);
- a two-THREAD race through the real ensure_dedup_index (each thread
  opens its own file description, so flock excludes threads too),
  asserting exactly one build runs and both callers serve a complete,
  fingerprint-consistent index.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import threading
import time

from cs6300_vectordbs_spark.sources.index_common import (
    build_lock,
    read_fingerprint,
    write_fingerprint,
)


def _racing_builder(path: str, builder_id: int, fp: str, log: str) -> None:
    """The ensure_* protocol with a deliberately slow, torn-prone
    build: three payload files written with sleeps between them. Any
    interleaving of two builders is visible as mixed builder ids."""

    def complete() -> bool:
        return (
            all(os.path.exists(f"{path}/part{i}") for i in range(3))
            and read_fingerprint(path) == fp
        )

    if complete():
        outcome = "reused_fast"
    else:
        with build_lock(path):
            if complete():
                outcome = "reused_locked"
            else:
                try:
                    os.remove(f"{path}/FINGERPRINT")
                except FileNotFoundError:
                    pass
                for i in range(3):
                    with open(f"{path}/part{i}", "w") as f:
                        f.write(str(builder_id))
                    time.sleep(0.15)
                write_fingerprint(path, fp)
                outcome = "built"
    ids = {open(f"{path}/part{i}").read() for i in range(3)}
    with open(f"{log}/{builder_id}", "w") as f:
        json.dump({"outcome": outcome, "ids_seen": sorted(ids)}, f)


def test_two_process_race_single_consistent_build(tmp_path):
    path = str(tmp_path / "store")
    log = str(tmp_path / "log")
    os.makedirs(log)
    fp = "42:abc:v=1"
    procs = [
        mp.Process(target=_racing_builder, args=(path, i, fp, log))
        for i in range(2)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
        assert p.exitcode == 0
    results = [json.load(open(f"{log}/{i}")) for i in range(2)]
    outcomes = sorted(r["outcome"] for r in results)
    # exactly one built; the other reused (blocked on the lock, then
    # found the winner's fingerprint) — never two builds
    assert outcomes.count("built") == 1
    # every reader saw ONE builder's complete payload, never a mix
    for r in results:
        assert len(r["ids_seen"]) == 1
    assert read_fingerprint(path) == fp


def test_two_thread_ensure_dedup_builds_once(spark, tmp_path, monkeypatch):
    """Two concurrent ensure_dedup_index calls on one path: the flock
    serializes them (each thread's own fd is its own open file
    description), the loser's under-lock re-check reuses the winner's
    commit, and both end up probing a complete index."""
    from cs6300_vectordbs_spark.sources import dedup_index as di

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 7} jumps over dog {i % 3}")
         for i in range(40)],
        "doc_id long, text string",
    ).localCheckpoint(eager=True)
    path = str(tmp_path / "dedup_idx")

    builds = []
    real_build = di.build_dedup_index

    def counting_build(*a, **kw):
        builds.append(threading.get_ident())
        time.sleep(0.3)  # widen the race window
        return real_build(*a, **kw)

    monkeypatch.setattr(di, "build_dedup_index", counting_build)

    errors = []

    def run():
        try:
            di.ensure_dedup_index(spark, docs, path)
        except Exception as exc:  # noqa: BLE001 — surface in main thread
            errors.append(exc)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors
    assert len(builds) == 1, f"expected one build, got {len(builds)}"
    assert di.dedup_index_exists(path)
    assert read_fingerprint(path) is not None
    # the committed index actually serves
    probe = di.probe_dedup_index(
        spark,
        spark.createDataFrame(
            [(1000, "the quick brown fox 1 jumps over dog 1")],
            "doc_id long, text string",
        ),
        path,
        min_jaccard=0.3,
    )
    assert probe.count() > 0
