"""Measured lifecycle curve for the graph-index maintenance verbs
(sources/graph_index.py): chained insert vs rebuild, and the
delete/tombstone/compact path. One number per (scale factor, verb),
each the cost a deployment pays at a different lifecycle point:

  base_build   — full exact-kNN + shortcut build over the old corpus
                 (paid once per corpus version).
  append_b1    — chained insert of batch 1 (~1/7 of the corpus) onto
                 the stored base: the daily-ingest cost.
  append_b2    — batch 2 onto stored merged-1 — must NOT re-pay
                 batch 1 (the chain claim).
  chain_reuse  — re-calling the 2-batch chain with unchanged inputs:
                 fingerprint scans + stored reads only.
  delete       — tombstoning ~1/9 of the corpus (idempotent append).
  serve_tomb   — broadcast beam serve over the survivor view
                 (the anti-join overhead vs a plain serve).
  compact      — threshold-triggered survivor rebuild + tombstone
                 clear (the fold, paid once per delete epoch).

The claims under test: appends are O(batch) (append_b2 ~ append_b1
regardless of how many batches precede it), chain reuse approaches
the fingerprint-scan floor, delete/serve costs are tombstone-set-
sized, and compact costs one base build — never more.

Usage: python tools/graph_maintenance_scaling.py   (run ALONE —
concurrent tasks pollute timings; ~4 min on local[32])
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.01", "0.1"]
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "GRAPH_MAINT_SCALING.json",
)


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from cs6300_vectordbs_spark import get_spark
    from cs6300_vectordbs_spark.operators.ann import nsw_beam_search
    from cs6300_vectordbs_spark.sources.graph_index import (
        append_nsw_graph_chain,
        apply_nsw_tombstones,
        compact_nsw_tombstones,
        delete_from_nsw_graph,
        ensure_nsw_graph,
    )

    spark = get_spark(app_name="graph_maint_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    k, beam, hops, entries, dim = (
        entry._NSW_K, entry._NSW_BEAM, entry._NSW_HOPS,
        entry._NSW_ENTRIES, entry.EMB_DIM,
    )
    curve: dict[str, dict[str, float]] = {}

    for sf in SFS:
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        emb.count()  # warm the file scan out of the first timing
        rem = F.col("vec_id") % 7
        old = emb.filter(~rem.isin(3, 5))
        batches = [
            emb.filter((rem == r) & F.col("embedding").isNotNull())
            for r in (3, 5)
        ]
        root = tempfile.mkdtemp(prefix=f"graph_maint_{sf}_")
        t: dict[str, float] = {}
        kw = dict(
            k=k, beam_width=beam, n_iters=hops, n_entries=entries,
            dim=dim, serve="broadcast", compact_depth=99,
        )

        t0 = time.time()
        ensure_nsw_graph(spark, old, f"{root}/chain/base", k=k)
        t["base_build"] = round(time.time() - t0, 3)

        t0 = time.time()
        append_nsw_graph_chain(spark, old, batches[:1], f"{root}/chain", **kw)
        t["append_b1"] = round(time.time() - t0, 3)

        t0 = time.time()
        append_nsw_graph_chain(spark, old, batches, f"{root}/chain", **kw)
        t["append_b2"] = round(time.time() - t0, 3)

        t0 = time.time()
        append_nsw_graph_chain(spark, old, batches, f"{root}/chain", **kw)
        t["chain_reuse"] = round(time.time() - t0, 3)

        # tombstone lifecycle over a full-corpus graph
        gpath = f"{root}/tomb"
        ensure_nsw_graph(spark, emb, gpath, k=k)
        dels = emb.filter(F.col("vec_id") % 9 == 4).select("vec_id")
        t0 = time.time()
        delete_from_nsw_graph(spark, dels, gpath)
        t["delete"] = round(time.time() - t0, 3)

        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        live, live_edges = apply_nsw_tombstones(spark, emb, gpath)
        t0 = time.time()
        nsw_beam_search(
            live, queries, 5, edges=live_edges, beam_width=beam,
            n_iters=hops, n_entries=entries, dim=dim,
            exclude_self=True, serve="broadcast",
        ).count()
        t["serve_tomb"] = round(time.time() - t0, 3)

        t0 = time.time()
        assert compact_nsw_tombstones(spark, emb, gpath, threshold=0.05, k=k)
        t["compact"] = round(time.time() - t0, 3)

        curve[sf] = t
        shutil.rmtree(root, ignore_errors=True)
        print(f"sf{sf}: {t}", file=sys.stderr)

    growth = {
        verb: round(curve["0.1"][verb] / max(curve["0.01"][verb], 1e-9), 2)
        for verb in curve["0.1"]
    }
    out = {"curve": curve, "growth_001_to_01": growth, "sfs": SFS}
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
