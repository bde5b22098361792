"""Measured scale curve for the persisted signature-table store
(sources/dedup_index.ensure_signature_tables) — the cross-session
amortization path SCALING.md's cost model describes. Three numbers
per scale factor, each the cost a real deployment pays at a
different point in the store's lifecycle:

  build  — store absent: one linear text pass (exact-dup collapse +
           MinHash/shingle/SimHash pipelines) + the parquet writes.
           Paid once per corpus version.
  reuse  — store complete, fresh session (memo cleared): the
           content-addressed corpus fingerprint scan + reading the
           stored tables back through eager localCheckpoints. Paid
           once per session.
  serve  — the first pair query after the reuse ensure
           (minhash_lsh_pairs off the primed tables): what every
           downstream job pays instead of the build.

The claim under test: build grows linearly with the corpus (it is
one pass + one write), reuse grows with the columnar (id, text) scan
plus the signature-table read (both linear, small constants), and
serve approaches the session-warm floor. Growth is reported as
t(sf0.1) / t(sf0.01) against the 10x data ratio.

Usage: python tools/store_scaling.py   (run ALONE — concurrent tasks
pollute timings; ~2 min on local[32])
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    from cs6300_vectordbs_spark import get_spark
    from cs6300_vectordbs_spark.operators.dedup import (
        clear_exact_group_cache,
        minhash_lsh_pairs,
    )
    from cs6300_vectordbs_spark.sources.dedup_index import (
        ensure_signature_tables,
    )

    spark = get_spark(app_name="store-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="store_scaling_")
    out: dict[str, dict[str, float]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.count()  # warm the table (page cache, JIT)
        store = os.path.join(root, f"sf{sf}")

        clear_exact_group_cache()
        t0 = time.time()
        ensure_signature_tables(spark, docs, store)
        build = time.time() - t0

        clear_exact_group_cache()
        t0 = time.time()
        ensure_signature_tables(spark, docs, store)
        reuse = time.time() - t0

        t0 = time.time()
        minhash_lsh_pairs(docs, min_jaccard=0.3).count()
        serve = time.time() - t0

        # the no-store cold cost for comparison: same pair query,
        # memo cleared, store not consulted
        clear_exact_group_cache()
        t0 = time.time()
        minhash_lsh_pairs(docs, min_jaccard=0.3).count()
        cold_no_store = time.time() - t0

        out[sf] = {
            "build": round(build, 3),
            "reuse": round(reuse, 3),
            "serve": round(serve, 3),
            "cold_no_store": round(cold_no_store, 3),
        }
        print(f"sf{sf}: {out[sf]}", file=sys.stderr)
        clear_exact_group_cache()

    shutil.rmtree(root, ignore_errors=True)
    growth = {
        k: (
            round(out["0.1"][k] / out["0.01"][k], 2)
            if out["0.01"][k] > 0
            else None
        )
        for k in ("build", "reuse", "serve", "cold_no_store")
    }
    print(json.dumps({"sfs": SFS, "curve": out, "growth_01_to_1": growth}))


if __name__ == "__main__":
    main()
