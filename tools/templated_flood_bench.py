"""Templated-flood control experiment: measure the per-band-bucket cap
(minhash_lsh_pairs max_band_bucket) against an uncapped control on an
adversarial corpus the cap exists for — thousands of byte-DISTINCT
documents generated from a handful of boilerplate templates (identical
except a serial token), the shape web-scale corpora are full of.

The exact-dup collapse guard cannot help here (every doc has a unique
fingerprint), so all instances of a template flood the same LSH band
buckets and the uncapped banded self-join materializes
O(instances^2 / 2) candidate rows per template x bands — the quadratic
blowup. The cap keeps the `cap` smallest ids per band bucket, bounding
candidates at C(cap, 2) per bucket regardless of flood size.

Prints one JSON line:
  {"serials": S, "templates": 5, "uniques": U, "cap": C,
   "uncapped_sec": ..., "uncapped_pairs": N1,
   "capped_sec": ...,  "capped_pairs": N2}

Usage: python tools/templated_flood_bench.py [serials] [uniques] [cap]
Defaults: 1000 serials/template (5,000 flooded docs), 2,000 unique
docs, cap 64. Committed results live in SCALING.md ("Templated-flood
cap experiment").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_hostile_testdata import TEMPLATES  # noqa: E402  (same dir)

from cs6300_vectordbs_spark import get_spark  # noqa: E402
from cs6300_vectordbs_spark.operators.dedup import (  # noqa: E402
    clear_exact_group_cache,
    minhash_lsh_pairs,
)


def _corpus(spark, serials: int, uniques: int):
    rows = []
    for ti, tmpl in enumerate(TEMPLATES):
        for s in range(serials):
            rows.append(
                (ti * serials + s, tmpl.replace("{SER}", f"ref{ti}x{s:06d}"))
            )
    base = len(TEMPLATES) * serials
    # unique filler: deterministic distinct word soup, no near-dups
    words = [f"w{i:03d}" for i in range(400)]
    for u in range(uniques):
        toks = [words[(u * 7 + j * (u % 13 + 1)) % 400] for j in range(30)]
        rows.append((base + u, f"unique doc {u} " + " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    serials = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    uniques = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = get_spark(app_name="templated-flood-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _corpus(spark, serials, uniques).localCheckpoint(eager=True)
    docs.count()  # warm

    out = {
        "serials": serials,
        "templates": len(TEMPLATES),
        "uniques": uniques,
        "cap": cap,
    }
    for label, kw in (
        ("uncapped", {}),
        ("capped", {"max_band_bucket": cap}),
    ):
        clear_exact_group_cache()  # both arms pay the guard identically
        t0 = time.time()
        n = minhash_lsh_pairs(docs, min_jaccard=0.3, **kw).count()
        out[f"{label}_sec"] = round(time.time() - t0, 2)
        out[f"{label}_pairs"] = n
    print(json.dumps(out))


if __name__ == "__main__":
    main()
