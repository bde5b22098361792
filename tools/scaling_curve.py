"""Measured scale curve: the 20 headline bench queries at THREE data
scales (sf0.001 / sf0.01 / sf0.1 — 100x end to end), committed to
SCALING.md so the 100-TB claim rests on a measured wall-vs-data curve,
not on plan shape alone.

Method: one Spark session, per-sf table warm-up (same as bench.py),
min-of-2 per query per sf (the extended-bench estimator; committed
per-rep arrays make variance visible). Growth is reported as
t(sf0.1) / t(sf0.01) against the 10x data ratio: at these absolute
sizes most queries are overhead-bound (sub-linear growth); anything
with growth ratio > the data ratio is flagged SUPER-LINEAR — a real
finding, not noise, if it reproduces on an idle host.

Prints one JSON line:
  {"sfs": [...], "queries": {name: {sf: sec, ...}}, "growth_01_to_1":
   {name: ratio}, "superlinear": [names]}

Usage: python tools/scaling_curve.py   (run ALONE — concurrent tasks
pollute timings; ~5 min on local[32])
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
REPS = 2


def main() -> None:
    import __spark_entry__ as entrymod
    from cs6300_vectordbs_spark import get_spark
    from cs6300_vectordbs_spark.io import TABLES, read_events

    spark = get_spark(app_name="scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out: dict[str, dict[str, float]] = {n: {} for n in BENCH_QUERIES}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for t in TABLES:
            if t == "events":
                read_events(spark, sf_dir).count()
            else:
                spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        for name in BENCH_QUERIES:
            best = None
            try:
                for _ in range(REPS):
                    t0 = time.time()
                    qs[name](spark, sf_dir).count()
                    el = time.time() - t0
                    best = el if best is None else min(best, el)
            except Exception as exc:  # noqa: BLE001 — record, keep going
                print(f"scaling: {name}@sf{sf} FAILED: {exc}", file=sys.stderr)
                best = -1.0
            out[name][sf] = round(best, 3)
            print(f"sf{sf} {name}: {out[name][sf]}s", file=sys.stderr)

    growth = {}
    for name in BENCH_QUERIES:
        a, b = out[name].get("0.01", -1), out[name].get("0.1", -1)
        growth[name] = round(b / a, 2) if a and a > 0 and b > 0 else None
    superlinear = sorted(
        n for n, g in growth.items() if g is not None and g > 10.0
    )
    print(
        json.dumps(
            {
                "sfs": SFS,
                "reps": REPS,
                "queries": out,
                "growth_01_to_1": growth,
                "superlinear": superlinear,
            }
        )
    )


if __name__ == "__main__":
    main()
