"""Time a single registered query, isolated, with the noop sink.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/time_query.py name [reps] [--count]

Per guide §1.4 the default timed action is the noop sink (computes
every column, discards the result). --count uses .count() instead —
the bench's historical action — for apples-to-apples with BENCH_*.json.
Each rep clears the dedup session memo first, so rep 1 is the cold
number and later reps are warm. Jobs are labelled per guide §1.5.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_count = "--count" in sys.argv
    name = args[0]
    reps = int(args[1]) if len(args) > 1 else 3

    import __spark_entry__ as entrymod
    from cs6300_vectordbs_spark import get_spark
    from cs6300_vectordbs_spark.operators.dedup import clear_exact_group_cache

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"time-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if name not in qs:
        print(f"unknown query {name!r}", file=sys.stderr)
        return 1
    # Warm the session exactly like bench.py: touch every table once.
    from cs6300_vectordbs_spark.io import TABLES, read_events

    for t in TABLES:
        if t == "events":
            read_events(spark, sf_dir).count()
        else:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    times = []
    for i in range(reps):
        clear_exact_group_cache()
        spark.sparkContext.setJobDescription(f"{name} rep {i}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        if use_count:
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        times.append(dt)
        print(f"{name} rep{i}: {dt}s", flush=True)
    print(f"{name}: cold={times[0]} warm_min={min(times[1:] or times)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
