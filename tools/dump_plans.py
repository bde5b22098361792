"""Dump `.explain("formatted")` output for named queries to files.

Usage:
    python tools/dump_plans.py <tag> name1 name2 ...
    # -> plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<tag>.txt (default r10)

<tag> is typically "before" or "after". Runs at $SPARK_GRAFT_PLAN_SF
(default sf0.001 — plan SHAPE is scale-invariant for these queries; the
bench numbers come from sf0.1). Streaming queries are skipped: their
plan exists only inside the micro-batch engine.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r10"),
)


def main(tag: str, names: list[str]) -> int:
    import __spark_entry__ as e
    from cs6300_vectordbs_spark import get_spark

    spark = get_spark(app_name=f"dump-plans-{tag}", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    rc = 0
    for name in names:
        if name not in qs:
            print(f"unknown query {name!r}", file=sys.stderr)
            rc = 1
            continue
        if name.endswith("_stream"):
            print(f"skip streaming query {name}", file=sys.stderr)
            continue
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return rc


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    raise SystemExit(main(sys.argv[1], sys.argv[2:]))
