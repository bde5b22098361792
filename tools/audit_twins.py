"""Static audit of the driver contract in __spark_entry__.py — the
mistakes the differential CANNOT catch because they make a query
silently vanish rather than fail:

  1. duplicate keys in the queries()/oracle_sql() dict literals — a
     re-registered name silently shadows the first entry, so the old
     query stops being checked with no red anywhere;
  2. oracle entries with no matching queries() entry (orphans — dead
     SQL the gate never runs);
  3. queries() entries with no oracle outside the explicit rows-only
     allowlist (a new query someone forgot to give a twin: the driver
     would record a weak rows-only check instead of a value-hash);
  4. registered-but-undefined or defined-but-unregistered q_ functions
     (the latter is informational: helpers feeding other queries).

Pure AST + one import — no Spark session, runs in ~1 s. Run before
every round close alongside tools/verify_local.py.
"""

from __future__ import annotations

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "__spark_entry__.py",
)

# The ONLY queries allowed to lack a DuckDB twin (engine-native sketch
# and wall-clock measurement — documented in DRIVER_COVERAGE.md).
ROWS_ONLY_ALLOWED = {"latency_percentiles_approx", "search_latency_wallclock"}


def _dict_literal_keys(fn: ast.FunctionDef) -> list[str]:
    for node in ast.walk(fn):
        if isinstance(node, ast.Return) and isinstance(node.value, ast.Dict):
            return [
                k.value
                for k in node.value.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
    raise AssertionError(f"{fn.name}: no dict-literal return found")


def main() -> int:
    tree = ast.parse(open(ENTRY).read())
    fns = {
        n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
    }
    q_keys = _dict_literal_keys(fns["queries"])
    o_keys = _dict_literal_keys(fns["oracle_sql"])
    problems: list[str] = []
    infos: list[str] = []

    for label, keys in (("queries()", q_keys), ("oracle_sql()", o_keys)):
        seen: set[str] = set()
        for k in keys:
            if k in seen:
                problems.append(f"DUPLICATE key in {label}: {k!r}")
            seen.add(k)

    qs, os_ = set(q_keys), set(o_keys)
    for k in sorted(os_ - qs):
        problems.append(f"ORPHAN oracle (no queries() entry): {k!r}")
    for k in sorted(qs - os_ - ROWS_ONLY_ALLOWED):
        problems.append(f"MISSING oracle (not in rows-only allowlist): {k!r}")
    for k in sorted(ROWS_ONLY_ALLOWED & os_):
        problems.append(f"rows-only-allowlisted query HAS an oracle: {k!r}")
    for k in sorted(ROWS_ONLY_ALLOWED - qs):
        infos.append(f"allowlisted name not registered: {k!r}")

    # registration targets must be defined module-level functions
    ret = next(
        n.value
        for n in ast.walk(fns["queries"])
        if isinstance(n, ast.Return) and isinstance(n.value, ast.Dict)
    )
    registered_fns = {
        v.id for v in ret.values if isinstance(v, ast.Name)
    }
    for name in sorted(registered_fns - set(fns)):
        problems.append(f"registered function not defined: {name}")
    unreg = {
        f for f in fns if f.startswith("q_")
    } - registered_fns
    for name in sorted(unreg):
        infos.append(f"defined q_ function not registered: {name}")

    # import check: the module must load and the dicts must agree with
    # the AST view (catches computed/conditional registration drift)
    import __spark_entry__ as e

    live_q, live_o = list(e.queries()), list(e.oracle_sql())
    if live_q != list(dict.fromkeys(q_keys)):
        problems.append("live queries() order differs from AST literal")
    if set(live_o) != set(dict.fromkeys(o_keys)):
        problems.append("live oracle_sql() keys differ from AST literal")

    for line in infos:
        print(f"  [info] {line}")
    for line in problems:
        print(f"  [PROBLEM] {line}")
    n_window = min(50, len(live_q))
    print(
        f"audit: {len(problems)} problems; {len(live_q)} queries, "
        f"{len(live_o)} oracles, {len(live_q) - len(live_o)} rows-only, "
        f"window = first {n_window}"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
