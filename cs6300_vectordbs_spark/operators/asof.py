"""As-of (point-in-time) join — a custom temporal operator Spark lacks
as a built-in (extension surface; the reference engine has no temporal
joins — its row model is id→vector only, /root/reference/src/db.py).

``asof_join(left, right, on=k)`` attaches, to every left row, the
payload of the right row with the greatest ``right_ts <= left_ts`` for
the same key (backward direction, inclusive) — the classic
trade↔quote / event-attribution join.

Spark-first formulation: the naive plan is a range join (``l.ts >=
r.ts`` theta-join) which Catalyst executes as a per-key cartesian — at
100 TB that's quadratic and dead. Instead we express it as a UNION +
single window pass, the distributed merge-join shape:

  1. tag right rows side=0, left rows side=1; union on (key, ts, side);
  2. one shuffle, partitioned by key, sorted by (ts, side, tiebreak);
  3. ``last(right_payload_struct, ignorenulls=True)`` over rows
     UNBOUNDED PRECEDING..CURRENT carries the latest right payload
     forward onto each left row;
  4. keep side=1 rows, unpack the struct.

Cost: ONE shuffle of |left|+|right| rows, sequential scan per key —
the same asymptotics as a sort-merge join, no row amplification.
Payload travels as a single STRUCT so all matched columns come from
the SAME right row (per-column ``last`` could mix rows when right
fields are legitimately NULL). Hot-key skew is AQE's skew-split
problem, same as any sort-merge join.

Determinism: right rows tied on (key, ts) are ordered by ``tie_cols``
and the LAST one wins — a total order the DuckDB ``ASOF JOIN`` oracle
reproduces by pre-deduplicating right to one row per (key, ts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_cols: list[str] | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Backward-inclusive as-of join; see module docstring.

    Returns all ``left`` columns plus ``<right_ts><suffix>`` and each
    payload column as ``<name><suffix>`` (NULL when no right row is at
    or before the left timestamp, or outside ``tolerance_us``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    tie_cols = tie_cols or []

    pay = F.struct(
        F.col(right_ts).alias("__mt"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    row = F.struct(*[F.col(c).alias(c) for c in left.columns])
    # Identical union schema: (keys..., __t, __side, __tie..., __pay, __row)
    n_tie = len(tie_cols)
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__tie{i}") for i, c in enumerate(tie_cols)],
        pay.alias("__pay"),
        F.lit(None).alias("__row"),
    )
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__tie{i}")
            for i, c in enumerate(tie_cols)
        ],
        F.lit(None).cast(r2.schema["__pay"].dataType).alias("__pay"),
        row.alias("__row"),
    )
    r2 = r2.withColumn(
        "__row", F.lit(None).cast(l2.schema["__row"].dataType)
    )

    order = [F.col("__t").asc(), F.col("__side").asc()] + [
        F.col(f"__tie{i}").asc() for i in range(n_tie)
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r2.unionByName(l2).withColumn(
        "__m", F.last("__pay", ignorenulls=True).over(w)
    )
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__m.__mt"))
        ) <= F.lit(tolerance_us)
        merged = merged.withColumn(
            "__m", F.when(in_tol, F.col("__m"))
        )

    out_cols: list[Column] = [
        F.col(f"__row.{c}").alias(c) for c in left.columns
    ]
    out_cols.append(F.col("__m.__mt").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return merged.filter(F.col("__side") == 1).select(*out_cols)
