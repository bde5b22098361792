"""Deterministic sampling (reference T3).

The reference uses unseeded ``random.sample(dataset, 500)``
(/root/reference/src/queries.py:438) — nondeterministic. Verified paths
need cross-engine determinism, so two strategies:

  - hash_sample: Knuth-style multiplicative hash on the key, pure
    arithmetic → identical in Spark and any SQL engine, scan-parallel,
    no sort. The scale-path default.
  - seeded_topn: exact-N via rand(seed) + limit — deterministic within
    Spark but NOT portable across engines (seeded PRNGs differ), so it
    never appears in oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import ColumnOrName, _col

# Knuth multiplicative hashing constant (2^32 * golden ratio conjugate).
_KNUTH = 2654435761


def hash_bucket(key: ColumnOrName, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key.

    The key is reduced to 31 bits BEFORE the Knuth multiply so the
    product stays below 2^63 (2^31 * 2654435761 < 2^63 — masking to 32
    bits would still overflow ANSI bigint), and ``pmod`` keeps every
    intermediate non-negative for negative keys. Identical arithmetic in
    any SQL engine: ((key % 2^31) * 2654435761) % 2^32 % buckets for
    non-negative keys.
    """
    k = F.pmod(_col(key).cast("bigint"), F.lit(2147483648))
    return F.pmod(F.pmod(k * _KNUTH, F.lit(4294967296)), F.lit(buckets)).cast("int")


def hash_sample(df: DataFrame, key: str, pct: int = 10) -> DataFrame:
    """Keep ~pct% of rows, deterministically, by integer key."""
    return df.filter(hash_bucket(key, 100) < pct)


def balanced_sample(
    df: DataFrame,
    *,
    label_col: str = "label",
    key_col: str = "vec_id",
    cap: int = 100,
) -> DataFrame:
    """Class rebalancing: keep at most ``cap`` rows per label, selected
    by a deterministic portable hash order (md5 of the key) — the
    pseudo-random-but-reproducible draw a training pipeline needs when
    downsampling majority classes.

    Plan: one window per label with ``row_number() <= cap``, which
    compiles to WindowGroupLimit — every map task pre-truncates to cap
    rows per label BEFORE the exchange, so even a label holding 99% of
    a 100 TB corpus ships only O(partitions x cap) rows to its reducer.
    Adds ``sample_rank`` (1-based position in the hash order).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bs|"), F.col(key_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("bigint")
    w = Window.partitionBy(label_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= cap)
    )


def seeded_topn(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Exact-count random-ish sample, deterministic within Spark."""
    return df.orderBy(F.rand(seed)).limit(n)


def stratified_hash_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~rates[stratum]% of each
    stratum's rows (``default_pct`` for unlisted strata) by hashed key.

    The rate table becomes a CASE expression, not a join — a training-
    data pipeline downsampling by language/source/quality-band runs this
    as a pure scan-side filter: one pass, no shuffle, no side table, and
    Catalyst pushes the whole predicate toward the parquet scan.
    """
    pct = F.lit(default_pct)
    for value, rate in sorted(rates.items()):
        pct = F.when(F.col(stratum) == value, F.lit(rate)).otherwise(pct)
    return df.filter(hash_bucket(key, 100) < pct)


def temperature_resample(
    df: DataFrame,
    group_col: str = "lang",
    key_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based group rebalancing — the multilingual sampling
    rule from XLM-R/mT5 (Conneau et al. 2020 §3.1; Xue et al. 2021
    §3.2): resample so group l's share moves from p_l = n_l/N toward
    q_l ∝ p_l^alpha (alpha<1 flattens the distribution, upweighting
    low-resource groups). Realized as a deterministic per-row
    acceptance test: keep row iff u(key) < rate_l where
    rate_l = min(1, q_l/p_l · scale) with scale chosen so the expected
    output size stays N (rates above 1 clip — this engine downsamples
    rather than duplicating rows).

    Cross-engine determinism: group counts are exact integers; the
    only float ops are one sqrt per group (IEEE correctly-rounded —
    ``alpha`` other than 0.5 uses libm pow, see note), a SEQUENTIAL
    normalizer fold in group-ASC order (mirrored by the oracle's
    ``list_aggregate(list(... ORDER BY ...), 'sum')``), and two
    divisions in a pinned order; the final rate is round(9) on both
    sides, and u is an exact 6-decimal rational, so a disagreement
    needs a rate within 1e-9 of a 1e-6 grid point AND a differing
    last-ulp — the fold pinning removes the second condition.

    Scale shape: ONE tiny aggregate (distinct groups to the driver —
    bounded-by-contract metadata, like kmeans centroids), then a
    map-only CASE filter; no join, no second shuffle, and Catalyst
    pushes the group/hash predicate to the scan. Rows with NULL group
    are dropped (no rate is defined for them; they are quarantine
    material upstream).
    """
    import math

    counts = sorted(
        (r[group_col], r["n"])
        for r in df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r[group_col] is not None
    )
    if not counts:
        return df.select(
            F.col(key_col),
            F.col(group_col),
            F.lit(0.0).alias("rate"),
            F.lit(0.0).alias("u"),
        ).limit(0)
    n_total = sum(n for _, n in counts)
    # Sequential fold in group-ASC order — pinned summation order is
    # what lets the SQL oracle reproduce the normalizer bit-exactly.
    weights = []
    z = 0.0
    for g, n in counts:
        w = math.sqrt(n / n_total) if alpha == 0.5 else (n / n_total) ** alpha
        weights.append((g, n, w))
        z += w
    rates = {
        g: round(min(1.0, (w / z) * (n_total / n)), 9)
        for g, n, w in weights
    }
    rate = F.lit(None).cast("double")
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(r)).otherwise(rate)
    u = F.round(
        hash_bucket(key_col, 1000000).cast("double") / F.lit(1000000.0), 9
    )
    return (
        df.select(
            F.col(key_col),
            F.col(group_col),
            rate.alias("rate"),
            u.alias("u"),
        )
        .filter(F.col("u") < F.col("rate"))
    )
