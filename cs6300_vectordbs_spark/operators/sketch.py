"""Deterministic distinct-count sketch (KMV / bottom-k) — the
cardinality-estimation primitive a 100 TB profiling pass needs when an
exact ``COUNT(DISTINCT)`` shuffle is too expensive (extension surface;
the reference has no sketches).

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is the
production default, but its register layout is engine-internal — no
independent engine can replay it, so it can't be oracle-checked. This
KMV sketch is built from portable md5 arithmetic: hash every value to
a uniform double in (0, 1], keep the k smallest DISTINCT hashes, and
estimate N ≈ (k-1) / h_(k) (Bar-Yossef et al. 2002, the KMV
estimator). Every step is reproducible bit-for-bit in any engine with
md5 — DuckDB runs the identical math as the oracle.

Scale shape: the distinct() is a shuffle on the hash (map-side
partial), then ``ORDER BY h LIMIT k`` — which Spark executes as
TakeOrderedAndProject: each partition keeps only its local k smallest,
so the merge moves O(k × partitions) rows, never the data. The final
aggregate is a scalar. Nothing driver-side until the 1-row result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits; +1 shifts to (0, 2^60] so h is never 0.
_TWO_60 = float(1 << 60)


def md5_uniform(col: Column | str, salt: str = "kmv") -> Column:
    """Portable uniform (0, 1] hash of a column's string form."""
    c = F.col(col) if isinstance(col, str) else col
    h64 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h64 + F.lit(1)) / F.lit(_TWO_60)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: (est_distinct, exact_distinct, rel_err).

    est = (k-1)/h_(k) when ≥k distinct values exist, else the exact
    count (the sketch IS the full distinct set below k). The exact
    column is computed from the same distinct hash set — it is the
    reference the estimate is judged against in tests/oracles; drop it
    for production profiling runs.
    """
    hashes = df.select(md5_uniform(col).alias("h")).distinct()
    topk = hashes.orderBy(F.col("h").asc()).limit(k)
    exact = hashes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    est = topk.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    return (
        est.crossJoin(exact)
        .select(
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("h_k"))
            .alias("est_distinct"),
            F.col("n").alias("exact_distinct"),
        )
        .select(
            "est_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                9,
            ).alias("rel_err"),
        )
    )


def cms_build(
    df: DataFrame, key: str, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of a key's frequency distribution: ``depth``
    independent md5 hash rows x ``width`` counters, as (j, bucket, cnt)
    rows — the frequency-estimation complement of the KMV distinct
    sketch, with the same portability rationale (every engine with md5
    replays it bit-for-bit, unlike engine-internal sketch registers).

    Scale shape: one explode(depth) + one hash aggregate with map-side
    combine; the sketch is depth x width rows TOTAL regardless of input
    size — mergeable across partitions, shards, or days by summing
    counters (the linearity CMS is built for).
    """
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    ex = df.select(F.col(key).cast("string").alias("__k"), j)
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("j"), F.col("__k"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )
    return (
        ex.select("j", bucket.alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, keys: DataFrame, key: str, *, depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch: estimate(key) = min over rows of the
    key's counter. Guaranteed >= the true count (collisions only ever
    inflate), within eN of it with high probability for e = e/width.
    The probe joins the BROADCAST sketch (depth x width rows) on
    (j, bucket) — no scan of the original data."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    probes = keys.select(F.col(key), F.col(key).cast("string").alias("__k"), j)
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("j"), F.col("__k"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )
    probes = probes.select(F.col(key), "j", bucket.alias("bucket"))
    return (
        probes.join(F.broadcast(cms), on=["j", "bucket"], how="left")
        .groupBy(key)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )


def _bloom_pos(col: Column | str, i: int, m: int) -> Column:
    """Bloom hash i: portable md5-hash60 of the salted key, mod m.
    Reproducible in any engine as
    ``('0x' || substr(md5('bloom{i}|' || key), 1, 15))::BIGINT % m``."""
    h = F.md5(F.concat(F.lit(f"bloom{i}|"), F.col(col) if isinstance(col, str) else col))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"), F.lit(m)
    )


def bloom_build_bits(
    df: DataFrame, col: str, m: int = 4096, k: int = 3
) -> list[int]:
    """Build a Bloom filter over ``df[col]``: the sorted list of set
    bit positions. Distributed bit-position aggregate (≤ m rows reach
    the driver — bounded by the filter geometry, not the data; the
    same bounded-metadata contract as kmeans centroids), OR-merge is
    the ``distinct``. NULL keys are the caller's problem — filter
    them first (a NULL hashes to NULL and would silently set
    nothing)."""
    pos = df.select(
        F.explode(F.array(*[_bloom_pos(col, i, m) for i in range(k)])).alias(
            "bit"
        )
    ).distinct()
    return sorted(r["bit"] for r in pos.collect())


def bloom_mask_words(bits: list[int], m: int = 4096) -> list[int]:
    """Pack set bit positions into m/32 32-bit words (32-bit so the
    probe's DIV/POW arithmetic stays exact in any engine's integer or
    double math)."""
    words = [0] * ((m + 31) // 32)
    for b in bits:
        words[b // 32] |= 1 << (b % 32)
    return words


def bloom_hit(
    col: str, mask_words: list[int], m: int = 4096, k: int = 3
) -> Column:
    """Membership test against a LITERAL mask — the 100-TB shape: the
    filter ships inside the plan (m/32 ints, ~0.5 KB at m=4096), so
    the probe is MAP-ONLY: no shuffle, no join, evaluated in the scan
    stage. Bit test via integer DIV/mod (no shift-by-column in Spark
    SQL; POW(2, b%32) is exact in doubles for b%32 ≤ 31)."""
    arr = "array(" + ",".join(f"{w}L" for w in mask_words) + ")"
    tests = []
    for i in range(k):
        b = (
            f"pmod(CAST(conv(substring(md5(concat('bloom{i}|', {col})),"
            f" 1, 15), 16, 10) AS BIGINT), {m})"
        )
        # Integer DIV throughout — bigint `/` is DOUBLE division in
        # Spark SQL, and truncating an inexact quotient can misround
        # at word values near 2^32; DIV cannot.
        tests.append(
            f"(pmod(element_at({arr}, CAST(({b}) DIV 32 AS INT) + 1)"
            f" DIV CAST(pow(2, pmod({b}, 32)) AS BIGINT), 2) = 1)"
        )
    return F.expr(" AND ".join(tests))
