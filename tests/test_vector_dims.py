"""Reference-dimensionality pinning for the vector kernels.

The reference's flagship embedder is all-MiniLM-L6-v2 at 384-d
(/root/reference/src/pineconeDB.py:81); real serving stacks go to
1024-d+. The testdata runs at 64-d, so nothing else in the suite
exercises the kernels at the dims a real user brings. These tests pin:

- correctness of dot / l2_norm / cosine_sim at 384-d and 1024-d
  against a pure-Python sequential left fold (the documented
  evaluation-order contract), and
- the UNROLL_MAX_DIM auto-switch: above the cap, dim=N must produce
  the HOF plan (no F.expr term chain), below it the unrolled chain —
  at 1024-d the unrolled form blows Janino's 64 KB method limit and
  pays a ~40 s compile-fail-retry (measured r05), so silently keeping
  it would be a perf cliff, not a correctness bug.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.functions.vector import (
    UNROLL_MAX_DIM,
    cosine_sim,
    dot,
    l2_norm,
)


def _pyref(a, b):
    d = 0.0
    for x, y in zip(a, b):
        d += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    na, nb = math.sqrt(na), math.sqrt(nb)
    den = na * nb
    return d, na, (0.0 if den == 0.0 else d / den)


@pytest.mark.parametrize("dim", [384, 1024])
def test_kernels_match_python_fold_at_reference_dims(spark, dim):
    rng = random.Random(dim)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)],
         [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )
    got = {
        r.id: (r.d, r.n, r.c)
        for r in df.select(
            "id",
            dot("a", "b", dim).alias("d"),
            l2_norm("a", dim).alias("n"),
            cosine_sim("a", "b", dim).alias("c"),
        ).collect()
    }
    for i, a, b in rows:
        d, n, c = _pyref(a, b)
        assert got[i] == (d, n, c), (i, got[i], (d, n, c))


def test_unroll_switch_plan_shape(spark):
    """dim <= cap -> one flat unrolled chain (no `aggregate(` HOF in
    the plan); dim > cap -> HOF (no 300-term chain)."""
    df = spark.createDataFrame([(list(range(8)),)], ["v"]).withColumn(
        "w", F.col("v")
    )

    def plan_of(dim):
        out = df.select(dot("v", "w", dim).alias("d"))
        return out._jdf.queryExecution().analyzed().toString()

    small = plan_of(8)
    assert "aggregate(" not in small and "zip_with" not in small

    big = plan_of(UNROLL_MAX_DIM + 1)
    assert "aggregate(" in big and "zip_with" in big


def test_random_projection_hof_above_cap(spark):
    """random_projection at 1024-d input must take the HOF form (no
    1024-term unrolled chain) and still match the python left fold
    bit-for-bit (x * ±1.0 is IEEE-exact)."""
    from cs6300_vectordbs_spark.functions.vector import (
        projection_signs,
        random_projection,
    )

    in_dim, out_dim = 1024, 4
    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(in_dim)]) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        r.id: [r[f"rp{j}"] for j in range(out_dim)]
        for r in df.select(
            "id", *random_projection("v", in_dim, out_dim)
        ).collect()
    }
    signs = projection_signs(in_dim, out_dim, "rp")
    scale = float(in_dim) ** 0.5
    for i, v in rows:
        for j in range(out_dim):
            acc = 0.0
            for x, s in zip(v, signs[j]):
                acc += x * float(s)
            assert got[i][j] == acc / scale, (i, j)


def test_hof_and_unrolled_bit_identical_at_cap_boundary(spark):
    """The switch must be invisible in values: at the cap dim, force
    both forms and compare bit-for-bit."""
    dim = 96
    rng = random.Random(1)
    rows = [
        ([rng.uniform(-1, 1) for _ in range(dim)],
         [rng.uniform(-1, 1) for _ in range(dim)])
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    both = df.select(
        cosine_sim("a", "b", dim).alias("unrolled"),
        cosine_sim("a", "b", None).alias("hof"),
    ).collect()
    for r in both:
        assert r.unrolled == r.hof
