"""Vector math as pure Catalyst column expressions.

The reference delegates cosine distance to ChromaDB's HNSW
(``hnsw:space: cosine``, /root/reference/src/chroma.py:77) and to
Pinecone's ``metric="cosine"`` (/root/reference/src/pineconeDB.py:89).
Here the scalar math is spelled out as column expressions so it runs
JVM-side — no Python UDF in the hot path, which is the difference
between scanning 100 TB at memory bandwidth vs at pickle bandwidth.

Two formulations, selected by the optional ``dim`` argument:

- ``dim=None``: ``zip_with``/``aggregate`` higher-order functions.
  Works for any length, but Spark evaluates HOF lambdas interpreted
  (outside whole-stage codegen) — measured ~2.3x slower than the
  unrolled form on the all-pairs workload.
- ``dim=N`` (the embedding dimension is almost always known): the sum
  is statically unrolled into ``a[0]*b[0] + a[1]*b[1] + ...`` which
  codegens into a flat arithmetic chain. Summation remains sequential
  left-to-right, so results are BIT-IDENTICAL to the HOF form and to
  DuckDB's ``list_dot_product`` (both left-fold from 0.0; ``0.0 + x ==
  x`` in IEEE double for every x, including -0.0 whose sign flip is
  unobservable through subsequent additions).

Unrolling is capped at ``UNROLL_MAX_DIM``: above it, ``dim=N`` calls
silently take the HOF form instead. Measured on this host (r05): the
unrolled chain is the win at 64-d on all-pairs workloads (whole-stage
codegen, py4j-construction collapse), but at 1024-d one cosine blows
Janino's 64 KB method limit — codegen throws, Spark retries
interpreted, and the query pays ~40 s of compile-and-fail for a 0.4 s
job; at 384-d it still compiles but burns ~6 s of parse+codegen per
query. Since the two forms are bit-identical, the switch is purely a
physical-plan choice — oracles and results are unaffected.

All math is done in DOUBLE regardless of the storage type (testdata
stores float32 arrays) so results are bit-comparable with the DuckDB
oracle, which also computes in double.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

# Above this dimension, dim=N calls use the HOF form (see module
# docstring: Janino 64 KB method cliff at 1024-d, multi-second codegen
# at 384-d; bit-identical results either way). 256 is the highest dim
# where a full cosine (dot + two norms in one projection) still
# compiles fast on the probe workload.
UNROLL_MAX_DIM = 256


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double(v: ColumnOrName) -> Column:
    """Cast array<float> -> array<double> element-wise."""
    return F.transform(_col(v), lambda x: x.cast("double"))


def dot(a: ColumnOrName, b: ColumnOrName, dim: int | None = None) -> Column:
    """Dot product of two equal-length numeric arrays (double).

    Sequential left-to-right summation in both forms, matching the
    oracle's evaluation order. Pass ``dim`` to unroll (codegen-friendly).

    When both operands are plain column NAMES the unrolled form is
    emitted as ONE ``F.expr`` SQL string: composing 64-dim expressions
    out of py4j Column objects costs thousands of driver round-trips
    (measured: 6.4 s of the 9.5 s ivf_topk wall was DataFrame
    CONSTRUCTION, not execution); one parsed string is milliseconds.
    The parsed tree is identical — same casts, same left-assoc adds.
    """
    if dim is not None and dim > UNROLL_MAX_DIM:
        dim = None  # HOF form — bit-identical, codegen-safe (module doc)
    if dim is not None:
        if isinstance(a, str) and isinstance(b, str):
            return F.expr(
                " + ".join(
                    f"(CAST(`{a}`[{i}] AS DOUBLE) * CAST(`{b}`[{i}] AS DOUBLE))"
                    for i in range(dim)
                )
            )
        ca, cb = _col(a), _col(b)
        return reduce(
            Column.__add__,
            [ca[i].cast("double") * cb[i].cast("double") for i in range(dim)],
        )
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(v: ColumnOrName, dim: int | None = None) -> Column:
    """Euclidean norm of a numeric array (double)."""
    if dim is not None and dim > UNROLL_MAX_DIM:
        dim = None  # HOF form — bit-identical, codegen-safe (module doc)
    if dim is not None:
        if isinstance(v, str):
            return F.sqrt(
                F.expr(
                    " + ".join(
                        f"(CAST(`{v}`[{i}] AS DOUBLE) * CAST(`{v}`[{i}] AS DOUBLE))"
                        for i in range(dim)
                    )
                )
            )
        cv = _col(v)
        sq = reduce(
            Column.__add__,
            [
                cv[i].cast("double") * cv[i].cast("double")
                for i in range(dim)
            ],
        )
        return F.sqrt(sq)
    dv = as_double(v)
    sq = F.aggregate(dv, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def l2_normalize(v: ColumnOrName, dim: int | None = None) -> Column:
    """Unit-normalize an array<double>; zero vectors pass through as-is.

    Normalized-L2 distance relates to cosine as ``cos = 1 - d^2/2`` —
    the bridge used by the LSH approximate path (operators/ann.py).

    The norm is BOUND once per row before the element transform (via a
    single-element array the outer transform's lambda variable
    captures): embedding the norm subtree directly in the per-element
    lambda would re-evaluate the whole sqrt-of-sum fold for every
    element — HOF lambdas run interpreted with no cross-invocation
    CSE, turning an O(dim) projection into O(dim^2) per row.
    """
    dv = as_double(v)
    n = l2_norm(v, dim)
    normalized = F.element_at(
        F.transform(
            F.array(n),
            lambda nn: F.transform(dv, lambda x: x / nn),
        ),
        1,
    )
    return F.when(n == 0.0, dv).otherwise(normalized)


def cosine_sim(
    a: ColumnOrName, b: ColumnOrName, dim: int | None = None
) -> Column:
    """Cosine similarity in [-1, 1]; 0.0 if either vector has zero norm.

    Reference orientation notes (SURVEY.md §2 V3): Chroma reports cosine
    *distance* (lower = better); Pinecone reports *similarity* (higher =
    better) that the reference stores in a field named ``distance``
    (/root/reference/src/queries.py:91-100). This engine exposes both
    orientations explicitly: cosine_sim and cosine_dist.
    """
    denom = l2_norm(a, dim) * l2_norm(b, dim)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b, dim) / denom)


def cosine_dist(
    a: ColumnOrName, b: ColumnOrName, dim: int | None = None
) -> Column:
    """Cosine distance = 1 - cosine similarity (Chroma's orientation)."""
    return F.lit(1.0) - cosine_sim(a, b, dim)


def cosine_from_parts(
    dot_col: Column, norm_a: Column, norm_b: Column
) -> Column:
    """Cosine from a precomputed dot and per-side norms.

    The scale-critical factorization: in any join-shaped workload the
    norms depend on ONE side each, so computing them under the join
    (once per ROW) instead of in the joined projection (once per PAIR)
    turns 3 array passes per pair into 1. Bit-identical to cosine_sim:
    same ``norm_a * norm_b`` product, same division, same zero guard.
    """
    denom = norm_a * norm_b
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_col / denom)


def projection_signs(in_dim: int, out_dim: int, tag: str = "rp") -> list[list[int]]:
    """Deterministic ±1 sign matrix for sparse random projection
    (Achlioptas-style), derived from md5 so every engine — and the SQL
    oracle — can reproduce it without sharing RNG state. Entry (j, i)
    is +1 when the first hex nibble of md5("{tag}|{j}|{i}") is even.

    Computed DRIVER-SIDE with hashlib and embedded as plan literals:
    the matrix is out_dim x in_dim (~1k ints), so baking it into the
    expression costs nothing, while hashing per-row in the engine
    would redo the same in_dim x out_dim digests for every vector.
    """
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{tag}|{j}|{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    vec: str, in_dim: int, out_dim: int, *, tag: str = "rp"
) -> list[Column]:
    """Johnson-Lindenstrauss sign projection of an array column:
    out[j] = sum_i v[i] * sign(j, i) / sqrt(in_dim).

    Returns ``out_dim`` Columns (one per output dimension), each a
    single codegen'd F.expr — a pure map-side pass with no shuffle, no
    UDF, no per-row hashing: THE way to cheapen downstream ANN /
    clustering at 100 TB (project once, index the short vectors).
    ``vec`` must be a plain column name.
    """
    signs = projection_signs(in_dim, out_dim, tag)
    scale = float(in_dim) ** 0.5
    cols = []
    for j in range(out_dim):
        if in_dim > UNROLL_MAX_DIM:
            # HOF fold above the unroll cap (the vector-kernel rule):
            # x * +/-1.0 is IEEE-exact and the left fold order matches
            # the unrolled chain, so values are bit-identical while the
            # expression stays Janino-safe at 1024-d inputs.
            sign_arr = ", ".join(f"{float(s)!r}D" for s in signs[j])
            expr = (
                "aggregate(zip_with(`%s`, array(%s), (x, y) ->"
                " CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
                % (vec, sign_arr)
            )
        else:
            expr = " + ".join(
                f"({'' if signs[j][i] > 0 else '- '}CAST(`{vec}`[{i}] AS DOUBLE))"
                for i in range(in_dim)
            )
        cols.append((F.expr(expr) / F.lit(scale)).alias(f"rp{j}"))
    return cols
