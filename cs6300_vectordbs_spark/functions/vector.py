"""Vector math as pure Catalyst column expressions.

The reference delegates cosine distance to ChromaDB's HNSW
(``hnsw:space: cosine``, /root/reference/src/chroma.py:77) and to
Pinecone's ``metric="cosine"`` (/root/reference/src/pineconeDB.py:89).
Here the scalar math is spelled out with ``zip_with``/``aggregate`` so
it runs JVM-side inside whole-stage codegen — no Python UDF in the hot
path, which is the difference between scanning 100 TB at memory
bandwidth vs at pickle bandwidth.

All math is done in DOUBLE regardless of the storage type (testdata
stores float32 arrays) so results are bit-comparable with the DuckDB
oracle, which also computes in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double(v: ColumnOrName) -> Column:
    """Cast array<float> -> array<double> element-wise."""
    return F.transform(_col(v), lambda x: x.cast("double"))


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two equal-length numeric arrays (double).

    ``aggregate(zip_with(a, b, *), 0.0, +)`` — sequential left-to-right
    summation, matching the oracle's evaluation order.
    """
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(v: ColumnOrName) -> Column:
    """Euclidean norm of a numeric array (double)."""
    dv = as_double(v)
    sq = F.aggregate(dv, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def l2_normalize(v: ColumnOrName) -> Column:
    """Unit-normalize an array<double>; zero vectors pass through as-is.

    Normalized-L2 distance relates to cosine as ``cos = 1 - d^2/2`` —
    the bridge used by the LSH approximate path (operators/ann.py).
    """
    dv = as_double(v)
    n = l2_norm(dv)
    return F.when(n == 0.0, dv).otherwise(F.transform(dv, lambda x: x / n))


def cosine_sim(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity in [-1, 1]; 0.0 if either vector has zero norm.

    Reference orientation notes (SURVEY.md §2 V3): Chroma reports cosine
    *distance* (lower = better); Pinecone reports *similarity* (higher =
    better) that the reference stores in a field named ``distance``
    (/root/reference/src/queries.py:91-100). This engine exposes both
    orientations explicitly: cosine_sim and cosine_dist.
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_dist(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine distance = 1 - cosine similarity (Chroma's orientation)."""
    return F.lit(1.0) - cosine_sim(a, b)
