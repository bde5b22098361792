"""Shared content-addressed invalidation for the persisted indexes
(text_index.py BM25, dedup_index.py MinHash bands; vector_index.py
carries a vector-typed variant of the same scheme).

One fingerprint definition means one invalidation behavior across the
index family: ``corpus count + sum of per-row hashes`` of the identity
columns, plus the BUILD PARAMETERS — an index built with different
parameters (band count, bucket count, BM25 k1/b) must never be served
to a caller expecting the new ones, even over an unchanged corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_fingerprint(
    df: DataFrame, cols: list[str], params: dict | None = None
) -> str:
    """count:hashsum[:k=v,...] over the identity columns + parameters."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash(*[F.col(c) for c in cols]).cast("bigint")).alias("chk"),
    ).collect()[0]
    fp = f"{row['n']}:{row['chk']}"
    if params:
        fp += ":" + ",".join(f"{k}={params[k]}" for k in sorted(params))
    return fp


def read_fingerprint(path: str) -> str | None:
    try:
        with open(f"{path}/FINGERPRINT", "r", encoding="utf-8") as f:
            return f.read().strip()
    except OSError:
        return None


def write_fingerprint(path: str, fp: str) -> None:
    with open(f"{path}/FINGERPRINT", "w", encoding="utf-8") as f:
        f.write(fp)
