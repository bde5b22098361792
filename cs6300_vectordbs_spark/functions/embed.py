"""Deterministic text embedding — the verified stand-in for V1.

The reference embeds with sentence-transformers/all-MiniLM-L6-v2
(/root/reference/src/chroma.py:76, /root/reference/src/db.py:129-130,
query side /root/reference/src/pineconeDB.py:124). A neural model is
neither available in this environment nor oracle-able, so verified
paths use a seeded hash-projection embedder: dimension j of the vector
is a uniform value in [-1, 1] derived from md5("e{j}|" + text). Same
text → same vector, in ANY engine with md5() — the DuckDB twin is
  list_transform(range(dim), j ->
    (('0x' || substr(md5('e' || j || '|' || text), 1, 15))::BIGINT
     % 2000001) / 1000000.0 - 1.0)

Plan shape at scale: ``dim`` md5 calls per row, all inside whole-stage
codegen, embarrassingly parallel, no shuffle. A real model plugs in via
``embed_text_model`` (mapInPandas, Arrow batches, per-executor model
cache) — same schema, not used in verified paths.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .vector import UNROLL_MAX_DIM, ColumnOrName, _col

DEFAULT_DIM = 16
_MOD = 2000001  # odd modulus → values in [-1, 1] with step 1e-6


def embed_text(text: ColumnOrName, dim: int = DEFAULT_DIM) -> Column:
    """array<double> hash-projection embedding of ``text`` (see module
    docstring for the exact, engine-portable definition).

    Above ``UNROLL_MAX_DIM`` the per-dimension expressions fold into
    ONE ``transform(sequence(0, dim-1), ...)`` higher-order call
    instead of a dim-wide array constructor: at 384-d the unrolled
    form is a ~2300-node expression tree that blows Janino's 64 KB
    method limit (compile-fail-retry, seconds per query — the same
    cliff vector.py documents). Element values are bit-identical:
    ``concat('e', cast(j as string), '|', text)`` produces the exact
    same md5 input as the f-string literal."""
    t = _col(text)
    if dim > UNROLL_MAX_DIM:
        def elem(j: Column) -> Column:
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("e"), j.cast("string"), F.lit("|"), t
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            return (h % _MOD) / F.lit(1000000.0) - 1.0

        return F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), elem)
    comps = []
    for j in range(dim):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"e{j}|"), t)), 1, 15), 16, 10
        ).cast("bigint")
        comps.append((h % _MOD) / F.lit(1000000.0) - 1.0)
    return F.array(*comps)


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Reference V1 batch shape: corpus in, corpus + embedding out."""
    return df.withColumn(out_col, embed_text(text_col, dim))


def embed_text_model(
    df: DataFrame,
    encode_fn: Callable[[list[str]], "list[list[float]]"],
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """Pluggable real-model embedding stage (NOT in verified paths).

    ``encode_fn(texts) -> vectors`` runs on executors via mapInPandas —
    Arrow-batched, one model instance per worker process (initialize it
    lazily inside ``encode_fn`` with a module/closure cache). This is
    the Spark shape of the reference's per-100-row batch encode loop
    (/root/reference/src/db.py:115-135).
    """
    import pandas as pd

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, `{out_col}` array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = encode_fn(list(pdf[text_col]))
            yield pdf

    return df.mapInPandas(run, schema=schema)
