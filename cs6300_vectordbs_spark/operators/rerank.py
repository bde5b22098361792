"""Second-stage re-ranking over first-stage retrieval candidates.

The production retrieval pipeline is two-stage: a cheap recall stage
(ANN / BM25, thousands of candidates) followed by an expensive
precision stage (cross-encoder scoring of (query, document) PAIRS,
re-ranked to the final top-k). The reference delegates both stages to
its vector DB (/root/reference/src/chroma.py:77-96); here the rerank
stage is a first-class operator.

Two implementations, same output contract:

- :func:`crossencoder_score` — deterministic hash-based pair score
  (same construction as functions/embed.embed_text: md5-derived
  uniform in [0, 1], portable to any engine with md5()). This is the
  VERIFIED stand-in — pure codegen column expression, exact DuckDB
  twin.
- :func:`rerank_with_model` — the real-model hook: Arrow-batched
  mapInPandas over candidate pairs, one model instance per executor
  (lazy init inside ``score_fn``). Same schema, not in verified paths.

Scale shape: candidates are O(queries x k1) rows — the expensive model
runs on exactly that set, never the corpus; the final top-k per query
compiles to WindowGroupLimit (partial top-k before the exchange).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_MOD = 1000001  # odd modulus -> step-1e-6 uniform in [0, 1]


def crossencoder_score(query_text: Column, doc_text: Column) -> Column:
    """Deterministic pair score in [0, 1]: md5("ce|" + q + "|" + d)
    mapped to a uniform value — the engine-portable cross-encoder
    stand-in. DuckDB twin:
      (('0x' || substr(md5('ce|' || q || '|' || d), 1, 15))::BIGINT
       % 1000001) / 1000000.0
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ce|"), query_text, F.lit("|"), doc_text)),
            1, 15,
        ),
        16, 10,
    ).cast("bigint")
    return (h % _MOD) / F.lit(1000000.0)


def rerank_topk(
    candidates: DataFrame,
    k: int = 3,
    *,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    query_text: str = "query_text",
    doc_text: str = "doc_text",
    score_col: str = "ce_score",
) -> DataFrame:
    """Re-rank candidate pairs by the deterministic cross-encoder
    stand-in; keep the top ``k`` per query (1-based rank). Ties break
    by ascending doc id — a total order, so the output set is exact.
    """
    scored = candidates.withColumn(
        score_col, crossencoder_score(F.col(query_text), F.col(doc_text))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col(score_col).desc(), F.col(doc_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col("rank").cast("bigint").alias("rank"),
            doc_id,
            score_col,
        )
    )


def rerank_with_model(
    candidates: DataFrame,
    score_fn: Callable[[list[str], list[str]], "list[float]"],
    k: int = 3,
    *,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    query_text: str = "query_text",
    doc_text: str = "doc_text",
    score_col: str = "ce_score",
) -> DataFrame:
    """Pluggable real-model rerank (NOT in verified paths).

    ``score_fn(query_texts, doc_texts) -> scores`` runs on executors
    via mapInPandas — Arrow batches of candidate pairs, one model per
    worker process (initialize lazily inside ``score_fn`` with a
    module/closure cache). Output contract matches :func:`rerank_topk`.
    """
    import pandas as pd

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in candidates.schema.fields
    )
    schema = f"{fields}, `{score_col}` double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[score_col] = score_fn(
                list(pdf[query_text]), list(pdf[doc_text])
            )
            yield pdf

    scored = candidates.mapInPandas(run, schema=schema)
    w = Window.partitionBy(query_id).orderBy(
        F.col(score_col).desc(), F.col(doc_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col("rank").cast("bigint").alias("rank"),
            doc_id,
            score_col,
        )
    )
