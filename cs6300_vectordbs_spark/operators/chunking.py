"""Document chunking — the RAG / pre-training preprocessing step.

Long documents are split into overlapping fixed-size token windows
before embedding or training (context windows are finite; retrieval
granularity wants passage-sized units). This is the op that feeds
``embed_text`` / the ANN index in an end-to-end corpus pipeline.

Scale shape: pure per-row expression work — split once, explode one
small ``sequence()`` of chunk starts per document (``ceil(n/stride)``
elements, NOT per-token), then ``slice``+``concat_ws`` per chunk. All
codegen (split/slice/concat_ws are regular expressions, not
interpreted HOF lambdas); no shuffle at all — a 100 TB corpus chunks
at parquet-scan speed with perfect partition parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into ``chunk_tokens``-token windows starting
    every ``stride = chunk_tokens - overlap`` tokens (consecutive
    chunks share ``overlap`` tokens; the final chunk may be shorter).

    Returns (id_col, chunk_idx, chunk_text, n_chunk_tokens) with
    0-based ``chunk_idx``. Empty documents yield no chunks — an
    embedding stage has nothing to consume from them.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... while start < n_tokens
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    ex = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    ).filter(F.col("__start") < F.col("__n"))
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
    )
