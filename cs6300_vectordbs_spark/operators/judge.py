"""Relevance judging — deterministic stand-in for the reference's LLM
judge, plus the reference's response-parsing/clamping/thresholding
pipeline as column expressions.

Reference U2 (/root/reference/src/queries.py:147-248): per (query, hit)
it POSTs to Ollama, parses "Score:"/"Explanation:" lines (F4,
src/queries.py:193-208), clamps to [1, 5] (F3, src/queries.py:202-204),
defaults to 3.0 on parse failure (src/queries.py:194), and thresholds
is_relevant = score >= 4.0 (F2, src/queries.py:25-29).

The LLM call itself is pluggable (see llm_judge_scores for the
mapInPandas shape); verified paths use the deterministic judges below.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import ColumnOrName, _col

RELEVANCE_THRESHOLD = 4.0  # /root/reference/src/queries.py:29
DEFAULT_SCORE = 3.0  # parse-failure fallback, src/queries.py:194


def clamp_score(score: ColumnOrName) -> Column:
    """F3: max(1.0, min(5.0, score))."""
    return F.greatest(F.lit(1.0), F.least(F.lit(5.0), _col(score).cast("double")))


def is_relevant(score: ColumnOrName, threshold: float = RELEVANCE_THRESHOLD) -> Column:
    """F2: 1 if score >= threshold else 0."""
    return F.when(_col(score) >= threshold, F.lit(1)).otherwise(F.lit(0))


def parse_judge_response(resp: ColumnOrName) -> Column:
    """F4: extract 'Score: <float>' with 3.0 fallback, clamp to [1,5].

    Returns a struct (score double, explanation string).
    """
    r = _col(resp)
    raw = F.regexp_extract(r, r"Score:\s*([0-9.]+)", 1)
    # regexp_extract yields '' on no match; ''.try_cast -> null -> 3.0.
    # (try_cast is a Column method, not an F-level function.)
    score = clamp_score(F.coalesce(raw.try_cast("double"), F.lit(DEFAULT_SCORE)))
    expl = F.regexp_extract(r, r"Explanation:\s*(.*)", 1)
    return F.struct(score.alias("score"), expl.alias("explanation"))


def sim_judge_score(
    sim: ColumnOrName, scale: float = 4.0, bias: float = 1.0
) -> Column:
    """Deterministic judge: map cosine similarity onto the 1-5 rubric
    linearly (default: sim=1 -> 5, sim<=0 -> 1), clamped. Pure
    expression, so it is oracle-testable — the stand-in for the LLM
    judge in every verified path. ``scale``/``bias`` recalibrate the
    mapping for embedding families whose working similarity range is
    narrower than [0, 1] (e.g. hash-projection embeddings)."""
    return clamp_score(F.lit(bias) + scale * _col(sim))


def label_judge(query_label: ColumnOrName, hit_label: ColumnOrName) -> Column:
    """Deterministic binary judge when ground-truth class labels exist
    (the testdata embeddings table has one): relevant iff labels match."""
    return F.when(_col(query_label) == _col(hit_label), F.lit(1)).otherwise(F.lit(0))


def llm_judge_scores(
    results: DataFrame,
    judge_fn: Callable[[str, str], str],
    query_col: str = "query",
    doc_col: str = "document",
) -> DataFrame:
    """Pluggable external-judge stage — the Spark shape of reference U2.

    ``judge_fn(query, doc) -> response_text`` is called from executors
    via mapInPandas (Arrow batches); Spark task parallelism replaces the
    reference's ThreadPoolExecutor(10). Responses run through
    parse_judge_response. NOT used in verified paths (nondeterministic
    unless judge_fn is); provided for API completeness.
    """
    import pandas as pd

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in results.schema.fields
    )
    out_schema += ", judge_response string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["judge_response"] = [
                judge_fn(q, d) for q, d in zip(pdf[query_col], pdf[doc_col])
            ]
            yield pdf

    judged = results.mapInPandas(run, schema=out_schema)
    parsed = parse_judge_response(F.col("judge_response"))
    return judged.withColumn("relevancy_score", parsed["score"]).withColumn(
        "is_relevant", is_relevant(F.col("relevancy_score"))
    )
