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


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    *,
    lambda_: float = 0.5,
    query_id: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_col: str = "sim",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified re-rank (Carbonell &
    Goldstein 1998) — the ``mmr`` search type every RAG serving stack
    (and Chroma/pgvector-style stores) offers next to plain top-k.

    Input: per-query candidate rows carrying the stage-1 relevance
    score ``sim_col`` and the candidate vector ``vec_col`` (any first
    stage works: exact, IVF, NSW — the operator only sees its output).
    Greedy selection picks, ``k`` times, the candidate maximizing::

        mmr = lambda * sim(q, d)  -  (1 - lambda) * max_{s in selected} sim(d, s)

    with the redundancy max over the already-selected set (0.0 for the
    first pick) and ties broken by ascending candidate id.  Returns
    (query_id, rank, <id_col>, sim, mmr) — ``rank`` is the 1-based
    selection step, ``mmr`` the score at selection time.

    Determinism across engines: candidate-pair cosines go through the
    shared ``_sims_matrix`` kernel (dimension-sequential IEEE
    accumulation, zero-norm -> 0.0 — the same bit-identity invariant
    every vectorized kernel in this repo pins against DuckDB's
    ``list_dot_product`` left fold), the ``lambda`` arithmetic is two
    IEEE multiplies and a subtract on bit-identical doubles, and max
    is selection, not arithmetic — so the greedy argmax sequence, and
    therefore the full output, value-hash-matches an unrolled k-step
    SQL oracle.

    Scale shape: ONE shuffle keyed by query id (groups are candidate
    lists, O(k1) rows each — broadcast-sized by construction, so no
    group can straggle), then an Arrow-batched per-group kernel doing
    O(k * k1) float work.  The corpus is never touched: diversity
    costs are confined to the candidate set the first stage already
    paid for.
    """
    import pandas as pd

    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_={lambda_} must be in [0, 1]")

    by_name = {f.name: f.dataType.simpleString() for f in candidates.schema.fields}
    schema = (
        f"`{query_id}` {by_name[query_id]}, `rank` bigint, "
        f"`{id_col}` {by_name[id_col]}, `sim` double, `mmr` double"
    )
    lam, one_minus = float(lambda_), 1.0 - float(lambda_)

    def select_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from .similarity import _col_norms, _sims_matrix, _topk_order

        pdf = pdf[pdf[sim_col].notna()]
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {query_id: [], "rank": [], id_col: [], "sim": [], "mmr": []}
            )
        ids = pdf[id_col].to_numpy()
        sims = pdf[sim_col].to_numpy(dtype=np.float64)
        V = np.asarray(list(pdf[vec_col]), dtype=np.float64)
        T = V.T
        P = _sims_matrix(V, T, _col_norms(T))  # (n, n) candidate pairs
        qid = pdf[query_id].iloc[0]

        # Redundancy = max pair-sim vs the SELECTED SET — which may be
        # NEGATIVE (anti-correlated candidates get a diversity BONUS).
        # Only the first pick uses 0.0 (max over the empty set by the
        # paper's convention); clamping later steps at zero would be a
        # different — and weaker — objective.
        red = np.full(n, -np.inf)
        taken = np.zeros(n, dtype=bool)
        out_ids, out_sims, out_mmr = [], [], []
        for step in range(min(k, n)):
            score = lam * sims - one_minus * (
                np.zeros(n) if step == 0 else red
            )
            score = np.where(taken, -np.inf, score)
            # Shared (score desc, id asc) ordering kernel — keeps the
            # repo's NaN-is-greatest convention (a NaN score is out of
            # contract but must never silently sort LAST and vanish).
            pick = int(_topk_order(score, ids)[0])
            taken[pick] = True
            out_ids.append(ids[pick])
            out_sims.append(sims[pick])
            out_mmr.append(score[pick])
            red = np.maximum(red, P[:, pick])
        return pd.DataFrame(
            {
                query_id: [qid] * len(out_ids),
                "rank": np.arange(1, len(out_ids) + 1, dtype=np.int64),
                id_col: out_ids,
                "sim": out_sims,
                "mmr": out_mmr,
            }
        )

    return candidates.groupBy(query_id).applyInPandas(select_group, schema=schema)


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
