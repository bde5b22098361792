"""One-call similarity search with automatic physical-strategy dispatch.

The reference exposes exactly one search call and lets the store pick
the physical plan (`collection.query(...)`, /root/reference/src/
chroma.py:95-100 — HNSW under the hood). This facade is the engine's
equivalent "the library does the planning" entry point (SURVEY.md §4.3
item 2): the caller says WHAT (corpus, queries, k, optional filter);
the facade picks HOW from corpus/query row counts:

  exact    JVM codegen plan (operators/similarity.similarity_topk):
           broadcast query batch, norms factored under the join,
           WindowGroupLimit top-k. Best while |corpus| x |queries|
           stays in a single-stage flop budget.
  blocked  Arrow/numpy kernel (similarity_topk_blocked), bit-identical
           output: per-partition BLAS local top-k, one merge window.
           Takes over when the pair count makes JVM expression
           evaluation the bottleneck but the query batch still fits
           in a broadcast.
  grid     both-sides-sharded kernel (similarity_topk_grid), exact,
           no driver-held query matrix — the only correct choice when
           the QUERY side is itself corpus-sized (kNN-graph builds),
           where a broadcast/collect of queries is the thing that
           dies at 100x.
  ivf      approximate cell-probed search (operators/ann.ivf_topk)
           when the exact pair count is out of budget: scans only
           n_probe/n_cells of the corpus, exact re-rank inside probed
           cells. (The IVF probe join broadcasts the query batch, so
           the huge-corpus x huge-queries corner instead falls back
           to grid — exact and slower, but correct; callers who need
           ANN at that shape pick the persisted-IVF/LSH paths
           explicitly.)

Counts come from caller hints when available (``corpus_count`` /
``query_count`` — a serving tier knows its index size) and are
measured with ``.count()`` otherwise; on parquet sources that is a
row-group-metadata scan, not a data read.

Every strategy returns the same (query_id, rank, <corpus_id>, sim,
dist) schema, and the three exact strategies are BIT-identical (same
IEEE fold order, same (sim desc, id asc) total order) — asserted in
tests/test_plans.py — so dispatch never changes answers, only plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dispatch thresholds (tests/test_plans.py pins these semantics):
# EXACT_MAX_PAIRS    largest |corpus| x |queries| for the pure-JVM plan
#                    (~64-dim double dots; 5e7 pairs is seconds).
# BLOCKED_MAX_PAIRS  largest exact pair count worth brute-forcing at
#                    BLAS speed before switching to an ANN index.
# BROADCAST_MAX_QUERIES  largest query batch we will collect/broadcast
#                    (exact + blocked both hold the batch per executor;
#                    1e5 x 64 doubles ~ 50 MB).
EXACT_MAX_PAIRS = 50_000_000
BLOCKED_MAX_PAIRS = 5_000_000_000
BROADCAST_MAX_QUERIES = 100_000


def choose_strategy(corpus_count: int, query_count: int) -> str:
    """Pure dispatch rule: counts -> 'exact' | 'blocked' | 'grid' | 'ivf'."""
    pairs = corpus_count * query_count
    if query_count > BROADCAST_MAX_QUERIES:
        # Query side too big to hold per-executor: shard both sides.
        return "grid"
    if pairs <= EXACT_MAX_PAIRS:
        return "exact"
    if pairs <= BLOCKED_MAX_PAIRS:
        return "blocked"
    return "ivf"


def search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    dim: int,
    strategy: str = "auto",
    corpus_count: int | None = None,
    query_count: int | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    filter_expr: Column | str | None = None,
    exclude_self: bool = False,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k cosine search; the engine picks the physical strategy.

    ``strategy`` forces a specific plan ('exact' | 'blocked' | 'grid' |
    'ivf'); 'auto' applies :func:`choose_strategy` to the (hinted or
    measured) row counts. ``filter_expr`` applies to the corpus BEFORE
    dispatch — pre-join, pushed into the scan, and for 'ivf' before
    the index build, so every strategy searches the same filtered
    corpus (the reference stores' `where=` surface, SURVEY V6).
    """
    from .ann import ivf_topk
    from .similarity import (
        similarity_topk,
        similarity_topk_blocked,
        similarity_topk_grid,
    )

    # Serving boundary quarantine: a NULL vector can never score (the
    # kernels would NULL-propagate or crash; even DuckDB's
    # list_inner_product refuses one). Skipping here keeps every
    # strategy consistent; corpus_null_audit is how a pipeline measures
    # how many rows this drops.
    c = corpus.filter(F.col(corpus_vec).isNotNull())
    q_in = queries.filter(F.col(query_vec).isNotNull())
    if filter_expr is not None:
        c = c.filter(filter_expr)
    if strategy == "auto":
        nc = corpus_count if corpus_count is not None else c.count()
        nq = query_count if query_count is not None else q_in.count()
        strategy = choose_strategy(nc, nq)

    common = dict(
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        query_id=query_id, query_vec=query_vec,
        exclude_self=exclude_self,
    )
    if strategy == "exact":
        return similarity_topk(c, q_in, k, dim=dim, **common)
    if strategy == "blocked":
        return similarity_topk_blocked(c, q_in, k, **common)
    if strategy == "grid":
        return similarity_topk_grid(c, q_in, k, **common)
    if strategy == "ivf":
        out = ivf_topk(
            c, q_in, k, dim=dim, n_cells=n_cells, n_probe=n_probe, **common
        )
        return out
    raise ValueError(f"unknown search strategy: {strategy!r}")
