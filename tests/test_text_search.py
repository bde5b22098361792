"""BM25 retrieval vs an independent pure-Python reference."""

import math

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.text_search import bm25_topk

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat"),
    (3, "quantum entanglement of photons"),
    (4, "the cat and the dog and the mat"),
    (5, "photons scatter off the mat"),
]
QUERIES = [(100, "cat mat"), (101, "quantum photons"), (102, "the")]
K1, B = 1.2, 0.75


def _ref_bm25(k=3):
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, q in QUERIES:
        scores = {}
        for term in set(q.split()):
            if term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf == 0:
                    continue
                denom = tf + K1 * (1 - B + B * len(t) / avgdl)
                scores[d] = scores.get(d, 0.0) + idf * tf * (K1 + 1) / denom
        ranked = sorted(
            ((round(s, 9), d) for d, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        out[qid] = [(r + 1, d, s) for r, (s, d) in enumerate(ranked)]
    return out


def test_bm25_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = {}
    for r in bm25_topk(docs, qs, k=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    want = _ref_bm25(k=3)
    assert set(got) == set(want)
    for qid in want:
        got[qid].sort()
        assert [(rk, d) for rk, d, _ in got[qid]] == [
            (rk, d) for rk, d, _ in want[qid]
        ], qid
        for (_, _, s_got), (_, _, s_want) in zip(got[qid], want[qid]):
            assert abs(s_got - s_want) < 1e-8


def test_bm25_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "quantum mat")], "query_id long, query string")
    top = bm25_topk(docs, qs, k=1).collect()[0]
    assert top.doc_id == 3  # 'quantum' (df=1) dominates 'mat' (df=3)


def test_bm25_max_df_ratio_drops_stop_terms(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "the")], "query_id long, query string")
    assert bm25_topk(docs, qs, k=5).count() > 0
    assert bm25_topk(docs, qs, k=5, max_df_ratio=0.5).count() == 0


def test_rrf_fuse_prefers_doc_ranked_well_in_both(spark):
    from cs6300_vectordbs_spark.operators.text_search import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank long"
    )
    vec = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)], "query_id long, doc_id long, rank long"
    )
    got = rrf_fuse([lex, vec], k=4).collect()
    order = [r.doc_id for r in sorted(got, key=lambda r: r.rank)]
    # 11: 1/62+1/61 > 10: 1/61+1/63 > singles 12 (1/63) vs 13 (1/62)
    assert order == [11, 10, 13, 12]
    top = next(r for r in got if r.doc_id == 11)
    assert abs(top.rrf_score - (1 / 62 + 1 / 61)) < 1e-15
