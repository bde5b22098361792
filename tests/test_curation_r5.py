"""Unit semantics for the round-5 curation additions: Gopher rules,
duplicate-span coverage (Lee et al. exact-substring dedup measure),
and the training-shard manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.curation import shard_manifest
from cs6300_vectordbs_spark.operators.dedup import dup_span_stats
from cs6300_vectordbs_spark.operators.quality import gopher_rules


@pytest.fixture(scope="module")
def docs(spark):
    long_good = "the cat sat on the mat and that dog ran off with it " * 5
    return spark.createDataFrame(
        [
            (1, long_good),                      # passes everything
            (2, "short text only"),              # fails word count
            (3, "### ### " + "the of and that have with be to " * 8),
            (4, ""),                             # empty
            (5, None),                           # NULL text
        ],
        "doc_id long, text string",
    )


class TestGopherRules:
    def test_signals_hand_computed(self, docs):
        rows = {r.doc_id: r for r in gopher_rules(docs).collect()}
        r1 = rows[1]
        assert r1.n_words == 65          # 13 words x 5
        assert r1.pass_word_count and r1.pass_stop and r1.keep
        # mean word length: 39 non-space chars per 13-word repeat
        assert r1.mean_word_len == 3.0
        r2 = rows[2]
        assert r2.n_words == 3 and not r2.pass_word_count and not r2.keep

    def test_symbol_and_alpha_rules(self, docs):
        r3 = {r.doc_id: r for r in gopher_rules(docs).collect()}[3]
        # 6 '#' chars over 66 words -> ratio < 0.1 passes; alpha words
        # exclude the two '###' tokens -> 64/66 > 0.8 still passes.
        assert r3.n_words == 66
        assert r3.symbol_ratio == pytest.approx(6 / 66)
        assert r3.alpha_word_frac == pytest.approx(64 / 66)

    def test_null_and_empty(self, docs):
        rows = {r.doc_id: r for r in gopher_rules(docs).collect()}
        assert rows[4].n_words == 0 and rows[4].keep is False
        # NULL text: NULL n_words / pass_word_count, but the guarded
        # ratios zero-fill (NULL > 0 is NULL -> otherwise branch) and
        # keep collapses to False via three-valued AND — identical in
        # DuckDB (verified on the /tmp/sf_nulls variant), which is the
        # property that matters for the oracle.
        assert rows[5].n_words is None
        assert rows[5].pass_word_count is None
        assert rows[5].mean_word_len == 0.0 and rows[5].stop_hits == 0
        assert rows[5].keep is False


class TestDupSpanStats:
    def test_hand_computed_coverage(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "x x a b c d y"),   # shares span 'a b c d' with doc 1
                (3, "p q r s"),         # unique span, no dups
                (4, "w"),               # too short for n=4
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in dup_span_stats(df, n=4).collect()}
        # doc 1: spans 'a b c d','b c d e','c d e f'; only first dup.
        assert got[1].n_spans == 3 and got[1].n_dup_spans == 1
        assert got[1].covered_tokens == 4
        assert got[1].dup_frac == pytest.approx(4 / 6)
        # doc 2: 4 spans, dup 'a b c d' at pos 2 covers tokens 2-5.
        assert got[2].n_spans == 4 and got[2].n_dup_spans == 1
        assert got[2].covered_tokens == 4
        assert got[2].dup_frac == pytest.approx(4 / 7)
        assert got[3].n_dup_spans == 0 and got[3].covered_tokens == 0
        assert got[4].n_tokens == 1 and got[4].n_spans == 0

    def test_within_doc_repeat_counts(self, spark):
        # Lee et al. semantics: a span repeated inside ONE doc is a dup.
        df = spark.createDataFrame(
            [(1, "a b c d a b c d")], "doc_id long, text string"
        )
        r = dup_span_stats(df, n=4).collect()[0]
        assert r.n_dup_spans == 2          # both 'a b c d' starts
        assert r.covered_tokens == 8       # whole doc covered

    def test_overlapping_spans_union(self, spark):
        # 'a a a a a' in two docs: every span dup; coverage = union.
        df = spark.createDataFrame(
            [(1, "a a a a a"), (2, "a a a a a")], "doc_id long, text string"
        )
        r = {x.doc_id: x for x in dup_span_stats(df, n=4).collect()}[1]
        assert r.n_spans == 2 and r.n_dup_spans == 2
        assert r.covered_tokens == 5 and r.dup_frac == 1.0


class TestShardManifest:
    def test_partition_and_budgets(self, spark):
        df = spark.createDataFrame(
            [(i, "tok " * (i + 1)) for i in range(40)],
            "doc_id long, text string",
        )
        man = shard_manifest(df, n_shards=8).collect()
        assert sum(r.n_docs for r in man) == 40
        assert sum(r.n_tokens for r in man) == sum(range(1, 41))
        for r in man:
            assert 0 <= r.shard < 8
            assert r.min_key <= r.max_key

    def test_deterministic(self, spark):
        df = spark.createDataFrame(
            [(i, "x y z") for i in range(20)], "doc_id long, text string"
        )
        a = sorted(map(tuple, shard_manifest(df, n_shards=4).collect()))
        b = sorted(map(tuple, shard_manifest(df, n_shards=4).collect()))
        assert a == b


class TestSemDedup:
    def test_hand_clusters(self, spark):
        from cs6300_vectordbs_spark.operators.curation import (
            semdedup_survivors,
        )

        # 0/1 near-identical, 2 identical to both (one component),
        # 3 orthogonal singleton, 4 duplicate of 3. n_cells=1 keeps
        # the semantics test about clustering, not cell boundaries
        # (a near-dup pair split across cells is the documented
        # recall trade of the IVF blocking).
        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),
            (2, [1.0, 0.001, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
            (4, [0.0, 1.0, 0.0, 0.0]),
            (5, [0.0, 0.0, 1.0, 0.0]),
        ]
        emb = spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>"
        )
        out = {
            r.vec_id: r
            for r in semdedup_survivors(
                emb, n_cells=1, min_sim=0.95
            ).collect()
        }
        assert out[0].cluster_id == 0 and out[0].is_survivor
        assert out[1].cluster_id == 0 and not out[1].is_survivor
        assert out[2].cluster_id == 0 and not out[2].is_survivor
        assert out[0].cluster_size == 3
        assert out[3].cluster_id == 3 and out[3].is_survivor
        assert out[4].cluster_id == 3 and not out[4].is_survivor
        assert out[5].cluster_size == 1 and out[5].is_survivor
        # survivor count = number of clusters
        assert sum(r.is_survivor for r in out.values()) == 3


class TestBpeTrainMerges:
    def test_hand_merges(self, spark):
        from cs6300_vectordbs_spark.operators.curation import (
            bpe_train_merges,
        )

        # classic Sennrich example shape: 'low' x3, 'lowest' x1.
        docs = spark.createDataFrame(
            [(1, "low low low lowest")], "doc_id long, text string"
        )
        out = bpe_train_merges(docs, n_merges=3).collect()
        assert [r.step for r in out] == [1, 2, 3]
        # round 1: 'l o' and 'o w' tie at 4 -> 'l o' wins (pair ASC)
        assert out[0].pair == "l o" and out[0].merged == "lo"
        assert out[0].cnt == 4
        # round 2: 'lo w' now the argmax at 4
        assert out[1].pair == "lo w" and out[1].merged == "low"
        assert out[1].cnt == 4
        # round 3: within 'lowest' only: 'low e' (1) vs 'e s'/'s t' (1)
        # -> 'e s' wins on pair ASC ordering
        assert out[2].cnt == 1

    def test_merge_applies_everywhere(self, spark):
        from cs6300_vectordbs_spark.operators.curation import (
            bpe_train_merges,
        )

        # 'aaa': spelled 'a a a'; merging 'a a' must be greedy
        # left-to-right non-overlapping -> one occurrence per word.
        docs = spark.createDataFrame(
            [(1, "aaa aaa")], "doc_id long, text string"
        )
        out = bpe_train_merges(docs, n_merges=2).collect()
        assert out[0].pair == "a a" and out[0].cnt == 4
        # after round 1 every 'aaa' is 'aa a'; the only pair left is
        # 'aa a' with weight 2.
        assert out[1].pair == "aa a" and out[1].cnt == 2

    def test_greedy_merge_on_even_runs(self, spark):
        """4+ runs of a repeated symbol: 'aaaa' (spelled 'a a a a')
        must merge to ['aa','aa'], NOT 'aa a a' — the failure mode of
        a delimiter-sharing string replace, where consecutive
        occurrences share the separator space and the scan skips the
        second one. Round 2's argmax pins the round-1 rewrite."""
        from cs6300_vectordbs_spark.operators.curation import (
            bpe_train_merges,
        )

        docs = spark.createDataFrame(
            [(1, "aaaa aaaa")], "doc_id long, text string"
        )
        out = bpe_train_merges(docs, n_merges=2).collect()
        # 3 overlapping (a,a) pairs per word x 2 words
        assert out[0].pair == "a a" and out[0].cnt == 6
        # greedy rewrite -> 'aa aa'; buggy replace -> 'aa a a', whose
        # round-2 argmax would be 'a a' (ties with 'aa a', wins ASC).
        assert out[1].pair == "aa aa" and out[1].cnt == 2

    def test_greedy_merge_on_odd_runs(self, spark):
        """5-run 'aaaaa' -> [aa, aa, a]: the greedy scan takes
        positions 0 and 2, leaving the tail symbol. A fixed-point
        re-replace would produce [aa, a, aa] (same multiset, wrong
        positions) whose round-2 pair stats differ."""
        from cs6300_vectordbs_spark.operators.curation import (
            bpe_train_merges,
        )

        docs = spark.createDataFrame(
            [(1, "aaaaa aaaaa aaaaa")], "doc_id long, text string"
        )
        out = bpe_train_merges(docs, n_merges=2).collect()
        assert out[0].pair == "a a" and out[0].cnt == 12
        # greedy round 2 over 'aa aa a': pairs (aa,aa) x3, (aa,a) x3
        # -> tie broken pair ASC: 'aa a'. The fixed-point rewrite
        # 'aa a aa' would yield (aa,a) and (a,aa) instead.
        assert out[1].pair == "aa a" and out[1].cnt == 3


class TestBpeEncodeStats:
    def test_hand_encoded_counts(self, spark):
        from cs6300_vectordbs_spark.operators.curation import (
            bpe_encode_stats,
        )

        # merges (from TestBpeTrainMerges): 'l o', 'lo w', 'e s'.
        # 'low' -> [low] (1 sym); 'lowest' -> [low, es, t] (3 syms).
        docs = spark.createDataFrame(
            [(1, "low low low lowest")], "doc_id long, text string"
        )
        out = bpe_encode_stats(docs, n_merges=3).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_words == 4
        assert r.n_chars == 3 * 3 + 6
        assert r.n_bpe_tokens == 3 * 1 + 3
        assert abs(r.tokens_per_char - round(6 / 15, 9)) < 1e-12

    def test_single_char_words_survive(self, spark):
        from cs6300_vectordbs_spark.operators.curation import (
            bpe_encode_stats,
        )

        # 1-char words produce no pairs but must still be encoded
        # (1 symbol each), and must not perturb the merge choice.
        docs = spark.createDataFrame(
            [(1, "a a b ab ab")], "doc_id long, text string"
        )
        out = bpe_encode_stats(docs, n_merges=1).collect()[0]
        # merge 1 = 'a b' (wc 2 from the two 'ab's)
        assert out.n_words == 5
        assert out.n_chars == 1 + 1 + 1 + 2 + 2
        # 'a','a','b' stay 1 sym; each 'ab' collapses to 1 sym
        assert out.n_bpe_tokens == 5


class TestTemperatureResample:
    def test_flattens_toward_minority(self, spark):
        from cs6300_vectordbs_spark.operators.sampling import (
            temperature_resample,
        )

        rows = [(i, "en") for i in range(90)] + [
            (i, "fr") for i in range(90, 100)
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = temperature_resample(df).collect()
        rates = {r.lang: r.rate for r in out}
        # p_en=.9, p_fr=.1 -> q ∝ sqrt(p): q_en≈.75, q_fr≈.25.
        # rate_en = q_en/p_en ≈ .833 < 1; rate_fr = min(1, 2.5) = 1.
        assert rates["fr"] == 1.0
        assert 0.8 < rates["en"] < 0.9
        # every fr row survives (rate 1.0 > any u)
        assert sum(1 for r in out if r.lang == "fr") == 10
        # deterministic: same input, same survivors
        again = temperature_resample(df).collect()
        assert sorted(r.doc_id for r in again) == sorted(
            r.doc_id for r in out
        )

    def test_null_group_dropped_and_empty_input(self, spark):
        from cs6300_vectordbs_spark.operators.sampling import (
            temperature_resample,
        )

        df = spark.createDataFrame(
            [(1, "en"), (2, None)], "doc_id long, lang string"
        )
        out = temperature_resample(df).collect()
        assert all(r.lang == "en" for r in out)
        empty = df.limit(0)
        assert temperature_resample(empty).count() == 0
