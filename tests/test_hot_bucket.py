"""Hot-bucket guard for the LSH dedup family: the exact-duplicate
pre-collapse (dedup._exact_groups) must be INVISIBLE in the output —
collapsed and uncollapsed runs return the identical pair set on
corpora with mega-groups of byte-identical docs, whitespace/case
variants, near-dups, short docs, and empty docs — while the
per-band-bucket cap (max_band_bucket) is a documented, deterministic
truncation.
"""

from __future__ import annotations

import pytest

from cs6300_vectordbs_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


def _pairset(df, score_col):
    return {
        (r.id_a, r.id_b, round(r[score_col], 9)) for r in df.collect()
    }


@pytest.fixture(scope="module")
def boiler(spark):
    """Corpus with a 6-doc exact-dup mega-group (including whitespace
    and case variants that normalize identical), a 3-doc second group,
    two near-dup (not identical) docs, a unique doc, a too-short doc,
    an empty doc, and a whitespace-only doc."""
    banner = "this website uses cookies to improve your experience ok"
    rows = (
        [(i, banner) for i in range(6)]
        + [(6, banner.upper()), (7, "  " + banner.replace(" ", "   ") + " ")]
        + [(10 + i, "the quick brown fox jumps over the lazy dog") for i in range(3)]
        + [
            (20, "the quick brown fox jumps over the sleepy dog"),
            (21, "completely unrelated text about spark query planning"),
            (22, "tiny doc"),
            (23, ""),
            (24, "   \t "),
            # NULL-text docs: md5(NULL) is NULL, and a NULL group key
            # silently falls out of equi-joins — these two pin the
            # sentinel-fingerprint fix (caught by the --nulls tier).
            (25, None),
            (26, None),
        ]
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCollapseEquivalence:
    def test_minhash_identical_pairset(self, boiler):
        on = minhash_lsh_pairs(boiler, min_jaccard=0.3)
        off = minhash_lsh_pairs(boiler, min_jaccard=0.3, collapse_exact=False)
        assert _pairset(on, "est_jaccard") == _pairset(off, "est_jaccard")
        # the 8-member normalized-identical group must be fully paired
        got = _pairset(on, "est_jaccard")
        grp = [0, 1, 2, 3, 4, 5, 6, 7]
        for i in grp:
            for j in grp:
                if i < j:
                    assert (i, j, 1.0) in got

    def test_ngram_identical_pairset(self, boiler):
        on = ngram_jaccard_pairs(boiler, min_jaccard=0.3)
        off = ngram_jaccard_pairs(
            boiler, min_jaccard=0.3, collapse_exact=False
        )
        assert _pairset(on, "jaccard") == _pairset(off, "jaccard")

    def test_simhash_identical_pairset(self, boiler):
        on = simhash_pairs(boiler, max_hamming=3)
        off = simhash_pairs(boiler, max_hamming=3, collapse_exact=False)
        assert _pairset(on, "hamming") == _pairset(off, "hamming")
        # empty + whitespace-only docs fingerprint to 0 and pair at
        # hamming 0 in BOTH modes (they sit in different exact-dup
        # groups — '' vs '   ' normalize identical, actually same
        # group; the invariant asserted is simply set equality above,
        # this pins the fp-0 pair exists at all)
        assert (23, 24, 0) in _pairset(on, "hamming")

    def test_short_docs_never_pair_minhash(self, boiler):
        got = minhash_lsh_pairs(boiler, min_jaccard=0.0).collect()
        ids = {r.id_a for r in got} | {r.id_b for r in got}
        # 'tiny doc' (2 tokens < shingle_n=3) and empty docs produce no
        # signature -> excluded, with or without collapse
        assert 22 not in ids and 23 not in ids and 24 not in ids

    def test_clean_corpus_fast_path(self, spark):
        """No exact dups -> expansion skipped; result matches the
        uncollapsed join trivially (and the plan stays pre-guard)."""
        rows = [
            (i, f"distinct document number {i} about topic {i % 3} words")
            for i in range(20)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        on = minhash_lsh_pairs(docs, min_jaccard=0.0)
        off = minhash_lsh_pairs(docs, min_jaccard=0.0, collapse_exact=False)
        assert _pairset(on, "est_jaccard") == _pairset(off, "est_jaccard")


class TestBandBucketCap:
    def test_cap_truncates_flooded_bucket(self, spark):
        """With collapse OFF and m identical docs, every band bucket
        holds all m; cap=3 keeps the 3 smallest ids -> C(3,2) pairs."""
        rows = [(i, "identical boilerplate text repeated many words here") for i in range(10)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = minhash_lsh_pairs(
            docs, min_jaccard=0.3, collapse_exact=False, max_band_bucket=3
        ).collect()
        assert {(r.id_a, r.id_b) for r in got} == {(0, 1), (0, 2), (1, 2)}

    def test_cap_subset_of_uncapped(self, spark):
        rows = [
            (i, "shared template header words " + ("alpha" if i % 2 else "beta"))
            for i in range(12)
        ] + [(100 + i, f"noise document {i} unrelated content entirely") for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        capped = _pairset(
            minhash_lsh_pairs(
                docs, min_jaccard=0.0, collapse_exact=False, max_band_bucket=4
            ),
            "est_jaccard",
        )
        full = _pairset(
            minhash_lsh_pairs(docs, min_jaccard=0.0, collapse_exact=False),
            "est_jaccard",
        )
        assert capped <= full

    def test_exact_dups_bypass_cap(self, spark):
        """Collapse ON + cap: exact-dup pairs come from the equi-join
        expansion, never the banded join, so the cap cannot drop them."""
        rows = [(i, "identical boilerplate text repeated many words here") for i in range(8)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = minhash_lsh_pairs(
            docs, min_jaccard=0.3, max_band_bucket=1
        ).collect()
        assert len(got) == 8 * 7 // 2
        assert all(r.est_jaccard == 1.0 for r in got)

    def test_simhash_cap(self, spark):
        rows = [(i, "identical boilerplate text for simhash banding") for i in range(10)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = simhash_pairs(
            docs, max_hamming=3, collapse_exact=False, max_band_bucket=3
        ).collect()
        assert {(r.id_a, r.id_b) for r in got} == {(0, 1), (0, 2), (1, 2)}


class TestRandomizedEquivalence:
    def test_collapse_invisible_on_random_dup_heavy_corpus(self, spark):
        """Seeded-random corpus engineered for duplicate pressure: few
        distinct base texts, many copies with whitespace/case mutations
        (fingerprint-equal) and word-level mutations (near-dup, NOT
        fingerprint-equal). Collapse on/off must agree for all three
        pair operators — one corpus, one Spark round trip each."""
        import random

        rng = random.Random(61)
        words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        bases = [
            " ".join(rng.choice(words) for _ in range(rng.randrange(3, 9)))
            for _ in range(6)
        ]
        rows = []
        for i in range(120):
            t = rng.choice(bases)
            m = rng.randrange(4)
            if m == 1:      # whitespace/case mutation: same fingerprint
                t = t.upper() if rng.random() < 0.5 else t.replace(" ", "  ")
            elif m == 2:    # word mutation: near-dup, different fingerprint
                toks = t.split()
                toks[rng.randrange(len(toks))] = rng.choice(words)
                t = " ".join(toks)
            elif m == 3 and rng.random() < 0.3:
                t = ""      # occasional empty doc
            rows.append((i, t))
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        from cs6300_vectordbs_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_pairs,
        )

        for fn, kw, col in (
            (minhash_lsh_pairs, {"min_jaccard": 0.3}, "est_jaccard"),
            (ngram_jaccard_pairs, {"min_jaccard": 0.3}, "jaccard"),
            (simhash_pairs, {"max_hamming": 3}, "hamming"),
        ):
            on = _pairset(fn(docs, **kw), col)
            off = _pairset(fn(docs, collapse_exact=False, **kw), col)
            assert on == off, fn.__name__


class TestGroupMemo:
    """The exact-dup collapse is memoized per (corpus plan, id_col,
    text_col) for the session — one guard computation serves the whole
    LSH family and every composite (the r06 headline regression was
    exactly this guard re-run per query)."""

    def test_hit_across_separate_reads_of_same_parquet(self, spark, tmp_path):
        from cs6300_vectordbs_spark.operators.dedup import (
            _GROUP_CACHE,
            _exact_groups,
            clear_exact_group_cache,
        )

        path = str(tmp_path / "docs")
        spark.createDataFrame(
            [(0, "same text here"), (1, "same text here"), (2, "other")],
            "doc_id long, text string",
        ).write.parquet(path)
        clear_exact_group_cache()

        r1 = _exact_groups(
            spark.read.parquet(path), id_col="doc_id", text_col="text"
        )
        assert len(_GROUP_CACHE) == 1
        # a SEPARATE read of the same files must hit (semanticHash of
        # a parquet scan is path-stable) — identical objects back
        r2 = _exact_groups(
            spark.read.parquet(path), id_col="doc_id", text_col="text"
        )
        assert r2[0] is r1[0] and r2[1] is r1[1] and r2[2] is r1[2]
        assert len(_GROUP_CACHE) == 1

        # a semantically DIFFERENT plan (filter) -> miss (a second
        # cache entry), never a false hit; note a no-op full-column
        # select canonicalizes to the same plan and correctly hits
        _exact_groups(
            spark.read.parquet(path).filter("doc_id >= 0"),
            id_col="doc_id",
            text_col="text",
        )
        assert len(_GROUP_CACHE) == 2
        clear_exact_group_cache()
        assert len(_GROUP_CACHE) == 0

    def test_file_mutation_invalidates(self, spark, tmp_path):
        from cs6300_vectordbs_spark.operators.dedup import (
            _exact_groups,
            clear_exact_group_cache,
        )

        path = str(tmp_path / "docs")
        spark.createDataFrame(
            [(0, "aaa bbb"), (1, "aaa bbb")], "doc_id long, text string"
        ).write.parquet(path)
        clear_exact_group_cache()
        m1, _, has1 = _exact_groups(
            spark.read.parquet(path), id_col="doc_id", text_col="text"
        )
        assert has1 and m1.count() == 2

        # rewrite the corpus in place: the (size, mtime_ns) snapshot in
        # the key must miss, and the fresh result must see clean data
        spark.createDataFrame(
            [(0, "aaa bbb"), (1, "ccc ddd")], "doc_id long, text string"
        ).write.mode("overwrite").parquet(path)
        m2, _, has2 = _exact_groups(
            spark.read.parquet(path), id_col="doc_id", text_col="text"
        )
        assert not has2 and m2 is None
        clear_exact_group_cache()

    def test_local_relations_never_false_hit(self, spark):
        from cs6300_vectordbs_spark.operators.dedup import (
            _exact_groups,
            clear_exact_group_cache,
        )

        clear_exact_group_cache()
        a = spark.createDataFrame(
            [(0, "x y z"), (1, "x y z")], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(0, "p q r"), (1, "s t u")], "doc_id long, text string"
        )
        _, _, has_a = _exact_groups(a, id_col="doc_id", text_col="text")
        _, _, has_b = _exact_groups(b, id_col="doc_id", text_col="text")
        assert has_a is True and has_b is False
        clear_exact_group_cache()

    def test_derivative_table_memo_shares_and_isolates(self, spark, tmp_path):
        """The materialized signature/shingle/fingerprint tables are
        memoized per (corpus, operator, parameters): a second query
        over the same parquet reuses the checkpointed table; different
        parameters or a different corpus never collide; results are
        identical to a cold run."""
        from cs6300_vectordbs_spark.operators.dedup import (
            _TABLE_CACHE,
            clear_exact_group_cache,
            minhash_lsh_pairs,
        )

        path = str(tmp_path / "docs")
        spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta"),
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),
            ],
            "doc_id long, text string",
        ).write.parquet(path)
        clear_exact_group_cache()

        cold = _pairset(
            minhash_lsh_pairs(spark.read.parquet(path), min_jaccard=0.3),
            "est_jaccard",
        )
        n_after_cold = len(_TABLE_CACHE)
        assert n_after_cold >= 1
        warm = _pairset(
            minhash_lsh_pairs(spark.read.parquet(path), min_jaccard=0.3),
            "est_jaccard",
        )
        assert warm == cold and len(_TABLE_CACHE) == n_after_cold

        # different parameters -> a distinct cache entry, not a false hit
        minhash_lsh_pairs(
            spark.read.parquet(path), min_jaccard=0.3, num_hashes=8
        ).collect()
        assert len(_TABLE_CACHE) > n_after_cold
        clear_exact_group_cache()
        assert len(_TABLE_CACHE) == 0
