"""As-of join, connected components / dedup clusters, KMV sketch."""

import datetime as dt

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.asof import asof_join
from cs6300_vectordbs_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from cs6300_vectordbs_spark.operators.sketch import kmv_distinct

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _asof(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lv string")
    right = spark.createDataFrame(
        right_rows, "k long, ts timestamp, rid long, rv double"
    )
    return asof_join(
        left, right, on="k", right_cols=["rid", "rv"], tie_cols=["rid"], **kw
    )


# ---- as-of join -----------------------------------------------------------

def test_asof_backward_picks_latest_at_or_before(spark):
    out = _asof(
        spark,
        [(1, _m(10), "a"), (1, _m(30), "b")],
        [(1, _m(0), 100, 1.0), (1, _m(20), 200, 2.0), (1, _m(40), 300, 3.0)],
    ).collect()
    by_lv = {r.lv: r for r in out}
    assert by_lv["a"].rid_matched == 100
    assert by_lv["b"].rid_matched == 200  # not 300 (it's in the future)


def test_asof_equal_timestamp_is_inclusive(spark):
    out = _asof(
        spark, [(1, _m(5), "a")], [(1, _m(5), 7, 1.5)]
    ).collect()
    assert out[0].rid_matched == 7 and out[0].rv_matched == 1.5


def test_asof_no_prior_row_yields_null(spark):
    out = _asof(
        spark, [(1, _m(5), "a"), (2, _m(5), "b")], [(1, _m(6), 9, 1.0)]
    ).collect()
    assert all(r.rid_matched is None and r.rv_matched is None for r in out)


def test_asof_tie_on_ts_picks_max_tiebreak(spark):
    out = _asof(
        spark,
        [(1, _m(10), "a")],
        [(1, _m(3), 5, 1.0), (1, _m(3), 8, 2.0)],
    ).collect()
    assert out[0].rid_matched == 8  # last in (ts, rid) order wins


def test_asof_tolerance_nulls_stale_match(spark):
    out = _asof(
        spark,
        [(1, _m(10), "near"), (1, _m(120), "far")],
        [(1, _m(0), 1, 1.0)],
        tolerance_us=30 * 60_000_000,
    ).collect()
    by_lv = {r.lv: r for r in out}
    assert by_lv["near"].rid_matched == 1
    assert by_lv["far"].rid_matched is None


def test_asof_matched_fields_come_from_same_row(spark):
    # rv NULL on the latest right row must NOT fall back to an older rv
    out = _asof(
        spark,
        [(1, _m(10), "a")],
        [(1, _m(1), 1, 9.9), (1, _m(5), 2, None)],
    ).collect()
    assert out[0].rid_matched == 2 and out[0].rv_matched is None


# ---- connected components -------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cc_chain_converges_to_min(spark):
    cc = connected_components(_edges(spark, [(4, 3), (2, 3), (1, 2)]))
    got = {r.node: r.component for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_multiple_components(spark):
    cc = connected_components(
        _edges(spark, [(1, 2), (5, 6), (6, 7), (10, 10)])
    )
    got = {r.node: r.component for r in cc.collect()}
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5, 10: 10}


def test_dedup_clusters_canonical_is_min_id(spark):
    pairs = spark.createDataFrame(
        [(20, 30), (30, 10), (50, 60)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 50: 50, 60: 50}


# ---- KMV sketch -----------------------------------------------------------

def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row.est_distinct == 100.0
    assert row.exact_distinct == 100
    assert row.rel_err == 0.0


def test_kmv_estimate_within_tolerance(spark):
    # 20k distinct, k=256 -> std err ~ 1/sqrt(k-1) ~ 6.3%; allow 4 sigma
    df = spark.range(20_000).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row.exact_distinct == 20_000
    assert abs(row.est_distinct - 20_000) / 20_000 < 0.25


def test_kmv_duplicates_do_not_inflate(spark):
    base = spark.range(500).select((F.col("id") % 50).alias("v"))
    row = kmv_distinct(base, "v", k=256).collect()[0]
    assert row.est_distinct == 50.0 and row.exact_distinct == 50


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    """CMS overestimate-only property on every key, and with width >>
    distinct keys the estimate is exact (no collisions possible to
    force, but the 150-key space in 4096 buckets collides rarely —
    assert exactness for at least 90% of keys)."""
    from cs6300_vectordbs_spark.io import read_events
    from cs6300_vectordbs_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )
    from tests.conftest import SF_DIR

    ev = read_events(spark, SF_DIR)
    cms = cms_build(ev, "user_id", depth=4, width=4096)
    tru = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(cms, tru.select("user_id"), "user_id",
                       depth=4, width=4096)
    rows = tru.join(est, on="user_id").collect()
    assert len(rows) > 0
    assert all(r.cms_estimate >= r.n for r in rows)
    exact = sum(1 for r in rows if r.cms_estimate == r.n)
    assert exact / len(rows) >= 0.9


class TestBloomPrefilter:
    def test_no_false_negatives_and_fp_regime(self, spark):
        from cs6300_vectordbs_spark.operators.sketch import (
            bloom_build_bits,
            bloom_hit,
            bloom_mask_words,
        )

        build = spark.createDataFrame(
            [(f"k{i}",) for i in range(400)], "fp string"
        )
        bits = bloom_build_bits(build, "fp", 512, 3)  # dense: FPs likely
        mask = bloom_mask_words(bits, 512)
        probe = spark.createDataFrame(
            [(f"k{i}",) for i in range(1000)], "fp string"
        )
        out = {
            r.fp: r.hit
            for r in probe.withColumn(
                "hit", bloom_hit("fp", mask, 512, 3)
            ).collect()
        }
        # contract: NO false negatives, ever
        assert all(out[f"k{i}"] for i in range(400))
        # dense 512-bit filter over 400 keys: false positives expected
        n_fp = sum(1 for i in range(400, 1000) if out[f"k{i}"])
        assert 0 < n_fp < 600

    def test_mask_words_pack(self):
        from cs6300_vectordbs_spark.operators.sketch import (
            bloom_mask_words,
        )

        words = bloom_mask_words([0, 31, 32, 95], 128)
        assert words == [(1 << 0) | (1 << 31), 1, 1 << 31, 0]

    def test_probe_plan_is_map_only(self, spark):
        from cs6300_vectordbs_spark.operators.sketch import bloom_hit

        df = spark.createDataFrame([("a",)], "fp string")
        plan = (
            df.withColumn("hit", bloom_hit("fp", [0] * 128))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "Join" not in plan

    def test_bit_arithmetic_matches_python_reference(self, spark):
        """Dense mask with high-bit words (≥ 2^31) — the zone where
        double-division truncation would misround; DIV cannot."""
        import hashlib

        from cs6300_vectordbs_spark.operators.sketch import bloom_hit

        m, k = 4096, 3
        # adversarial mask: every word has the top bit set
        words = [((i * 2654435761) % (1 << 32)) | (1 << 31) for i in range(m // 32)]
        keys = [f"x{i}" for i in range(200)]

        def pos(key, i):
            h = hashlib.md5(f"bloom{i}|{key}".encode()).hexdigest()
            return int(h[:15], 16) % m

        def ref_hit(key):
            return all(
                (words[pos(key, i) // 32] >> (pos(key, i) % 32)) & 1
                for i in range(k)
            )

        df = spark.createDataFrame([(s,) for s in keys], "fp string")
        got = {
            r.fp: r.hit
            for r in df.withColumn("hit", bloom_hit("fp", words, m, k)).collect()
        }
        assert got == {s: ref_hit(s) for s in keys}
