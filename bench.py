"""Benchmark harness (reference U3 — timing instrumentation).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count() on the final plan, which
materializes every operator but moves at most a scalar to the driver).
A warm-up count on each base table removes first-touch JVM/IO noise
from per-query numbers, mirroring the reference's measure-after-load
loop (/root/reference/src/chroma.py:95-102).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: every expensive path plus one of each family.
BENCH_QUERIES = [
    "topk_cosine_exact",
    "cosine_pairs",
    "embedding_neardup",
    "srp_lsh_topk",
    "ivf_topk",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_buckets",
    "doc_stats",
    "embed_documents",
    "hash_sample",
    "latency_percentiles",
    "judge_scores",
    "events_hourly",
    "events_hourly_stream",
    "user_sessions",
    "pricing_summary",
    "top_customers",
    "pipeline_report",
]

# Round-2 extension operators — benched separately so the original
# 20-query total stays comparable to the recorded BASELINE.md numbers.
EXTENDED_QUERIES = [
    "auto_ann_topk",
    "user_sessions_stream",
    "asof_purchase_view",
    "clicks_before_error",
    "dedup_clusters",
    "clean_corpus",
    "kmv_distinct",
    "stratified_sample",
    "image_features",
    "frame_samples",
    "salted_event_stats",
    "recall_at_k",
    "ndcg_at_k",
    "upsert_latest",
    "bm25_topk",
    "hybrid_topk",
    "repetition_stats",
    "redact_pii",
    "heavy_hitters",
    "gap_fill_hourly",
    "revenue_by_nation",
    "shipping_priority",
    "market_share",
    "sq8_topk",
    "token_counts",
    "rolling_events",
    "label_centroids",
    "events_dedup_stream",
    "funnel",
    "hourly_anomalies",
    "order_priority",
    "dormant_customers",
    "sales_rollup",
    "events_sliding",
    "events_sliding_stream",
    "simhash_pairs",
    "pq_topk",
    "quality_deciles",
    "events_enriched",
    "events_enriched_stream",
    "props_stats",
    "above_average_customers",
    "events_pivot",
    "fresh_fingerprints",
    "latency_percentiles_approx",
    "session_windows",
    "forecast_revenue",
    "priority_shipping",
    "ivf_persisted_topk",
    "bm25_pruned_topk",
    "audio_features",
    "revenue_momentum",
    "props_map_stats",
    "bigram_lm",
    "knn_graph_stats",
    "cross_source_dups",
    "cms_user_counts",
    "retention_cohorts",
    "dup_ratio_by_source",
    "hourly_seasonality",
    "funnel_by_segment",
    "event_transitions",
    "latency_percentiles_long",
    "user_first_events",
    "doc_length_histogram",
    "parts_cube",
    "embedding_norm_stats",
    "balanced_sample",
    "blob_metadata",
    "brp_lsh_pairs",
    "chunk_documents",
    "clean_query_lines",
    "clicks_before_error_stream",
    "contamination",
    "ivf_kmeans_topk",
    "latency_percentiles_by_type",
    "latency_summary",
    "recall_per_query",
    "sequential_ids",
    "template_queries",
    "filtered_topk",
    "search_latency",
    "pack_sequences",
    "lm_doc_scores",
    "source_mixture",
    "large_orders",
    "returned_revenue",
    "ivfpq_topk",
    "tfidf_keywords",
    "user_state_history",
    "rp_projection",
    "split_summary",
    "embedding_outliers",
    "best_survivors",
    "chunk_dedup",
    "top_supplier",
    "important_parts",
    "cumulative_users",
    "weighted_sample",
    "dim_stats",
    "ivf_search_stream",
    "bm25_persisted_topk",
    "integrity_report",
    "min_cost_supplier",
    "volume_shipping",
    "product_profit",
    "customer_distribution",
    "promo_revenue",
    "supplier_part_counts",
    "small_qty_revenue",
    "disjunctive_revenue",
    "excess_parts_suppliers",
    "waiting_suppliers",
    "rerank_topk",
    "incremental_dedup",
    "incremental_dedup_stream",
    "discount_revenue",
    "ann_tuning_report",
    "pagerank_knn",
    "scene_changes",
    "bucketed_revenue",
    "ivf_upsert_topk",
    "dedup_threshold_sweep",
    "ivf_cell_stats",
    "dedup_quality_report",
    "passage_topk",
    # round-4 additions
    "csv_ingest",
    "jsonl_ingest",
    "auto_search",
    "embedding_neardup_ivf",
    "jsonl_ingest_stream",
    "lsh_tuning_report",
    "partitioned_events",
    "clean_markup",
    "curation_batches",
    "csv_ingest_checked",
    # round-5 additions
    "search_latency_wallclock",
    "topk_cosine_384d",
    "zordered_events",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from cs6300_vectordbs_spark import get_spark
    from cs6300_vectordbs_spark.io import TABLES, read_events

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up: touch every table once (JIT, page cache, session init).
    for t in TABLES:
        if t == "events":
            read_events(spark, sf_dir).count()
        else:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    qs = entrymod.queries()
    # The curated EXTENDED list keeps a stable, ordered core; anything
    # registered after it was last touched is appended automatically so
    # a new query can never silently escape measurement.
    extended = EXTENDED_QUERIES + sorted(
        n
        for n in qs
        if n not in BENCH_QUERIES and n not in EXTENDED_QUERIES
    )
    from cs6300_vectordbs_spark.operators.dedup import (
        clear_exact_group_cache as clear_memo,
    )

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    rep_detail: dict[str, list[float]] = {}
    variance: dict[str, list[float]] = {}

    # VARIANCE-AWARE HEADLINE PROTOCOL (r09): the committed r08 number
    # was the slowest of three identical-tree runs — host variance
    # (~30%, shared hypervisor) now exceeds every real per-query delta
    # at these absolute times, and min-of-3 back-to-back reps inside
    # ONE run cannot defend against a globally slow session. So the
    # headline set is measured as one COLD pass (session memo cleared
    # per query — the single-query user's cost) followed by THREE full
    # WARM PASSES over the whole set; interleaving queries across
    # passes decorrelates per-query noise that back-to-back reps
    # share. Per query: value = MEDIAN of the warm passes (robust to
    # one bad pass), variance = [min, max] across them (the band a
    # round-over-round comparison must clear before it means
    # anything). Headline totals: sum of medians, plus the band sums.
    _WARM_PASSES = 3

    def _run_once(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        return round(time.time() - t0, 3)

    headline_names = [n for n in BENCH_QUERIES if n in qs]
    for name in BENCH_QUERIES:
        if name not in qs:
            print(f"bench: skipping unknown query {name!r}", file=sys.stderr)
    failed_headline: set[str] = set()
    for name in headline_names:
        try:
            clear_memo()
            cold[name] = _run_once(name)
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            failed_headline.add(name)
    passes: dict[str, list[float]] = {n: [] for n in headline_names}
    for _ in range(_WARM_PASSES):
        for name in headline_names:
            if name in failed_headline:
                continue
            try:
                passes[name].append(_run_once(name))
            except Exception as exc:  # noqa: BLE001
                print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
                timings[name] = -1.0
                failed_headline.add(name)
    for name in headline_names:
        if name in failed_headline:
            continue
        reps = sorted(passes[name])
        timings[name] = reps[len(reps) // 2]  # median of warm passes
        variance[name] = [reps[0], reps[-1]]
        rep_detail[name] = [cold[name]] + passes[name]

    # Extended queries keep min-of-2 (cold rep with the memo cleared,
    # one warm rep): a full multi-pass protocol over 170+ queries
    # would add ~10 min of wall per round for names that are not the
    # bar metric; their per-rep detail stays visible in "reps".
    for name in extended:
        if name not in qs:
            print(f"bench: skipping unknown query {name!r}", file=sys.stderr)
            continue
        rep_times: list[float] = []
        try:
            clear_memo()
            for _ in range(2):
                rep_times.append(_run_once(name))
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        timings[name] = min(rep_times)
        cold[name] = rep_times[0]
        rep_detail[name] = rep_times

    failed = sorted(n for n, t in timings.items() if t < 0)
    # A failed headline query makes the total meaningless — emit null
    # rather than a partial sum that reads as an improvement.
    headline = (
        None
        if any(timings.get(n, -1.0) < 0 for n in BENCH_QUERIES)
        else round(sum(timings.get(n, 0.0) for n in BENCH_QUERIES), 3)
    )
    extended_total = (
        None
        if any(timings.get(n, -1.0) < 0 for n in extended)
        else round(sum(timings.get(n, 0.0) for n in extended), 3)
    )
    # Full per-query detail goes to a file; the printed line carries
    # only the headline block so it fits the driver's output-tail cap.
    # The cold total voids together with the warm one: a query that
    # failed a warm pass has a broken serving path, and summing its
    # cold rep would read as a complete number for a void round.
    headline_cold = (
        None
        if headline is None or any(n not in cold for n in BENCH_QUERIES)
        else round(sum(cold[n] for n in BENCH_QUERIES), 3)
    )
    # The band the headline total moves in across the warm passes:
    # a round-over-round delta inside this band is host noise, not a
    # regression.
    headline_band = (
        None
        if any(n not in variance for n in BENCH_QUERIES)
        else [
            round(sum(variance[n][0] for n in BENCH_QUERIES), 3),
            round(sum(variance[n][1] for n in BENCH_QUERIES), 3),
        ]
    )
    # ESTIMATOR HISTORY (r10): BENCH_r01..r08 were produced by the old
    # protocol ("value" = sum of per-query MIN of 3 back-to-back reps);
    # BENCH_r09 onward uses "value" = sum of per-query MEDIAN of 3 warm
    # passes. Min and median are NOT comparable under the host's 2-3x
    # shared-hypervisor noise, so both estimators are now emitted:
    # "value" stays the median bar, "value_min" (== headline_band[0],
    # the per-query-min sum) is the one comparable to BASELINE.md and
    # every pre-r09 BENCH file. Cross-round comparisons must be
    # min-vs-min (value_min now vs "value" of r08 and earlier, or
    # value_min vs value_min from r10 on) or median-vs-median (r09+).
    value_min = headline_band[0] if headline_band else None
    per_query_min = {
        n: (variance[n][0] if n in variance else timings.get(n))
        for n in BENCH_QUERIES
    }
    detail = {
        "metric": "headline_queries_total_wall",
        "value": headline,
        "value_min": value_min,
        "estimator": "value=median of warm passes; value_min=sum of "
        "per-query minima (the pre-r09 protocol's estimator)",
        "unit": "sec",
        "queries": timings,
        "queries_min": per_query_min,
        # first_rep per query, measured with the session memo cleared:
        # the cold single-query cost. The bar metric ("value") is the
        # per-query MEDIAN over the warm passes — cold is tracked so
        # a cold-path regression can't hide under the warm floor.
        "cold": cold,
        "headline_cold_total": headline_cold,
        # per headline query: [min, max] across the warm passes
        "variance": variance,
        "headline_band": headline_band,
        "warm_passes": _WARM_PASSES,
        "reps": rep_detail,
        "extended_total": extended_total,
        "failed": failed,
        "sf": sf,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
        "w", encoding="utf-8",
    ) as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                # value = the original 20-query set, directly comparable
                # to BASELINE.md's recorded self-baseline; per-query
                # times for ALL queries are in BENCH_DETAIL.json.
                "metric": "headline_queries_total_wall",
                "value": headline,
                # Band floor (sum of per-query warm minima): the
                # estimator comparable to BASELINE.md and BENCH_r01-r08
                # (whose "value" was min-of-reps). See BENCH_DETAIL
                # "estimator" for the protocol history.
                "value_min": value_min,
                "unit": "sec",
                "queries": {n: timings.get(n) for n in BENCH_QUERIES},
                "headline_cold_total": headline_cold,
                "headline_band": headline_band,
                "extended_total": extended_total,
                "failed": failed,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
