"""Plan audit: print a physical-plan summary (node list, PushedFilters,
ReadSchema) for selected queries, and fail if a scale smell appears:

- a parquet scan with no pruned ReadSchema on a query that projects,
- a CartesianProduct / BroadcastNestedLoopJoin outside the known-small
  brute-force similarity baselines,
- a Window with an empty partition spec over a non-aggregated input.

Usage: python tools/explain_audit.py [query ...]  (default: headline set)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lithops_dataframe_spark.plans import QUERIES
from lithops_dataframe_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_revenue_by_nation",
    "q06_forecast_revenue",
    "q19_brand_quantity_bands",
    "q02_min_cost_supplier",
    "q08_market_share",
    "q09_product_type_profit",
    "q16_supplier_part_counts",
    "q18_large_volume_customers",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_pairs",
    "sim_cosine_topk_lsh",
    "sim_cosine_topk_ivf",
    "kmeans_cells",
    "text_quality_by_source",
    "text_hashed_tfidf",
    "pipeline_clean_corpus",
    "stream_session_windows",
    "rollup_continuous_aggregate",
    "sql_cte_window_topn",
    "split_stratified_rebalance",
    "win_percent_cume",
    "red_stats_moments",
    "dedup_fuzzy_levenshtein_pairs",
    "chunk_documents_overlap",
    "decontaminate_ngram_overlap",
    "sample_k_per_stratum",
    "text_repetition_filter",
    "text_zipf_slope",
    "pack_training_sequences",
    "emb_int8_quantize",
    "frame_describe_approx",
    # round-4 additions
    "join_asof_global_market_mark",
    "mm_codec_jpeg_roundtrip",
    "agg_winsorized_stats",
    "sample_temperature_weights",
    "mm_phash_neardup",
    "join_types_combined",
    "win_ranking_combined",
    "scalar_funcs_combined",
    "io_schema_evolution",
    # round-3 additions
    "mm_codec_probe",
    "mm_codec_pixel_stats",
    "decontaminate_bloom_prefilter",
    "sketch_cms_token_freq",
    "sketch_hll_union_by_type",
    "text_bigram_lm_quality",
    "bpe_top_pairs",
    "text_pii_redaction",
    "events_retention_cohorts",
    "events_sessionize_gap",
    "text_bm25_search",
    "scd2_customer_dim",
    "dq_constraint_suite",
    "emb_pq_encode",
    "io_zorder_roundtrip",
    "sql_recursive_cte",
    "pyds_synthetic_source",
    "scalar_variant_props",
    "sim_adc_topk_pq",
    "sim_ivfpq_topk",
    "events_ewma_user_value",
    "graph_triangle_count",
    # round-5 additions
    "bpe_encode_token_stats",
    "udf_grouped_ols_trend",
    "graph_pagerank",
    "io_merge_upsert_partitioned",
    "stream_view_click_left_outer",
    # round-6 additions
    "join_asof_nearest_mark",
    "emb_semantic_dedup_keep",
    "classifier_lr_score_corpus",
    "dedup_incremental_batch",
    "events_gapfill_interpolate",
    "stream_enriched_segment_windows",
    "events_lttb_downsample",
    "sample_systematic_weighted",
    "stream_merge_upsert_sink",
    "q07_nation_volume",  # r6 plan change: nation filter below the facts
    # (q22 already in the TPC-H block above; its r6 anti-join retune is
    # audited there)
    # round-6 continuation additions (classifier_lr_kfold and
    # stream_counter_agg are omitted: their builders run eager training
    # collects / an actual availableNow stream at construction time, and
    # their plan atoms — LR aggregates, applyInPandasWithState — are
    # audited via classifier_lr_train and the other streaming entries)
    "dedup_duplicate_spans",
    "events_markov_transitions",
    "graph_label_propagation",
    "events_time_weighted_avg",
    "events_counter_agg",
    "cf_part_cooccurrence_lift",
    "text_distinctive_terms_odds",
    "dq_key_skew_report",
    "emb_matryoshka_recall",
    "pack_concat_chunks",
    "join_scd2_pointintime",
    # round-6 continuation, third batch
    "emb_binary_quantize_recall",
    "emb_hard_negative_mining",
    "decontaminate_semantic",
    "events_ohlc_bars",
    "dq_profile_drift",
    "stat_spearman_trend",
    "dedup_chunk_keep_first",
    "eval_calibration_bins",
    "dq_k_anonymity_cells",
    "events_winsorize_stats",
    "retrieval_mmr_rerank",
    "stream_window_topk_users",
    "dq_snapshot_diff",
    "stat_chi2_independence",
    "io_dpp_prune",
    "events_decayed_value",
    "split_temporal_cv_manifest",
    "sample_hash_per_group",
    "events_ab_assignment",
    "dedup_ensemble_agreement",
    "pack_length_buckets",
    "stream_view_click_full_outer",
    "bpe_fertility_by_lang",
    "cf_negative_sampling",
    "events_coverage_report",
    "eval_auc_by_source",
    "retrieval_rbo_lex_vs_sem",
    "io_csv_corrupt_audit",
    "scd_late_arriving_dim",
    "feat_quantile_normalize",
    "text_corpus_datasheet",
    "emb_table_audit",
    "join_asof_tolerance_attribution",
]

# Builders that run Spark jobs at CONSTRUCTION time (verified by
# tools/detect_eager.py, kept exact by tests/test_explain_audit_cover.py):
# training loops that collect model-sized state per epoch, streaming
# queries that drive a real availableNow stream to completion, io/layout
# queries that write their fixture tables first, and pyds registrations
# that materialize. The ``--lazy-all`` battery mode audits every OTHER
# registered query, so a new lazily-built query cannot land unaudited;
# eager builders' plan atoms (LR aggregates, applyInPandasWithState,
# sink writes) are audited through their lazy registry twins in HEADLINE.
EAGER_BUILDERS: set[str] = set()  # populated below by _load_eager()


def _load_eager() -> None:
    """EAGER_BUILDERS lives in a data file so the detection tool and the
    coverage test share one source of truth."""
    path = os.path.join(os.path.dirname(__file__), "eager_builders.txt")
    if os.path.exists(path):
        for line in open(path):
            line = line.split("#", 1)[0].strip()
            if line:
                EAGER_BUILDERS.add(line)


_load_eager()

# brute-force baselines are intentionally quadratic at small input;
# join_types_combined's cross piece is region (constant 5 rows) ×
# DISTINCT(c_mktsegment) (enum-bounded ≤5 rows) — a cross join of two
# frames bounded by construction, the one legitimate cross-join shape.
ALLOW_NESTED_LOOP = {
    "sim_cosine_neardup_exact",
    "sim_cosine_topk_bruteforce",
    "sim_knn_label_vote",
    "join_types_combined",
    # the deliberate SURVEY §2.3 cross-join query: 5-row region frame ×
    # bounded segment frame, cross by definition
    "join_cross_region_segment",
    # hybrid fusion's semantic leg is the documented brute_force_topk
    # baseline: 4-row query frame (vec_id IN literal set) broadcast
    # against the corpus scan — bounded by the fixed query-set literal;
    # the 100 TB serving path swaps in ann_topk (see the docstring)
    "retrieval_hybrid_rrf",
    # both rankings are the documented brute_force_topk baseline: the
    # 5-row query frame (vec_id < literal) broadcast against the corpus
    # scan; the 100 TB path is ann_topk, exactly as for the hybrid leg
    "emb_matryoshka_recall",
    # r6 third batch: every entry below broadcasts a BOUNDED query/anchor
    # frame against a single corpus scan (the documented brute-force
    # baseline; the 100 TB serving path is ann_topk / banded LSH):
    # packed 5-query Hamming scorer + the full-precision top-k leg
    "emb_binary_quantize_recall",
    # 5-anchor frame, label-mismatch filtered before scoring
    "emb_hard_negative_mining",
    # bounded held-out benchmark set, short-circuiting semi/anti passes
    "decontaminate_semantic",
    # 3-anchor top-20 pools; the pair matrix is k²-bounded per anchor
    "retrieval_mmr_rerank",
    # 4-row literal fold table cross-joined onto one fact scan
    "split_temporal_cv_manifest",
    # composes the exact embedding near-dup baseline (documented small-Q
    # shape); the text side is the banded-LSH postings join
    "dedup_ensemble_agreement",
    # both legs are the bounded-query brute-force baselines (BM25 query
    # literals + cosine broadcast anchors), as for retrieval_hybrid_rrf
    "retrieval_rbo_lex_vs_sem",
    # r8: composes _hybrid_rrf_frame, so it inherits exactly hybrid's
    # bounded 4-row query × corpus-scan semantic leg; every join the
    # re-rank stage ADDS is a broadcast-hash equi-join driven by the
    # ≤(queries × 10)-row candidate set
    "retrieval_rerank_features",
}

# Queries whose BroadcastNestedLoopJoin build side is ONE ROW by
# construction — a constant frame (LSH hyperplanes, k-means centroids,
# both driver-local createDataFrame frames) or a global scalar aggregate
# (compare-to-average/total patterns, corpus-size factor). 1 row × N is a
# linear pass with a constant build side — benign at any scale. Allowed
# only when the plan also shows the one-row provenance (checked below).
ALLOW_ONE_ROW_BROADCAST = {
    "sim_cosine_topk_lsh",
    "sim_cosine_neardup_lsh",
    # composes cosine_near_dup_pairs(use_lsh=True): same one-row
    # hyperplane frame broadcast as sim_cosine_neardup_lsh
    "emb_semantic_dedup_keep",
    "sim_cosine_topk_ivf",
    "kmeans_cells",
    "text_hashed_tfidf",
    "pipeline_clean_corpus",
    "q11_important_parts",
    "q15_top_supplier",
    "q22_global_sales_opportunity",
    # vocab size / merged-sketch ride as one-row broadcast frames
    "text_bigram_lm_quality",
    "sketch_hll_union_by_type",
    # corpus stats (N, avgdl) / per-subspace centroid matrices are
    # one-row broadcast frames
    "text_bm25_search",
    "emb_pq_encode",
    # codebook / coarse-centroid / ADC-table frames and the final
    # scalar-count crossJoins are one-row broadcasts
    "sim_adc_topk_pq",
    "sim_ivfpq_topk",
    "graph_triangle_count",
    # the GK-sketch answers ride as a one-row no-key aggregate broadcast
    # into the rank-window predicate gate (round-3 tolerance oracle)
    "frame_describe_approx",
    # round-4 --all sweep: crossJoins of single-row global aggregates —
    # csv_roundtrip combines the kwarg-tail agg with the skiprows-leg agg;
    # the axis-0 reduction singles stitch per-column scalar aggregates
    "csv_roundtrip",
    "red_all_any",
    "red_prod",
    "red_stats_combined",
    # theta sketches + exact counts are single-row global aggregates
    # crossJoined into the one gate row
    "sketch_theta_overlap_estimate",
    # the __all__ row joins two one-row global aggregates on a literal
    # key, which Catalyst folds to a one-row BNLJ
    "rollup_sketch_hll_daily",
    # 30-day generated date spine × (<=2)-type distinct frame: bounded by
    # construction (time_bucket_gapfill analog), never data-sized
    "events_gapfill_daily",
    # r6 continuation: total-basket count / grand-token-total /
    # (n_keys, n_rows) stat frames are single-row grouping-free
    # aggregates crossJoined into the scored tables — the
    # compare-to-total pattern, Keys: [] provenance checked below
    "cf_part_cooccurrence_lift",
    "text_distinctive_terms_odds",
    "dq_key_skew_report",
    # same generated 30-day spine, broadcast into the per-user cross join
    "events_gapfill_interpolate",
    # r6 third batch: the grand-total (n) frame is a single-row
    # grouping-free aggregate crossJoined onto the domain-bounded cell
    # table — the compare-to-total pattern, Keys: [] provenance checked
    "stat_chi2_independence",
    # max-partkey frame is a single-row grouping-free aggregate
    # crossJoined into the candidate generator — same pattern
    "cf_negative_sampling",
    # corpus stats (N, avgdl) ride as the BM25 one-row broadcast, same as
    # text_bm25_search / retrieval_hybrid_rrf
    "retrieval_rbo_lex_vs_sem",
    # r9 capstone: the total-weight frame (Σ⌊√n_u⌋ over sources) is a
    # single-row grouping-free aggregate crossJoined onto the
    # sources-sized quota table — the compare-to-total pattern,
    # Keys: [] provenance checked below
    "pipeline_traindata_manifest",
}


def bnlj_is_one_row_planes(plan: str) -> bool:
    """True if the plan's BroadcastNestedLoopJoin broadcasts a
    literal-bounded frame: a driver-local constant (LocalTableScan /
    Scan ExistingRDD), a global aggregate (formatted plans print
    ``Keys: []`` for the grouping-free HashAggregate feeding the
    BroadcastExchange), or a generated sequence (``Range`` — its bounds
    are plan-time literals, e.g. the 30-row gapfill date spine)."""
    return plan.count("BroadcastNestedLoopJoin") > 0 and (
        "LocalTableScan" in plan
        or "Scan ExistingRDD" in plan
        or "Keys: []" in plan
        or ") Range" in plan
    )


def plan_string(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    args = sys.argv[1:]
    if args == ["--all"]:
        # every registered query: ~6 min at sf0.1 because some builders do
        # eager work (training collects, sink writes) while constructing
        # the frame; plan inspection itself is free
        names = sorted(QUERIES)
    elif args == ["--lazy-all"]:
        # the per-round battery mode (VERDICT r6 task 8): every query
        # whose builder is lazy — plan construction is free, so this
        # audits the whole registry minus the documented eager list in
        # seconds-per-plan, and a new query lands audited by default
        names = [n for n in sorted(QUERIES) if n not in EAGER_BUILDERS]
        missing = EAGER_BUILDERS - set(QUERIES)
        if missing:
            print(f"!! eager_builders.txt names unknown queries: {sorted(missing)}")
            sys.exit(1)
        print(
            f"lazy-all: auditing {len(names)} of {len(QUERIES)} registered "
            f"({len(EAGER_BUILDERS)} documented-eager skipped)"
        )
    else:
        names = args or HEADLINE
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("explain-audit")
    bad = 0
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = plan_string(spark, df)
        print("=" * 30, name)
        for line in plan.splitlines():
            if re.match(r"^\(\d+\)", line) or "PushedFilters" in line or "ReadSchema" in line:
                print("  " + line.strip()[:150])
        if "CartesianProduct" in plan and name not in ALLOW_NESTED_LOOP:
            print(f"!! {name}: CartesianProduct in plan")
            bad += 1
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_NESTED_LOOP:
            if name in ALLOW_ONE_ROW_BROADCAST and bnlj_is_one_row_planes(plan):
                print(f"   {name}: BNLJ = one-row planes broadcast (allowed)")
            else:
                print(f"!! {name}: BroadcastNestedLoopJoin in plan")
                bad += 1
    print(f"\naudited {len(names)} plans, {bad} scale smells")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
