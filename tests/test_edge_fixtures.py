"""Edge-fixture oracle sweep (VERDICT r7 task 5).

Runs the event / as-of / window / empty-group query families against
their DuckDB oracles on the adversarial micro-fixture from
``tests/edge_fixtures.py`` — single-event users, NULL ts, all-NULL value
columns, exact ts/value ties, rounding-boundary floats, empty groups,
one-row tables. The sf fixtures under-sample these shapes; every ADVICE
finding so far (r6 ×3, r7 ×2) was latent for exactly that reason.
"""

from __future__ import annotations

import duckdb
import pytest

from lithops_dataframe_spark.catalog import TABLES
from lithops_dataframe_spark.plans import ORACLES, QUERIES

from tests.conftest import assert_df_equal
from tests.edge_fixtures import build_edge_dir

# Families whose semantics hinge on the edge shapes. Kept as an explicit
# list (not "everything") so each name is a deliberate claim that the
# query family is edge-exercised; trivially-empty results are caught by
# the nonempty assertion below.
EDGE_SWEEP = [
    # events family
    "events_coverage_report",
    "events_decayed_value",
    "events_counter_agg",
    "events_sessionize_gap",
    "events_gapfill_daily",
    "events_gapfill_interpolate",
    "events_time_weighted_avg",
    "events_ohlc_bars",
    "events_anomaly_mad",
    "events_winsorize_stats",
    "events_markov_transitions",
    "events_lttb_downsample",
    "events_retention_cohorts",
    "events_funnel",
    "events_ewma_user_value",
    "dq_ks_value_drift",
    "dq_profile_drift",
    # as-of family
    "join_asof_purchase_last_click",
    "join_asof_tolerance_attribution",
    "join_asof_nearest_mark",
    "join_asof_global_market_mark",
    # window family
    "win_ranking_combined",
    "win_lag_lead_daily_revenue",
    "win_cumsum_per_supplier",
    "win_first_last_range",
    "win_rolling_avg_user_value",
    "win_percent_cume",
    "win_top3_orders_per_customer",
    "win_rank_dense_ntile",
    # empty-group / one-row-table joins and aggs
    "join_left_outer_order_counts",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_orders",
    "red_stats_combined",
    "agg_shapes_combined",
    # dedup family (edge docs: empty text, exact dup pair, one repeated
    # token, k=1 language groups)
    "dedup_exact_fingerprint",
    "dedup_exact_after_union",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_jaccard_prefix_filter",
    "dedup_containment_pairs",
    "dedup_chunk_keep_first",
    "dedup_duplicate_spans",
    "dedup_simhash_pairs",
    "dedup_incremental_batch",
    "stream_incremental_dedup",
    # text family (empty-text doc must not crash tokenizers or skew
    # ratios differently across engines)
    "text_quality_by_source",
    "text_token_stats",
    "text_zipf_slope",
    "text_fingerprint_stats",
    "text_hashed_tfidf",
    "text_top_tokens",
    "text_corpus_datasheet",
    "text_distinctive_terms_odds",
    "text_repetition_filter",
    # packing / mixing (empty doc spans zero chunks; one-doc sources)
    "pack_concat_chunks",
    "pack_training_sequences",
    "pack_length_buckets",
    "chunk_documents_overlap",
    "mix_interleave_epoch",
    "mix_epoch_schedule",
    "sample_temperature_weights",
    "sample_hash_per_group",
    # round-9 additions: reservoir (zero-weight doc excluded), balanced
    # shards + budget selection (empty-text doc → 1 token of ""),
    # Bradley–Terry (duplicate lineitem rows → duplicate duels, price
    # ties → partkey tiebreak), CUSUM (NULL ts / NULL value excluded)
    "sample_reservoir_weighted",
    "pack_balanced_shards",
    "select_token_budget_greedy",
    "pref_bradley_terry",
    "events_changepoint_cusum",
    "stream_incremental_reservoir",
    "text_ngram_novelty",
    "text_source_token_gini",
    "stream_ks_drift",
    "pipeline_traindata_manifest",
    # dq family on documents
    "dq_key_skew_report",
    "dq_k_anonymity_cells",
    "dq_snapshot_diff",
    # embeddings edge: 4-dim vectors, exact-duplicate + antipodal pair
    "emb_table_audit",
    "emb_int8_quantize",
    # streaming batch twins over the NULL-ts events
    "stream_tumbling_counts",
    "stream_daily_type_revenue",
    "stream_dedup_events",
    "stream_sliding_activity",
    "stream_window_topk_users",
    "stream_enriched_segment_windows",
    "stream_view_click_correlation",
    "stream_view_click_left_outer",
    "stream_view_click_full_outer",
    # pipeline + retrieval over the empty-text doc
    "pipeline_clean_corpus",
    "text_bm25_search",
    "text_langid_confusion",
    "text_pii_redaction",
    # scan-agg TPC-H shapes over the duplicate-row lineitem
    "q01_pricing_summary",
    "q06_forecast_revenue",
    # specialty joins over the one-row/empty-group star
    "join_range_value_bands",
    "join_theta_price_band",
    "join_salted_skew",
    "join_cross_region_segment",
    # grouped UDF stats: k=1 groups stress ddof / zero-variance paths
    "udf_grouped_zscore",
    "udf_grouped_trimmed_mean",
    "udf_grouped_agg_weighted_avg",
    "udf_grouped_ols_trend",
    # frame/reduction surface over all-NULL acctbal + duplicate rows
    "frame_describe",
    "frame_describe_by_group",
    "red_min_axis0",
    "red_max_axis0",
    "red_mean_axis0",
    "red_std_axis0",
    "red_all_any",
    "red_prod",
    "red_sum_axis1",
    "red_max_axis1",
    "red_mean_axis1",
    # agg shapes / setops / scalars / sql singles
    "agg_percentiles",
    "agg_count_distinct",
    "agg_unpivot_melt",
    "agg_rollup_status_priority",
    "agg_cube_flag_status",
    "agg_pivot_status_by_flag",
    "agg_winsorized_stats",
    "setop_union_all_counts",
    "setop_intersect_nations",
    "setop_except_nations",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_array_funcs",
    "scalar_json_events",
    "scalar_map_funcs",
    "sql_grouping_sets",
    "sql_correlated_subquery",
    "sql_cte_window_topn",
    "sql_recursive_cte",
    # remaining TPC-H shapes (most filter to empty on the micro star —
    # still verifies empty-frame parity and that no ANSI crash lurks)
    "q02_min_cost_supplier",
    "q03_shipping_priority",
    "q04_priority_with_late_lines",
    "q05_revenue_by_nation",
    "q07_nation_volume",
    "q08_market_share",
    "q09_product_type_profit",
    "q10_returned_items_topk",
    "q11_important_parts",
    "q12_late_line_priorities",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_brand_quantity_bands",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # batch 4: decontamination / remaining dedup / bpe / sketches /
    # graphs / splits / rollups / scd / eval / classifier / embeddings
    "decontaminate_ngram_overlap",
    "decontaminate_bloom_prefilter",
    "dedup_cdc_chunks",
    "dedup_fuzzy_levenshtein_pairs",
    "dedup_neardup_clusters",
    "bpe_top_pairs",
    "bpe_train_merges",
    "bpe_encode_token_stats",
    "bpe_fertility_by_lang",
    "sketch_cms_token_freq",
    "sketch_hll_union_by_type",
    "sketch_theta_overlap_estimate",
    "sketch_kll_quantiles_by_type",
    "graph_pagerank",
    "graph_label_propagation",
    "graph_triangle_count",
    "split_train_val_test",
    "split_stratified_rebalance",
    "split_temporal_cv_manifest",
    "sample_k_per_stratum",
    "sample_systematic_weighted",
    "select_dsir_importance",
    "events_ab_assignment",
    "feat_quantile_normalize",
    "frame_profile",
    "frame_apply_axis1",
    "frame_map_partitions",
    "frame_describe_approx",
    "red_sum_axis0",
    "red_count_axis0",
    "red_stats_moments",
    "rollup_continuous_aggregate",
    "rollup_sketch_hll_daily",
    "join_full_outer_nation_coverage",
    "join_interval_overlap_windows",
    "join_scd2_pointintime",
    "join_types_combined",
    "scd2_customer_dim",
    "scd_late_arriving_dim",
    "setop_combined",
    "setop_distinct_order_priorities",
    "scalar_funcs_combined",
    "scalar_json_map_events",
    "scalar_variant_props",
    "csv_roundtrip",
    "dq_constraint_suite",
    "agg_percentiles_approx",
    "agg_approx_count_distinct",
    "cf_part_cooccurrence_lift",
    "cf_negative_sampling",
    "eval_classifier_auc",
    "eval_auc_by_source",
    "eval_calibration_bins",
    "eval_rater_agreement",
    "eval_mcnemar_exact",
    "eval_cochran_q",
    "eval_fleiss_kappa",
    "classifier_lr_train",
    "classifier_lr_score_corpus",
    # embedding family on 64-dim edge vectors (duplicate pair, antipodal
    # pair, k=1 label groups, 6-row corpus)
    "emb_pq_encode",
    "emb_semantic_dedup_keep",
    "emb_hard_negative_mining",
    "emb_matryoshka_recall",
    "emb_binary_quantize_recall",
    "sim_cosine_topk_bruteforce",
    "sim_cosine_neardup_exact",
    "sim_cosine_neardup_lsh",
    "sim_cosine_topk_lsh",
    "sim_knn_label_vote",
    "sim_label_centroids",
    "retrieval_hybrid_rrf",
    "retrieval_rerank_features",
    "retrieval_rbo_lex_vs_sem",
    "udtf_long_token_index",
    "udf_map_in_arrow",
    "udf_cogroup_reconcile",
    "text_bigram_lm_quality",
    "stream_session_windows",
    # batch 5 (r9, VERDICT r8 task 5): the final 41 names — the sweep now
    # covers the ENTIRE registry (asserted by test_edge_sweep_covers_whole_
    # registry below), so there is no exclusion list to maintain. Probing
    # these found 6 real defects: stat_spearman_trend (ANSI div-by-zero on
    # an n=1 series), stream_counter_agg (NaN crash on a NULL reading),
    # stream_stateful_running_totals (pandas 0.0 vs SQL NULL sum),
    # stream_merge_upsert_sink (oracle mixed two epochs per-column),
    # io_sinks_roundtrip (empty-sink schema inference), and
    # mm_binaryfile_source (zero-byte objects vanish in binaryFile).
    "classifier_lr_kfold",
    "decontaminate_semantic",
    "dedup_ensemble_agreement",
    "emb_pca_power_iteration",
    "events_seasonal_decompose",
    "io_compact_small_files",
    "io_csv_corrupt_audit",
    "io_dpp_prune",
    "io_merge_upsert_partitioned",
    "io_optimize_compact_zorder",
    "io_schema_evolution",
    "io_sinks_roundtrip",
    "io_zorder_roundtrip",
    "join_bucketed_colocated",
    "kmeans_cells",
    "mm_binaryfile_source",
    "mm_codec_jpeg_roundtrip",
    "mm_codec_pixel_stats",
    "mm_codec_probe",
    "mm_codec_resize_real",
    "mm_codec_wav_stats",
    "mm_decode_media",
    "mm_frame_sample",
    "mm_media_features",
    "mm_phash_neardup",
    "mm_resize_images",
    "mm_wav_spectral_features",
    "pyds_bindir_source",
    "pyds_pushdown_source",
    "pyds_synthetic_source",
    "retrieval_mmr_rerank",
    "sim_adc_topk_pq",
    "sim_cosine_topk_ivf",
    "sim_ivfpq_topk",
    "stat_chi2_independence",
    "stat_spearman_trend",
    "stream_counter_agg",
    "stream_merge_upsert_sink",
    "stream_pyds_counter_source",
    "stream_pyds_jsonl_sink",
    "stream_stateful_running_totals",
]


def test_edge_sweep_covers_whole_registry():
    """EDGE_SWEEP must equal the full registry — no silent exclusions.
    VERDICT r8 task 5 asked for a pinned exclusion list with reasons; the
    r9 probe showed every 'excluded' query actually runs on the fixture
    (and 6 of the 41 carried real defects), so the honest partition is
    'everything', enforced here."""
    assert sorted(EDGE_SWEEP) == sorted(QUERIES), (
        set(QUERIES) ^ set(EDGE_SWEEP)
    )


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory) -> str:
    return build_edge_dir(tmp_path_factory.mktemp("edge"))


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    # threads=1: the micro-fixture is exactly the input size where DuckDB
    # 1.0.0's parallel window operator races tiny partitions into separate
    # hash groups (see tests/conftest.py make_duck for the full account of
    # the r8 battery flake this caused on events_ohlc_bars).
    con.execute("SET threads=1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{edge_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_SWEEP)
def test_edge_matches_oracle(name, spark, edge_dir, edge_duck):
    result = QUERIES[name](spark, edge_dir)
    assert_df_equal(result, edge_duck.sql(ORACLES[name]))


def test_edge_sweep_not_trivially_empty(spark, edge_dir):
    """At least the core event/as-of/window queries must produce rows on
    the micro-fixture — an all-empty sweep would vacuously pass."""
    must_be_nonempty = [
        "events_coverage_report",
        "dq_ks_value_drift",
        "join_asof_purchase_last_click",
        "win_ranking_combined",
        "join_anti_customers_without_orders",
    ]
    for name in must_be_nonempty:
        assert QUERIES[name](spark, edge_dir).count() > 0, name
