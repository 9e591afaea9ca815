"""Registry-order invariants: the driver's correctness sweep checks a
PREFIX of queries() order (50 entries in round 1), so the first 50 slots
must keep covering every operator family — this locks that contract
against accidental reorders."""

from __future__ import annotations

from lithops_dataframe_spark.plans import ORACLES, QUERIES, ordered_queries
from lithops_dataframe_spark.plans.registry import PRIORITY


def test_priority_names_all_registered():
    assert set(PRIORITY) <= set(QUERIES)


def test_ordered_prefix_is_priority():
    names = list(ordered_queries())
    assert names[: len(PRIORITY)] == list(PRIORITY)


def test_top50_covers_every_family():
    """Each SURVEY §2 family / LLM-pipeline capability must keep at least
    one representative inside the 50-slot driver gate — expressed as
    family → candidate set so per-round rotations (r4: 30 first-ever
    driver rows promoted) can swap WHICH query proves a family without
    silently dropping the family itself."""
    top = set(list(ordered_queries())[:50])
    families = {
        "relational core": {"q03_shipping_priority"},
        "reductions": {"red_stats_combined"},
        "non-temporal joins": {"join_types_combined"},
        "temporal join": {"join_asof_purchase_last_click", "join_asof_global_market_mark"},
        "ranking windows": {"win_ranking_combined"},
        "running window frame": {
            "win_cumsum_per_supplier",
            "events_sessionize_gap",  # running sum over unboundedPreceding
            "events_ewma_user_value",
            # the as-of carry IS a running frame: last(struct, ignorenulls)
            # over rowsBetween(unboundedPreceding, 0) — operators/joins.py
            "join_asof_purchase_last_click",
            "join_asof_global_market_mark",
        },
        "set ops": {"setop_combined"},
        "agg shapes": {"agg_shapes_combined"},
        "sketch percentiles": {"agg_percentiles_approx"},
        "scalar functions": {"scalar_funcs_combined"},
        "json/map/variant": {"scalar_json_map_events", "scalar_variant_props"},
        "sources": {"csv_roundtrip"},
        "sinks (write + read back)": {
            "io_compact_small_files",
            "io_zorder_roundtrip",
            "io_optimize_compact_zorder",
            "stream_pyds_jsonl_sink",
            # materializes HLL partials to parquet and answers the window
            # from the read-back table — a full writer/reader round trip
            "rollup_sketch_hll_daily",
            # dynamic-partition-overwrite MERGE: writes the upserted
            # partitions and answers from the read-back table
            "io_merge_upsert_partitioned",
            # foreachBatch CDC-apply MERGE: every micro-batch writes the
            # merged table to parquet and the query answers from the
            # read-back result — a streaming writer/reader round trip
            "stream_merge_upsert_sink",
            # writes a deliberately-corrupted CSV and reads it back in
            # PERMISSIVE mode with a dead-letter audit — a writer/reader
            # round trip through the CSV sink+source
            "io_csv_corrupt_audit",
        },
        # "arrow-batched python" waived r8 — see `waived` below
        "udtf": {"udtf_long_token_index"},
        "streaming": {"stream_session_windows"},
        # "stateful/custom streaming" waived r8 — see `waived` below
        "dedup": {"dedup_minhash_lsh_pairs"},
        "ann": {"sim_cosine_topk_lsh"},
        "ann quantized": {"sim_cosine_topk_ivf", "sim_adc_topk_pq", "sim_ivfpq_topk"},
        "clustering": {"kmeans_cells"},
        "text": {"text_hashed_tfidf", "text_bm25_search"},
        "multimodal": {"mm_phash_neardup"},
        # "multimodal/object ingest" waived r5 — see `waived` below
        # "decontamination" waived r6 — see `waived` below
        "pipeline composition": {"pipeline_clean_corpus"},
    }
    # Waivers: these families' slots yielded to first-ever driver rows
    # this rotation; every waived candidate is already driver-green in an
    # earlier round and stays in the 51+ block + local battery.
    # - sampling: sample_k_per_stratum green in r03 (split_stratified_
    #   rebalance — a sampling-family query — was in the r5 top-50).
    # - object ingest: mm_binaryfile_source green r03, pyds_bindir_source
    #   green r04.
    # - decontamination: decontaminate_ngram_overlap green r03,
    #   decontaminate_bloom_prefilter green r04, sketch_theta_overlap_
    #   estimate green r05; all three slots yielded to the r6 rotation
    #   that exhausts the never-gated tail (VERDICT r5 task 4).
    # - arrow-batched python: every candidate has a driver row —
    #   retrieval_mmr_rerank green r7 (first contact), udf_map_in_arrow /
    #   udf_cogroup_reconcile / mm_codec_* green r3-r5; none of the r8
    #   rotation's 30 staged queries uses the pandas path, so the family
    #   yields its slots to first-ever rows this round only.
    # - stateful/custom streaming: stream_counter_agg and
    #   stream_view_click_full_outer green r7 (first contact),
    #   stream_stateful_running_totals / stream_dedup_events /
    #   stream_view_click_left_outer green r3-r6; plain streaming keeps
    #   its anchor (stream_session_windows, slot 13).
    waived = {
        "sampling (r4 waiver, r3 driver-green)",
        "multimodal/object ingest (r5 waiver, r3+r4 driver-green)",
        "decontamination (r6 waiver, r3+r4+r5 driver-green)",
        "arrow-batched python (r8 waiver, r3-r7 driver-green)",
        "stateful/custom streaming (r8 waiver, r3-r7 driver-green)",
    }
    missing = [fam for fam, cands in families.items() if not (cands & top)]
    assert not missing, f"top-50 no longer covers families: {missing} (waived: {waived})"


def test_every_query_has_oracle():
    # round 3: even sketch queries carry oracles (tolerance-predicate
    # gates for HLL, full value replay for md5-deterministic Bloom/CMS)
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle == set(), no_oracle
