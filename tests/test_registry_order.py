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
    top = set(list(ordered_queries())[:50])
    # one representative per SURVEY §2 family / LLM-pipeline capability
    # (round-3 rotation: family anchors kept, singles promoted for their
    # first driver rows — see registry.py PRIORITY comments)
    required = {
        "q03_shipping_priority",  # scan/filter/join/agg/top-k
        "join_types_combined",  # §2.3 non-temporal joins
        "join_asof_purchase_last_click",  # temporal join
        "win_ranking_combined",  # §2.5 ranking/analytic
        "win_cumsum_per_supplier",  # running window frame
        "setop_combined",  # §2.7
        "agg_shapes_combined",  # cube/rollup/pivot
        "agg_percentiles_approx",  # sketch scale path
        "scalar_funcs_combined",  # §2.8 string/date/math/array
        "scalar_json_map_events",  # §2.8 json/map + events canary
        "csv_roundtrip",  # §2.1 sources
        "io_compact_small_files",  # §2.1 sinks (writes + reads back)
        "udf_map_in_arrow",  # §2.9 Arrow batch UDF
        "udtf_long_token_index",  # §2.9 UDTF
        "stream_session_windows",  # §2.10
        "stream_stateful_running_totals",  # §2.10 stateful
        "dedup_minhash_lsh_pairs",  # LLM dedup
        "sim_cosine_topk_lsh",  # LLM ANN
        "sim_cosine_topk_ivf",  # LLM ANN (IVF)
        "text_hashed_tfidf",  # LLM text
        "mm_phash_neardup",  # multimodal near-dup
        "mm_binaryfile_source",  # multimodal ingest
        "sample_k_per_stratum",  # train-data sampling
        "decontaminate_ngram_overlap",  # train-data decontamination
        "pipeline_clean_corpus",  # end-to-end composition
    }
    missing = required - top
    assert not missing, f"top-50 no longer covers: {sorted(missing)}"


def test_every_query_has_oracle():
    # round 3: even sketch queries carry oracles (tolerance-predicate
    # gates for HLL, full value replay for md5-deterministic Bloom/CMS)
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle == set(), no_oracle
