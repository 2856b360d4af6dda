"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the reference's core product-build
  semantics — union → intersect → broadcast joins → annotate) at sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY.md §2
  plus the scale extensions (dedup / similarity / text / multimodal /
  streaming), each ``(spark, sf_dir) -> DataFrame``.
- ``oracle_sql()``: DuckDB-runnable SQL twin per key; keys without an
  oracle get the driver's rows-only check (noted per entry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Driver-verification priority. The driver grades exactly the first 50 keys
# of queries() insertion order per round. CORRECTNESS_r01 green-lit the 50
# SURVEY-§2 core keys; CORRECTNESS_r02 green-lit the 50 extension keys. Both
# sets are demoted to the back (they stay covered by the identical local
# harness, tools/check_correctness.py); the next 50 still-ungraded keys are
# rotated to the front for round 3. Rotate again next round for the rest.
_PRIORITY = [
    # graph battery (3)
    "graph_pagerank",
    "graph_triangle_count",
    "graph_degree_stats",
    # streaming batch twins (4)
    "window_tumbling_agg",
    "window_sliding_agg",
    "window_session_agg",
    "stream_dedup_exact",
    # LLM-corpus pipeline, batch 2 (14)
    "corpus_contamination",
    "corpus_repetition_ratio",
    "corpus_quality_gate",
    "corpus_chunk_overlap",
    "corpus_reservoir_per_source",
    "corpus_stats_rollup",
    "corpus_dedup_survivors",
    "corpus_vocab_coverage",
    "corpus_training_manifest",
    "corpus_lang_drift_kl",
    "corpus_unigram_logprob",
    "corpus_dup_rate_by_source",
    "corpus_token_entropy",
    "corpus_split_leakage_audit",
    # text analysis extras (3)
    "text_feature_hashing",
    "text_pmi_bigrams",
    "text_readability_scores",
    # similarity / vector extras (4)
    "similarity_knn_join",
    "ml_score_batch",
    "vector_gram_int8",
    "dedup_similarity_histogram",
    # analytics batches 2-3, registry order (22)
    "join_gene_map",
    "sink_orc_roundtrip",
    "sink_partitioned_pruned",
    "sink_compact_small_files",
    "scan_csv_quoted",
    "scan_jsonl_corrupt_tolerant",
    "scan_parquet_schema_evolution",
    "agg_cube_pricing",
    "agg_mode_deterministic",
    "agg_histogram_fixed",
    "window_topk_per_group",
    "window_moving_avg",
    "array_hof_battery",
    "timeseries_gapfill",
    "json_extract_battery",
    "sample_deterministic",
    "join_null_safe",
    "vector_centroids",
    "events_funnel",
    "zorder_key",
    "regex_extract_battery",
    "set_ops_battery",
]

# Keys driver-verified green in CORRECTNESS_r01 + CORRECTNESS_r02 — demoted to
# the back of the insertion order so unverified keys occupy the grading window.
_DRIVER_GREEN = frozenset(
    {
        # --- r01 (core SURVEY-§2 battery) ---
        "scan_tsv_manifest", "scan_h5ad", "scan_dir_discovery",
        "scan_file_pairs", "scan_rest_search", "scan_rest_entity",
        "scan_yaml_dim", "scan_json_dim", "scan_metadata_json",
        "project_drop_obs", "project_drop_col", "filter_nonempty_dataset",
        "filter_qc_present", "filter_dropna", "filter_match_eq",
        "filter_match_dynamic", "filter_not_exists", "filter_dir_resolution",
        "str_replace_literal", "str_strip_laterality", "str_concat_cell_id",
        "lit_annotate", "map_lookup_organ", "map_invert", "cast_to_numeric",
        "fill_na", "gen_uuid", "gen_timestamp", "fmt_url",
        "join_intersect_obs", "join_donor_metadata", "join_organ_dim",
        "join_zip_columns", "union_outer_concat", "agg_count_cells",
        "agg_collect_lists", "agg_first_match", "agg_file_size", "limit_page",
        "first_match_shortcircuit", "sink_tsv", "sink_metadata_json",
        "product_build_obs", "product_cell_count", "matrix_pivot_wide",
        "pipeline_product_metadata", "pipeline_manifest_build",
        "sink_product_dir", "agg_stats_battery", "agg_conditional_battery",
        # --- r02 (extension battery) ---
        "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_signature",
        "dedup_minhash_lsh", "dedup_connected_components", "dedup_simhash",
        "dedup_embedding_cosine", "dedup_embedding_cosine_lsh",
        "similarity_topk", "similarity_lsh_topk", "similarity_ivf_topk",
        "corpus_normalize_redact", "corpus_tfidf_topk", "corpus_split_assign",
        "corpus_seq_packing", "corpus_mixture_sample", "udtf_term_positions",
        "text_token_count", "text_token_count_bpe", "text_quality_score",
        "text_lang_id", "text_ngram_topk", "doc_fingerprint",
        "doc_fingerprint_rolling", "tpch_q1_pricing_summary",
        "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
        "tpch_q4_priority_exists", "sql_api_q5", "tpch_q6_forecast_revenue",
        "tpch_q7_volume_shipping", "tpch_q8_market_share",
        "tpch_q9_product_profit", "tpch_q10_returned_items",
        "tpch_q11_value_concentration", "tpch_q12_shipping_priority_mix",
        "tpch_q13_order_distribution", "tpch_q14_promo_share",
        "tpch_q15_top_supplier", "tpch_q16_supplier_variety",
        "tpch_q17_small_qty_revenue", "tpch_q18_large_orders",
        "tpch_q19_disjunctive_revenue", "tpch_q20_bulk_suppliers",
        "tpch_q21_sole_blame_suppliers", "tpch_q22_idle_customers",
        "sessionize_apply_in_pandas", "multimodal_byte_features",
        "multimodal_frame_sample", "join_asof_attribution",
    }
)
_R01_GREEN = _DRIVER_GREEN  # backwards-compat alias (tests import this name)


def _rotated(mapping: dict) -> dict:
    """Priority keys first, then unverified keys in registry order, then
    the driver-green keys from r01+r02. Keeps queries() and oracle_sql()
    aligned."""
    out = {k: mapping[k] for k in _PRIORITY if k in mapping}
    for k, v in mapping.items():
        if k not in out and k not in _DRIVER_GREEN:
            out[k] = v
    for k, v in mapping.items():
        if k not in out:
            out[k] = v
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from atac_data_products_spark.registry import product_obs_plan

    return product_obs_plan(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from atac_data_products_spark import (  # noqa: F401
        registry,
        registry_analytics,
        registry_corpus,
        registry_ext,
        registry_graph,
        registry_tpch,
    )

    return _rotated(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    from atac_data_products_spark import (  # noqa: F401
        registry,
        registry_analytics,
        registry_corpus,
        registry_ext,
        registry_graph,
        registry_tpch,
    )

    return _rotated(dict(registry.ORACLES))
