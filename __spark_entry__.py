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
# of queries() insertion order per round; keys it has already green-lit are
# demoted to the back (they stay covered by the identical local harness,
# tools/check_correctness.py). _DRIVER_GREEN is derived from the driver's own
# CORRECTNESS_r*.json artifacts at import, so the rotation is
# SELF-MAINTAINING: freshly graded keys drop out of the window next round and
# the next ungraded keys (priority list first, registry order after) slide
# in without editing this file.  A key that failed its latest grading stays
# in the window for re-grading.
_PRIORITY: list[str] = [
    # VERDICT r03 "Next round #2": the riskiest ungraded plans first —
    # physical-rewrite joins, iterative algorithms, sufficient-statistics
    # ML, sampling — so driver grading covers them this round. (10)
    "scan_h5ad_codec",
    "dedup_prefix_filter_join",
    "corpus_pipeline_e2e",
    "vector_kmeans_lloyd",
    "vector_pca_power_iteration",
    "spatial_grid_nn",
    "bloom_semi_join",
    "similarity_mmr_rerank",
    "sql_api_recursive_cte",
    "ml_logistic_irls",
    "stat_bootstrap_poisson_ci",
    # remaining iterative graph operators (5)
    "graph_kcore_peel",
    "graph_label_propagation",
    "graph_bfs_hops",
    "graph_common_neighbors",
    "graph_assortativity",
    # dedup evaluation / scale-stress battery (10)
    "dedup_minhash_lsh_exact",
    "dedup_minhash_lsh_star_stress",
    "dedup_incremental_probe",
    "dedup_containment",
    "dedup_common_substring",
    "dedup_lsh_band_sweep",
    "dedup_cluster_chain_audit",
    "dedup_minhash_estimate_calibration",
    "dedup_simhash_eval",
    "dedup_sampled_rate_estimate",
    # similarity / vector evaluation paths (6)
    "similarity_ann_recall_eval",
    "similarity_range_search",
    "similarity_matryoshka_prefix_eval",
    "knn_label_vote",
    "semantic_bucket_purity",
    "vector_lang_centroid_outliers",
    # streaming batch-twin audits (2)
    "stream_join_interval",
    "stream_state_size_audit",
    # mutation / temporal-correctness shapes (8)
    "tpch_refresh_cycle",
    "cdc_merge_upsert",
    "scd2_state_history",
    "join_point_in_time_scd2",
    "join_salted_skew",
    "agg_salted_skew",
    "join_range_banding",
    "join_asof_nearest",
    # source formats + sketches + ML eval (9)
    "scan_fixed_width",
    "scan_parquet_rowgroup_stats",
    "sketch_hll_mergeable_rollup",
    "sketch_bloom_fpr_eval",
    "approx_distinct_accuracy",
    "approx_percentile_accuracy",
    "ml_naive_bayes_langid",
    "ml_roc_auc",
    # round-4 addition past the 50-key window: first in line for r05
    "multimodal_png_decode",
]


def _driver_green() -> frozenset:
    """Keys already green-lit by the driver: every key whose LATEST
    appearance in a CORRECTNESS_r*.json has all three match flags true.
    Reading the driver's own artifacts makes the rotation
    self-maintaining — each round, freshly graded keys demote
    automatically and the next ungraded keys slide into the 50-key
    grading window without editing this file.  A key that FAILED in its
    latest grading stays in the window for re-grading after the fix."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    status: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for key, row in data.items():
            if isinstance(row, dict) and "hash_match" in row:
                status[key] = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                )
    return frozenset(k for k, ok in status.items() if ok)


_DRIVER_GREEN = _driver_green()
_R01_GREEN = _DRIVER_GREEN  # backwards-compat alias (tests import this name)


def _rotated(mapping: dict) -> dict:
    """Driver-ungraded priority keys first, then the remaining ungraded
    keys in registry order, then the driver-green keys.  Because
    _DRIVER_GREEN is read from the CORRECTNESS_r*.json artifacts, a
    priority key graded green simply drops out of the window next round
    and the following ungraded keys slide in — no per-round edits.
    Keeps queries() and oracle_sql() aligned."""
    out = {
        k: mapping[k]
        for k in _PRIORITY
        if k in mapping and k not in _DRIVER_GREEN
    }
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
        registry_scale,
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
        registry_scale,
        registry_tpch,
    )

    return _rotated(dict(registry.ORACLES))
