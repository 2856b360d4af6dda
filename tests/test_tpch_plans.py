"""Physical-plan shape evidence for the TPC-H batteries.

Each docstring in registry_tpch.py makes a scale claim (dims broadcast,
argmax is not a global window, top-k is a driver-side O(k) merge, EXISTS
compiles to semi/anti joins).  These tests pin those claims to the plan
Spark actually produces, so a regression in join strategy or an
accidental all-rows window shows up as a test failure, not a 100x
slowdown at scale.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMALL  # noqa: E402


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(key):
    import __spark_entry__ as e

    return e.queries()[key]


def test_q15_argmax_has_no_window(spark):
    """The max-revenue filter must be a broadcast one-row join, never a
    global (empty-partitionBy) window that serializes the revenue table
    through one task."""
    plan = _phys(_q("tpch_q15_top_supplier")(spark, SF_SMALL))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q10_topk_is_take_ordered(spark):
    """ORDER BY ... LIMIT 20 must plan as TakeOrderedAndProject (per-
    partition top-k + O(k) driver merge), not a full global sort."""
    plan = _phys(_q("tpch_q10_returned_items")(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_q4_exists_is_semi_join(spark):
    plan = _phys(_q("tpch_q4_priority_exists")(spark, SF_SMALL))
    assert "LeftSemi" in plan


def test_q22_not_exists_is_anti_join(spark):
    plan = _phys(_q("tpch_q22_idle_customers")(spark, SF_SMALL))
    assert "LeftAnti" in plan


def test_q8_dims_broadcast(spark):
    """The 8-way star must broadcast every dimension side; at most the
    lineitem<->orders join may shuffle."""
    plan = _phys(_q("tpch_q8_market_share")(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 5
    big_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert big_joins <= 1


def test_minhash_lsh_no_cartesian(spark):
    """Pair generation must stay an equality join on (band, sig) —
    banded LSH's whole point.  A refactor that degrades it to a nested
    loop / cartesian would be quadratic in corpus size."""
    plan = _phys(_q("dedup_minhash_lsh")(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "NestedLoopJoin" not in plan
    # map-side combine on the minhash aggregation
    assert "partial_min" in plan


def test_tfidf_small_sides_broadcast(spark):
    """df and corpus-size sides must broadcast back onto tf; the big
    (doc,term) table must never reach a SortMergeJoin."""
    plan = _phys(_q("corpus_tfidf_topk")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the three aggregations are all map-side combinable
    assert "partial_count" in plan


def test_gene_map_dim_broadcast_no_shuffle(spark):
    """The 40k-row gene map must broadcast; the fact side must reach it
    without any shuffle exchange."""
    plan = _phys(_q("join_gene_map")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q17_window_runs_after_pruning_join(spark):
    """Q17's per-part average window must sit ABOVE the broadcast join
    (over the brand-pruned rows), not over the full lineitem scan: in
    the plan string the Window node appears before (closer to the root
    than) the BroadcastHashJoin it consumes."""
    plan = _phys(_q("tpch_q17_small_qty_revenue")(spark, SF_SMALL))
    assert "Window" in plan and "BroadcastHashJoin" in plan
    assert plan.index("Window") < plan.index("BroadcastHashJoin")


def test_scd2_windows_share_one_exchange(spark):
    """Both window passes (change filter, interval close) partition on
    the same key and order, so Catalyst must plan exactly one shuffle
    and one sort for the whole history build."""
    plan = _phys(_q("scd2_state_history")(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 2


# ---------------------------------------------------------------------------
# Round-2 batch plan pins
# ---------------------------------------------------------------------------


def test_interval_sweep_has_no_interval_explosion(spark):
    """The coverage profile must be the sweep plan: exactly one
    sequence-explode (the bounded segment re-expansion) and the two
    constant 2-element endpoint explodes — never a per-interval
    sequence(d0, d1) whose output scales with interval length."""
    plan = _phys(_q("interval_coverage_profile")(spark, SF_SMALL))
    assert plan.count("sequence(") == 1
    seg = plan.split("sequence(")[1][:80]
    assert "coalesce" in seg or "seg_end" in seg


def test_dict_tag_has_no_join_or_expand(spark):
    """Gazetteer tagging folds the dict into HOF projections: no join
    of an exploded token stream, no count-distinct Expand doubling."""
    plan = _phys(_q("dict_tag_terms")(spark, SF_SMALL))
    assert "Join" not in plan
    assert "Expand" not in plan


def test_ml_score_is_one_arrow_map_stage(spark):
    """Batch inference must be a pure map: one MapInPandas over the
    scan, zero Exchanges."""
    plan = _phys(_q("ml_score_batch")(spark, SF_SMALL))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_feature_hashing_single_shuffle(spark):
    """Hashing-trick featurizer: one aggregation Exchange, no joins."""
    plan = _phys(_q("text_feature_hashing")(spark, SF_SMALL))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial+final agg around one shuffle


def test_attribution_single_user_shuffle(spark):
    """Multi-touch attribution: one (user_id) window pass, no joins."""
    plan = _phys(_q("attribution_multitouch_linear")(spark, SF_SMALL))
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_winsorize_bounds_broadcast(spark):
    """The per-group P5/P95 frame must broadcast back onto the rows —
    clamping adds no shuffle beyond the two aggregations."""
    plan = _phys(_q("agg_winsorize")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level filtering: with a selective dim-side predicate
    and broadcast off, Spark injects a bloom filter built from the dim
    side into the fact scan (bloom_filter_might_contain) — the runtime
    complement to static predicate pushdown, and the mechanism that
    keeps big-big joins from shuffling rows that cannot match."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from atac_data_products_spark.sources.tables import load_table

        li = load_table(spark, SF_SMALL, "lineitem")
        o = load_table(spark, SF_SMALL, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_kmeans_assign_is_broadcast_not_shuffle(spark):
    """Each k-means assignment must be a broadcast of the k-row centroid
    table against the point set — a SortMergeJoin here would shuffle the
    full corpus once per iteration."""
    plan = _phys(_q("vector_kmeans_lloyd")(spark, SF_SMALL))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_psi_bounds_join_is_broadcast(spark):
    """The per-type bounds table (|types| rows) must broadcast into the
    binning scan; PSI must not shuffle raw events on event_type twice."""
    plan = _phys(_q("ml_psi_drift")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cross_source_overlap_shuffles_digests_not_text(spark):
    """The distinct + self-join must key on the md5 digest column — the
    raw text column must be pruned out before any exchange."""
    df = _q("corpus_cross_source_overlap")(spark, SF_SMALL)
    plan = _phys(df)
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)


def test_format_sniff_single_aggregation(spark):
    """Format sniffing is one combinable aggregate: exactly one shuffle
    exchange (the final rollup), no joins at all."""
    plan = _phys(_q("multimodal_format_sniff")(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Join" not in plan
