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

from tests.conftest import SF_SMALL


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
