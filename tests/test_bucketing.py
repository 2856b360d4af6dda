"""Bucketed co-located join: the at-rest shuffle-elimination path.

Evidence for the 100 TB design claim: two tables bucketed by their join
key join with zero Exchange operators — each task reads matching buckets
from both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from atac_data_products_spark.sinks.writers import write_bucketed
from atac_data_products_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8, str(tmp_path / "li"))
    write_bucketed(orders, "ord_bucketed", "o_orderkey", 8, str(tmp_path / "ord"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the bucket co-location is what
        # eliminates the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it is still correct
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")
