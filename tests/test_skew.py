"""Skew-handling evidence.

1. AQE skew-join: a pathologically skewed key actually triggers
   runtime skew-splitting (SortMergeJoin(skew=true) in the final
   adaptive plan) under the engine's session settings.
2. Salted aggregation: bit-identical to direct aggregation on a skewed
   distribution (the oracle query proves it on uniform data; this
   proves it on the distribution salting exists for).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one hot key carrying ~97% of a 300k-row fact side
        fact = spark.range(300_000).select(
            F.when(F.col("id") % 30 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(100_000).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("v")
        )
        joined = fact.join(dim, "k")
        # execute THIS dataframe's own query so its adaptive plan
        # finalizes (count() would spawn a separate QueryExecution)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"no skew split in final plan:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_agg_matches_direct_on_skew(spark):
    from atac_data_products_spark.operators.skew import salted_sum_count

    skewed = spark.range(100_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 50 != 0, F.lit("hot")).otherwise(F.lit("cold")).alias("key"),
        (F.col("id") % 97).alias("val"),
    )
    salted = {
        r.key: (r.n_rows, r.sum_val)
        for r in salted_sum_count(
            skewed, ["key"], ["val"], salt_on=F.col("row_id")
        ).collect()
    }
    direct = {
        r.key: (r.n, r.s)
        for r in skewed.groupBy("key")
        .agg(F.count("*").alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert salted == direct
