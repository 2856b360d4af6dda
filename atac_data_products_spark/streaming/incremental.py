"""Incremental product maintenance via foreachBatch.

The reference's only incrementality is the `next_revision_uuid` filter
selecting latest dataset revisions (make_uuids_tsv.py:29-36) — every
run still rebuilds everything (bin/concatenate.py:119-152).  This
module closes that gap: a stream of dataset-revision updates upserts a
product table incrementally.

Pattern: readStream → foreachBatch(upsert) where upsert is
last-writer-wins per key:

  merged = (existing ∪ batch) → row_number over (key, order by
  revision desc) == 1

Without a transactional table format (Delta/Iceberg ship MERGE; vanilla
parquet does not), the upsert rewrites the (small) product table
atomically via overwrite — the CDC/SCD pattern from the charter's
"emulate MERGE with anti-join + union + window".  State stays bounded:
the product table holds one row per live dataset, not per revision.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_latest_revision(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    key: str = "uuid",
    revision_col: str = "revision",
) -> None:
    """Last-writer-wins merge of a micro-batch into a parquet table."""
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
        merged = existing.unionByName(batch, allowMissingColumns=True)
    else:
        merged = batch
    w = Window.partitionBy(key).orderBy(F.desc(revision_col))
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # materialize before overwrite (the plan reads the path being replaced)
    rows = latest.collect()
    spark.createDataFrame(rows, latest.schema).write.mode("overwrite").parquet(table_path)


def run_incremental_upsert(
    stream: DataFrame,
    table_path: str,
    key: str = "uuid",
    revision_col: str = "revision",
    checkpoint: str | None = None,
):
    """Wire a revision stream into the upsert sink (AvailableNow drains
    everything pending, then stops — the batch-refresh deployment mode;
    continuous triggers give the always-on mode)."""
    spark = stream.sparkSession

    def sink(batch: DataFrame, batch_id: int) -> None:
        upsert_latest_revision(spark, batch, table_path, key, revision_col)

    writer = stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
