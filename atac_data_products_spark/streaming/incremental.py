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

import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _fs_and_path(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for `path` — works for local, HDFS and
    object-store URIs alike (os.path would silently say 'missing' for
    any non-local scheme)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def upsert_latest_revision(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    key: str = "uuid",
    revision_col: str = "revision",
) -> None:
    """Last-writer-wins merge of a micro-batch into a parquet table.

    The merged result is written to a STAGING directory and swapped in
    (delete + rename) — the plan never reads the path it is replacing,
    nothing round-trips through the driver, and a crash mid-write leaves
    the live table untouched (a crash between delete and rename leaves
    the staging dir to recover from; closing that last window entirely
    is what transactional table formats are for).
    """
    fs, target = _fs_and_path(spark, table_path)
    if fs.exists(target):
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
    staging = f"{table_path}.staging-{_uuid.uuid4().hex[:8]}"
    latest.write.mode("overwrite").parquet(staging)
    _, staging_path = _fs_and_path(spark, staging)
    # Hadoop FileSystem reports failure via boolean returns, not
    # exceptions; a false rename after a successful delete would drop the
    # live table while the stream checkpoint advances past the batch.
    if fs.exists(target) and not fs.delete(target, True):
        raise IOError(f"failed to delete live table before swap: {table_path}")
    if not fs.rename(staging_path, target):
        raise IOError(
            f"failed to swap staging into place: {staging} -> {table_path}"
        )


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
