"""Incremental upsert: streamed dataset revisions → last-writer-wins
product table (the reference's latest-revision semantics made truly
incremental)."""

from __future__ import annotations

import pandas as pd

from atac_data_products_spark.streaming.incremental import (
    run_incremental_upsert,
    upsert_latest_revision,
)

SCHEMA = "uuid string, revision bigint, cell_count bigint"


def test_upsert_batch_semantics(spark, tmp_path):
    path = str(tmp_path / "table")
    b1 = spark.createDataFrame([("u1", 1, 100), ("u2", 1, 200)], SCHEMA)
    upsert_latest_revision(spark, b1, path)
    b2 = spark.createDataFrame([("u1", 2, 150), ("u3", 1, 300)], SCHEMA)
    upsert_latest_revision(spark, b2, path)
    got = {r.uuid: r for r in spark.read.parquet(path).collect()}
    assert set(got) == {"u1", "u2", "u3"}
    assert got["u1"].revision == 2 and got["u1"].cell_count == 150  # upserted
    assert got["u2"].cell_count == 200  # untouched


def test_streamed_upsert_end_to_end(spark, tmp_path):
    # stage two revision files; the file stream drains both under
    # AvailableNow (maxFilesPerTrigger=1 → two micro-batches)
    src = tmp_path / "revisions"
    src.mkdir()
    pd.DataFrame(
        [("u1", 1, 100), ("u2", 1, 200)], columns=["uuid", "revision", "cell_count"]
    ).to_parquet(src / "r1.parquet")
    pd.DataFrame(
        [("u1", 2, 150)], columns=["uuid", "revision", "cell_count"]
    ).to_parquet(src / "r2.parquet")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    table = str(tmp_path / "product_table")
    run_incremental_upsert(
        stream, table, checkpoint=str(tmp_path / "ckpt")
    )
    got = {r.uuid: (r.revision, r.cell_count) for r in spark.read.parquet(table).collect()}
    assert got["u1"] == (2, 150)
    assert got["u2"] == (1, 200)
