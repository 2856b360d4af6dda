"""Algebraic property tests for the round-3 scale-ops batch
(registry_scale.py) — Spark-vs-Spark identities that the DuckDB oracle
cannot express: physical-rewrite losslessness (bloom, salting, prefix
filter, banding) and checksum sensitivity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_prefix_filter_equals_brute_jaccard(spark):
    """Prefix filtering is lossless: the candidate-restricted verify must
    equal the unrestricted inverted-index join at the same threshold."""
    from atac_data_products_spark.extensions.dedup import jaccard_pairs
    from atac_data_products_spark.extensions.text import shingle_table
    from atac_data_products_spark.registry_scale import (
        PREFIX_JACCARD,
        dedup_prefix_filter_join,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    brute = jaccard_pairs(shingle_table(docs), threshold=PREFIX_JACCARD)
    fast = dedup_prefix_filter_join(spark, SF_SMALL)
    pd.testing.assert_frame_equal(_sorted_pdf(fast), _sorted_pdf(brute))


def test_bloom_semi_join_equals_plain_semi_join(spark):
    """Bloom prefilter + verify == plain semi-join (false positives are
    removed by the verify; false negatives are impossible)."""
    from atac_data_products_spark.registry_scale import (
        BLOOM_DIM_MIN_BAL,
        bloom_semi_join,
    )

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    sup = (
        spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
        .where(F.col("s_acctbal") > BLOOM_DIM_MIN_BAL)
        .select("s_suppkey")
    )
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )
    pd.testing.assert_frame_equal(
        _sorted_pdf(bloom_semi_join(spark, SF_SMALL)), _sorted_pdf(plain)
    )


def test_salted_join_equals_plain_join(spark):
    """Salting is a pure physical rewrite: identical rows out."""
    from atac_data_products_spark.registry_scale import join_salted_skew
    from atac_data_products_spark.sources.tables import ts_us_expr

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    e = ev.select(
        "event_id",
        (ts_us_expr(ev) / F.lit(86_400_000_000)).cast("bigint").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    daily = e.groupBy("day").agg(
        F.count("*").alias("n_day"),
        F.sum("cents").cast("bigint").alias("cents_day"),
    )
    plain = e.join(daily, "day").select(
        "event_id",
        "day",
        "n_day",
        "cents_day",
        F.round(F.col("cents") / F.col("cents_day").cast("double"), 6).alias(
            "day_share"
        ),
    )
    pd.testing.assert_frame_equal(
        _sorted_pdf(join_salted_skew(spark, SF_SMALL)), _sorted_pdf(plain)
    )


def test_spatial_grid_banding_is_lossless(spark):
    """3x3 grid banding finds exactly the brute-force nearest neighbor
    within the radius (cell size == radius covers every candidate)."""
    from atac_data_products_spark.functions.hashes import hash59
    from atac_data_products_spark.registry_scale import (
        GRID_RADIUS,
        GRID_WORLD,
        spatial_grid_nn,
    )
    from pyspark.sql.window import Window

    def coords(df, key, xa, ya):
        return df.select(
            key,
            (hash59(F.concat(F.lit("gx"), F.col(key).cast("string"))) % GRID_WORLD).alias(xa),
            (hash59(F.concat(F.lit("gy"), F.col(key).cast("string"))) % GRID_WORLD).alias(ya),
        )

    c = coords(spark.read.parquet(f"{SF_SMALL}/customer.parquet"), "c_custkey", "x", "y")
    s = coords(spark.read.parquet(f"{SF_SMALL}/supplier.parquet"), "s_suppkey", "sx", "sy")
    pairs = c.crossJoin(s).select(
        "c_custkey",
        "s_suppkey",
        (
            (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx"))
            + (F.col("y") - F.col("sy")) * (F.col("y") - F.col("sy"))
        ).alias("dist2"),
    ).where(F.col("dist2") <= GRID_RADIUS * GRID_RADIUS)
    w = Window.partitionBy("c_custkey").orderBy("dist2", "s_suppkey")
    brute = (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("c_custkey", F.col("s_suppkey").alias("nn_suppkey"), "dist2")
    )
    pd.testing.assert_frame_equal(
        _sorted_pdf(spatial_grid_nn(spark, SF_SMALL)), _sorted_pdf(brute)
    )


def test_table_checksum_detects_single_cell_change(spark, tmp_path):
    """Sensitivity: flipping one cell of one row must change the table's
    checksum (and nothing else's)."""
    from atac_data_products_spark.registry_scale import table_checksum

    base = table_checksum(spark, SF_SMALL).toPandas().set_index("table_name")

    mutated_dir = str(tmp_path / "mutated")
    import shutil, os

    os.makedirs(mutated_dir)
    for name in ["lineitem", "orders", "customer", "events", "documents",
                 "embeddings", "nation", "region", "part", "supplier"]:
        src = f"{SF_SMALL}/{name}.parquet"
        if name == "customer":
            pdf = pd.read_parquet(src)
            pdf.loc[pdf.index[0], "c_acctbal"] = pdf.loc[pdf.index[0], "c_acctbal"] + 0.01
            pdf.to_parquet(f"{mutated_dir}/{name}.parquet")
        else:
            shutil.copy(src, f"{mutated_dir}/{name}.parquet")
    mut = table_checksum(spark, mutated_dir).toPandas().set_index("table_name")

    assert mut.loc["customer", "checksum"] != base.loc["customer", "checksum"]
    assert mut.loc["lineitem", "checksum"] == base.loc["lineitem", "checksum"]
    assert mut.loc["orders", "checksum"] == base.loc["orders", "checksum"]
    assert (mut["n_rows"] == base["n_rows"]).all()


def test_bfs_hops_are_shortest_paths(spark):
    """Every hop-k node must have an edge to some hop-(k-1) node and no
    edge to any hop-(k-2) or earlier node (BFS level correctness)."""
    from atac_data_products_spark.registry_scale import (
        BFS_BULK_QTY,
        graph_bfs_hops,
    )

    li = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .where(F.col("l_quantity") > BFS_BULK_QTY)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    ).toPandas()
    hops = graph_bfs_hops(spark, SF_SMALL).toPandas()
    hop_of = dict(zip(hops.p_partkey, hops.hop))
    nbrs: dict = {}
    for r in edges.itertuples():
        nbrs.setdefault(r.p1, set()).add(r.p2)
    for node, h in hop_of.items():
        if h == 0:
            continue
        nbr_hops = {hop_of.get(n) for n in nbrs.get(node, set())}
        assert (h - 1) in nbr_hops, f"node {node} at hop {h} lacks a hop-{h-1} neighbor"
        assert not any(
            nh is not None and nh < h - 1 for nh in nbr_hops
        ), f"node {node} at hop {h} touches an earlier frontier"


def test_weighted_reservoir_is_key_stable(spark):
    """Two independent evaluations produce the identical sample (key-
    stability is the rerun-safety contract)."""
    from atac_data_products_spark.registry_scale import sample_weighted_reservoir

    one = _sorted_pdf(sample_weighted_reservoir(spark, SF_SMALL))
    two = _sorted_pdf(sample_weighted_reservoir(spark, SF_SMALL))
    pd.testing.assert_frame_equal(one, two)


def test_table_checksum_tolerates_unmapped_table(spark, monkeypatch):
    """A table added to _CHECKSUM_TABLES without a spread-key entry must
    degrade to the keyless spread, not KeyError at plan build (round-13,
    verdict find)."""
    from atac_data_products_spark import registry_scale as rs

    patched = dict(rs._CHECKSUM_TABLES)
    patched["nation"] = ("CAST(n_nationkey AS {s})", "n_name")
    monkeypatch.setattr(rs, "_CHECKSUM_TABLES", patched)
    out = rs.table_checksum(spark, SF_SMALL).toPandas().set_index("table_name")
    assert "nation" in out.index
    assert int(out.loc["nation", "n_rows"]) == 25
