"""Ingestion-converter tests: staged per-dataset payload files → one
partitioned long-form parquet table (the SURVEY §1.4 boundary), driven
through the CLI's parquet-format path AND the real h5ad path (the
pure-Python HDF5 codec, no anndata/h5py in the container)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pandas as pd


def test_ingest_cli_roundtrip(spark, tmp_path):
    base = tmp_path / "staged"
    for ds, rows in {
        "ds1": [("ds1", "AAAC", "chr1:0-500", 2.0), ("ds1", "GGGT", "chr1:0-500", 1.0)],
        "ds2": [("ds2", "CCCC", "chr2:0-500", 5.0)],
    }.items():
        d = base / ds
        d.mkdir(parents=True)
        pd.DataFrame(
            rows, columns=["dataset", "barcode", "feature_id", "value"]
        ).to_parquet(d / "cell_by_bin.parquet")

    out = tmp_path / "coo"
    res = subprocess.run(
        [
            sys.executable,
            "tools/ingest_h5ad.py",
            f"{base}/*/cell_by_bin.parquet",
            str(out),
            "--format",
            "parquet",
        ],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ingested 3 matrix entries" in res.stdout

    back = spark.read.parquet(str(out))
    assert back.count() == 3
    assert {r.dataset for r in back.select("dataset").distinct().collect()} == {"ds1", "ds2"}


def test_ingest_cli_h5ad_format(spark, tmp_path):
    """The reference's actual input layout end to end: real .h5ad files
    (pure-Python writer) through the CLI's default h5ad path."""
    import numpy as np

    from atac_data_products_spark.sources.hdf5_write import build_h5ad_csr

    base = tmp_path / "staged"
    for ds in ["ds1", "ds2"]:
        d = base / ds
        d.mkdir(parents=True)
        (d / "cell_by_bin.h5ad").write_bytes(
            build_h5ad_csr(
                ["AAAC", "GGGT"],
                ["chr1:0-500", "chr2:0-500"],
                np.array([2.0, 5.0]),
                np.array([0, 1], dtype="int32"),
                np.array([0, 1, 2], dtype="int64"),
            )
        )

    out = tmp_path / "coo"
    res = subprocess.run(
        [
            sys.executable,
            "tools/ingest_h5ad.py",
            f"{base}/*/cell_by_bin.h5ad",
            str(out),
        ],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ingested 4 matrix entries" in res.stdout
    back = spark.read.parquet(str(out))
    rows = {(r.dataset, r.barcode, r.feature_id, r.value) for r in back.collect()}
    assert rows == {
        ("ds1", "AAAC", "chr1:0-500", 2.0),
        ("ds1", "GGGT", "chr2:0-500", 5.0),
        ("ds2", "AAAC", "chr1:0-500", 2.0),
        ("ds2", "GGGT", "chr2:0-500", 5.0),
    }
