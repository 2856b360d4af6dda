"""Ingestion-converter test: staged per-dataset payload files → one
partitioned long-form parquet table (the SURVEY §1.4 boundary), driven
through the CLI's parquet-format path (h5ad decode is import-gated)."""

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
