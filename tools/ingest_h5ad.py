"""One-time ingestion converter: per-dataset h5ad files → canonical
long-form Parquet (SURVEY.md §1.4 ingestion boundary).

Usage:
    python tools/ingest_h5ad.py <input_glob> <out_dir> [--format h5ad|parquet]

Layout in: the reference's staging layout (make_directory.py:50-76) —
``<base>/<dataset_uuid>/cell_by_bin.h5ad`` etc.  Layout out: one
long/COO parquet table partitioned by dataset, ready for
plans/product.build_product.

The h5ad decode prefers anndata/h5py when importable and otherwise
uses the dependency-free pure-Python HDF5 reader (sources/hdf5.py),
which covers the layouts default-settings ``anndata.write_h5ad``
produces; ``--format parquet`` runs the identical distributed plumbing
(binaryFile scan → Arrow-batched mapInPandas decode → partitioned
write) on parquet payloads.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_glob")
    ap.add_argument("out_dir")
    ap.add_argument("--format", choices=["h5ad", "parquet"], default="h5ad")
    args = ap.parse_args()

    from atac_data_products_spark.session import get_spark
    from atac_data_products_spark.sources.ingest import (
        COO_SCHEMA,
        decode_h5ad_bytes,
        decode_parquet_bytes,
        ingest_binary_files,
    )

    spark = get_spark("adp-ingest")
    if args.format == "h5ad":
        decoder, schema = decode_h5ad_bytes, COO_SCHEMA
    else:
        decoder, schema = (
            decode_parquet_bytes(["dataset", "barcode", "feature_id", "value"]),
            COO_SCHEMA,
        )
    df = ingest_binary_files(spark, args.input_glob, decoder, schema)
    df.write.mode("overwrite").partitionBy("dataset").parquet(args.out_dir)
    n = spark.read.parquet(args.out_dir).count()
    print(f"ingested {n} matrix entries -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
