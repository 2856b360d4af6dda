"""CLI for the product-build pipeline — the engine's equivalent of the
reference's ``bin/concatenate.py`` entry point (reference lines 119-152:
annotate → outer-concat → intersect_obs → donor join → cast → count →
write), driving plans/product.py end to end from files on disk.

Usage:
    python tools/build_product.py OUT_DIR \
        --manifest PATH             (TSV via scan_tsv_manifest, or parquet)
        --matrix MODALITY=PATH ...  (long/COO parquet: dataset, barcode,
                                     feature_id, value; repeatable, one
                                     per modality)
        [--tissue NAME] [--product-uuid UUID]

Everything between the scans and the final write is ONE lazy Spark plan;
the output directory gets per-modality dataset-partitioned matrix
tables, the obs table, and product.json — the Parquet product layout
that replaces the reference's single in-RAM h5mu (SURVEY §1.4).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--manifest", required=True)
    ap.add_argument(
        "--matrix",
        action="append",
        required=True,
        metavar="MODALITY=PATH",
        help="repeatable: modality name = path to long/COO parquet",
    )
    ap.add_argument("--tissue", default=None)
    ap.add_argument("--product-uuid", default=None)
    args = ap.parse_args()

    from atac_data_products_spark.plans.product import (
        build_product,
        finalize_and_write,
    )
    from atac_data_products_spark.session import get_spark
    from atac_data_products_spark.sources.tsv import scan_tsv_manifest

    spark = get_spark("build-product")
    spark.sparkContext.setLogLevel("WARN")

    if args.manifest.endswith((".tsv", ".txt")):
        manifest = scan_tsv_manifest(spark, args.manifest)
    else:
        manifest = spark.read.parquet(args.manifest)

    mats: dict[str, list] = {}
    for spec in args.matrix:
        modality, _, path = spec.partition("=")
        if not path:
            ap.error(f"--matrix must be MODALITY=PATH, got {spec!r}")
        mats.setdefault(modality, []).append(spark.read.parquet(path))

    result = build_product(
        manifest, mats, tissue=args.tissue, product_uuid=args.product_uuid
    )
    meta = finalize_and_write(result, manifest, args.out_dir)
    print(
        f"product written to {args.out_dir}: "
        f"{meta['cell_count']} cells, {meta['dataset_count']} datasets, "
        f"modalities={meta['modalities']}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
