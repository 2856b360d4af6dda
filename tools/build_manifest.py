"""CLI for the manifest-build pipeline — the engine's equivalent of the
reference's ``bin/make_uuids_tsv.py`` entry point: search-hit JSON →
assay/access/revision filters → donor-concept explode+pivot → manifest
TSV (index artifact dropped).

Usage:
    python tools/build_manifest.py HITS_JSONL OUT_TSV [--organ CODE]

HITS_JSONL: newline-delimited JSON of search hits with the fields
(uuid, hubmap_id, dataset_type, data_access_level, origin_samples_organ,
next_revision_uuid, organ_donor_data[], living_donor_data[]) — the
portal-search response shape the reference consumes, kept as a file so
the REST boundary stays mockable (no network in this engine).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

REC = (
    "array<struct<grouping_concept_preferred_term:string,"
    "data_value:string,preferred_term:string>>"
)
HITS_SCHEMA = (
    "uuid string, hubmap_id string, dataset_type string, "
    "data_access_level string, origin_samples_organ string, "
    f"next_revision_uuid string, organ_donor_data {REC}, "
    f"living_donor_data {REC}"
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("hits_jsonl")
    ap.add_argument("out_tsv")
    ap.add_argument("--organ", default=None)
    args = ap.parse_args()

    from atac_data_products_spark.plans.manifest import build_manifest
    from atac_data_products_spark.session import get_spark
    from atac_data_products_spark.sinks.writers import write_manifest_tsv

    spark = get_spark("build-manifest")
    spark.sparkContext.setLogLevel("WARN")
    hits = spark.read.schema(HITS_SCHEMA).json(args.hits_jsonl)
    manifest = build_manifest(hits, organ_code=args.organ)
    write_manifest_tsv(manifest, args.out_tsv)
    print(f"manifest written to {args.out_tsv}: {manifest.count()} datasets")
    return 0


if __name__ == "__main__":
    sys.exit(main())
