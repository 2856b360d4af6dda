"""The product-build pipeline: reference-parity composition.

Re-expresses the core of `bin/concatenate.py:119-152` as one lazy Spark
plan over long/COO matrices:

  reference (eager, all datasets resident in RAM):
    read manifest → read all h5ads → strip obs → annotate
    → anndata.concat(join="outer") per modality      (:138-139)
    → MuData + intersect_obs                          (:99-102,144)
    → donor metadata merge + positional re-index      (:105-111)
    → age cast, cell count, uuid, timestamps          (:110,140-143)
    → write h5mu + metadata JSON                      (:150-152,81-96)

  this engine (lazy, partitioned, spill-safe):
    matrices arrive as long-form (dataset, barcode, feature_id, value)
    → annotate = column expressions (barcode clean, cell_id)
    → union = unionByName (outer feature alignment free in long form)
    → intersect = left-semi joins on cell_id
    → donor join = broadcast hash inner join (keyed, order-free)
    → aggregates + product dir write (sinks.writers)

Deliberately NOT reproduced (§2.11): the positional re-index idiom, the
`Unnamed: 0` column, the URL/filename mismatch, the Response-object
organ lookup bug.
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.strings import concat_cell_id, replace_literal
from ..operators.joins import broadcast_dim_join, intersect_keys
from ..operators.unions import union_outer
from ..sinks.writers import write_product

BARCODE_PREFIX = "BAM_data#"  # stripped at bin/concatenate.py:67


@dataclass
class ProductResult:
    obs: DataFrame
    modalities: dict[str, tuple[DataFrame, DataFrame]]  # name -> (x, var)
    metadata: dict = field(default_factory=dict)


def annotate_matrix(x: DataFrame, tissue: str | None) -> DataFrame:
    """Per-cell annotation (bin/concatenate.py:66-77): clean barcode,
    constant tissue, cell_id = dataset-barcode.  Pure column expressions —
    the reference's per-row Python loops become codegen."""
    clean = replace_literal("barcode", BARCODE_PREFIX)
    return x.select(
        "dataset",
        clean.alias("barcode"),
        F.lit(tissue).cast("string").alias("tissue"),
        concat_cell_id("dataset", clean).alias("cell_id"),
        "feature_id",
        "value",
    )


def build_product(
    manifest: DataFrame,
    matrices_by_modality: dict[str, list[DataFrame]],
    tissue: str | None = None,
    product_uuid: str | None = None,
) -> ProductResult:
    """Compose the full product plan (lazy — nothing executes until the
    caller writes or counts).

    manifest: (uuid, hubmap_id, age, sex, height, weight, bmi,
               cause_of_death, race) all-string (scan_tsv_manifest).
    matrices_by_modality: modality → list of per-dataset long/COO frames
               (dataset, barcode, feature_id, value).
    """
    # 1. per-modality union of annotated per-dataset matrices (U1):
    #    long form makes outer feature alignment automatic.
    unioned = {
        mod: annotate_matrix(union_outer(dfs), tissue)
        for mod, dfs in matrices_by_modality.items()
    }

    # 2. modality intersection on cell_id (J1, mu.pp.intersect_obs):
    #    chain left-semi joins so every modality keeps only cells present
    #    in ALL modalities.
    mods = list(unioned)
    cells = {mod: df.select("cell_id").distinct() for mod, df in unioned.items()}
    for mod in mods:
        for other in mods:
            if other != mod:
                unioned[mod] = intersect_keys(unioned[mod], cells[other], "cell_id")

    # 3. obs: one row per surviving cell (from the first modality, as the
    #    reference takes cbb's obs at :145), + donor metadata via
    #    broadcast inner join on dataset uuid (J2).  The inner join drops
    #    cells of unmanifested datasets — reference behavior worth keeping
    #    (FIXTURES edge case 1).
    first = unioned[mods[0]]
    obs_cells = first.select("cell_id", "dataset", "barcode", "tissue").distinct()
    obs = broadcast_dim_join(
        obs_cells, manifest, obs_cells.dataset == manifest.uuid, "inner"
    ).drop("uuid")
    # 4. type normalization (age string → double, bin/concatenate.py:110)
    if "age" in obs.columns:
        obs = obs.withColumn("age", F.col("age").cast("double"))

    # matrices restricted to manifested cells so X and obs stay aligned
    final_cells = obs.select("cell_id")
    modalities = {}
    for mod in mods:
        x = intersect_keys(unioned[mod], final_cells, "cell_id").select(
            "dataset", "cell_id", "feature_id", "value"
        )
        var = unioned[mod].select("feature_id").distinct().withColumn(
            "modality", F.lit(mod)
        )
        modalities[mod] = (x, var)

    meta = {
        "product_uuid": product_uuid or str(_uuid.uuid4()),
        "tissue": tissue,
        "assay": "ATACseq",
        "modalities": sorted(mods),
    }
    return ProductResult(obs=obs, modalities=modalities, metadata=meta)


def finalize_and_write(result: ProductResult, manifest: DataFrame, out_dir: str) -> dict:
    """Execute the plan: compute the metadata aggregates (cell count A1,
    uuid/hbmid lists A2 — bin/concatenate.py:122-123,142-143) and write
    the product directory."""
    counts = result.obs.agg(
        F.count("*").alias("n_cells"),
        F.count_distinct("dataset").alias("n_datasets"),
    ).first()
    lists = manifest.agg(
        F.sort_array(F.collect_list("uuid")).alias("uuids"),
        F.sort_array(F.collect_list("hubmap_id")).alias("hbmids"),
    ).first()
    metadata = {
        **result.metadata,
        "cell_count": counts.n_cells,
        "dataset_count": counts.n_datasets,
        "dataset_uuids": list(lists.uuids),
        "dataset_hbmids": list(lists.hbmids),
    }
    write_product(out_dir, result.obs, result.modalities, metadata)
    return metadata


def append_dataset_to_product(
    spark,
    product_dir: str,
    manifest: DataFrame,
    dataset: str,
    new_matrices_by_modality: dict[str, DataFrame],
    tissue: str | None = None,
) -> dict:
    """INCREMENTAL product maintenance: add (or re-add) one dataset to an
    existing product directory without recomputing the rest — the
    capability the reference structurally cannot have (it re-reads and
    re-concatenates every dataset on every run, bin/concatenate.py:128-139).

    Correctness rests on a decomposition argument: every pipeline step is
    DATASET-LOCAL — cell ids are dataset-prefixed (annotate_matrix), so
    the modality intersection (J1) never links cells across datasets,
    and the donor join (J2) is keyed per dataset — hence
    ``product(all datasets) == union over datasets of product({ds})``,
    and appending ds is exactly building its mini-product and merging.
    (The golden test asserts this equality against a full rebuild.)

    Physical merge, per table:
      - ``x_<modality>``: DYNAMIC partition overwrite — only the new
        dataset's partition is replaced, making re-runs IDEMPOTENT (a
        crashed append re-executes safely; a plain append mode would
        duplicate rows).  Existing partitions are untouched bytes.
      - ``obs``: small (cell metadata); rewritten as (old minus this
        dataset) ∪ new, with the lineage broken by localCheckpoint
        before overwriting the path being read.
      - ``var_<modality>``: distinct union, same rewrite.
      - ``product.json``: counts updated incrementally (old total minus
        the dataset's previous contribution plus the new one).
    """
    from ..sinks.writers import _join_uri, _write_text_uri
    import json as _json

    row = manifest.where(F.col("uuid") == dataset)
    mini = build_product(
        row,
        {mod: [df] for mod, df in new_matrices_by_modality.items()},
        tissue=tissue,
    )

    old_obs = spark.read.parquet(_join_uri(product_dir, "obs"))
    obs_kept = old_obs.where(F.col("dataset") != dataset)
    removed = old_obs.where(F.col("dataset") == dataset).count()
    new_obs = mini.obs
    added = new_obs.count()
    merged_obs = obs_kept.unionByName(new_obs).localCheckpoint()

    prev_meta = _json.loads(
        spark.read.text(_join_uri(product_dir, "product.json"))
        .agg(F.concat_ws("\n", F.collect_list("value")))
        .first()[0]
    )

    dyn_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(dyn_key, "static")
    spark.conf.set(dyn_key, "dynamic")
    try:
        for mod, (x, var) in mini.modalities.items():
            (
                x.sortWithinPartitions("dataset", "cell_id")
                .write.mode("overwrite")
                .partitionBy("dataset")
                .parquet(_join_uri(product_dir, f"x_{mod}"))
            )
            old_var = spark.read.parquet(_join_uri(product_dir, f"var_{mod}"))
            merged_var = old_var.unionByName(var).distinct().localCheckpoint()
            merged_var.write.mode("overwrite").parquet(
                _join_uri(product_dir, f"var_{mod}")
            )
    finally:
        spark.conf.set(dyn_key, prev_mode)
    merged_obs.write.mode("overwrite").parquet(_join_uri(product_dir, "obs"))

    lists = manifest.agg(
        F.sort_array(F.collect_list("uuid")).alias("uuids"),
        F.sort_array(F.collect_list("hubmap_id")).alias("hbmids"),
    ).first()
    metadata = {
        **prev_meta,
        "cell_count": int(prev_meta["cell_count"]) - removed + added,
        "dataset_uuids": list(lists.uuids),
        "dataset_hbmids": list(lists.hbmids),
        "dataset_count": int(
            prev_meta.get("dataset_count", 0)
        )
        - (1 if removed else 0)
        + (1 if added else 0),
    }
    _write_text_uri(
        spark,
        _join_uri(product_dir, "product.json"),
        _json.dumps(metadata, indent=2, sort_keys=True),
    )
    return metadata
