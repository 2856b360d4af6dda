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
from ..spill import ckpt_eager as _ckpt_eager

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
        # var carries each dataset's feature CONTRIBUTION (not just the
        # distinct feature set): partitioned by dataset on disk, a
        # re-added dataset's stale features are subtractable the same
        # way obs rows are — dynamic partition overwrite replaces
        # exactly that dataset's contribution (append_dataset_to_product).
        # Restricted to MANIFESTED datasets (reference parity: only
        # manifest rows are read at all, bin/concatenate.py:121-136) but
        # NOT to surviving cells (anndata outer concat keeps a manifested
        # dataset's features even when intersect_obs drops its cells).
        # The product-level feature list is the distinct feature_id view.
        var = (
            unioned[mod]
            .join(
                F.broadcast(manifest.select(F.col("uuid").alias("dataset"))),
                "dataset",
                "left_semi",
            )
            .select("dataset", "feature_id")
            .distinct()
            .withColumn("modality", F.lit(mod))
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

    The decomposition requires the mini-build to see the PRODUCT's
    modality set: a dataset missing one of the product's modalities
    contributes zero cells under intersect-obs (J1), so its append
    degenerates to a dataset REMOVAL; a dataset introducing a modality
    the product lacks would shrink every OTHER dataset's cell set in a
    rebuild — not expressible incrementally — and raises ValueError.

    Physical merge, per table:
      - explicit DELETE of the dataset's old ``dataset=<ds>`` partitions
        in every modality's x/var first (metadata-only FS deletes):
        dynamic overwrite alone cannot remove a partition it writes no
        rows into (feature-dropping re-adds, empty contributions,
        vanished datasets).
      - ``x_<modality>``: DYNAMIC partition overwrite — only the new
        dataset's partition is written, making re-runs IDEMPOTENT (a
        crashed append re-executes safely; a plain append mode would
        duplicate rows).  Existing partitions are untouched bytes.
      - ``var_<modality>``: same — var holds per-dataset feature
        CONTRIBUTIONS (build_product), so a re-added dataset whose new
        version dropped features leaves no stale var rows.
      - ``obs``: small (cell metadata); rewritten as (old minus this
        dataset) ∪ new, with the lineage broken by localCheckpoint
        before overwriting the path being read.
      - ``product.json``: cell_count updated incrementally;
        dataset_uuids / dataset_hbmids / dataset_count derived from the
        datasets ACTUALLY PRESENT in the merged obs (manifest filtered
        to them), so the metadata can never list datasets absent from
        the data nor disagree with dataset_count.
    """
    from ..sinks.writers import _join_uri, _write_text_uri
    import json as _json

    prev_meta = _json.loads(
        spark.read.text(_join_uri(product_dir, "product.json"))
        .agg(F.concat_ws("\n", F.collect_list("value")))
        .first()[0]
    )
    product_mods = set(prev_meta.get("modalities", []))
    new_mods = set(new_matrices_by_modality)
    extra = new_mods - product_mods
    if product_mods and extra:
        raise ValueError(
            f"dataset {dataset!r} introduces modalities {sorted(extra)} the "
            f"product lacks; under intersect-obs semantics this changes every "
            f"other dataset's cell set — rebuild the product instead"
        )

    if product_mods and (product_mods - new_mods):
        # missing a product modality → zero intersected cells: removal
        mini_modalities: dict[str, tuple[DataFrame, DataFrame]] = {}
        new_obs = None
        added = 0
    else:
        row = manifest.where(F.col("uuid") == dataset)
        mini = build_product(
            row,
            {mod: [df] for mod, df in new_matrices_by_modality.items()},
            tissue=tissue,
        )
        mini_modalities = mini.modalities
        new_obs = mini.obs
        added = new_obs.count()

    old_obs = spark.read.parquet(_join_uri(product_dir, "obs"))
    obs_kept = old_obs.where(F.col("dataset") != dataset)
    removed = old_obs.where(F.col("dataset") == dataset).count()
    merged_obs = (
        obs_kept.unionByName(new_obs) if new_obs is not None else obs_kept
    ).transform(_ckpt_eager)

    # drop the dataset's prior contribution everywhere before writing
    # the new one — partition-directory deletes, no other bytes touched
    for mod in product_mods | new_mods:
        for table in (f"x_{mod}", f"var_{mod}"):
            _delete_uri(
                spark, _join_uri(product_dir, table, f"dataset={dataset}")
            )

    dyn_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(dyn_key, "static")
    spark.conf.set(dyn_key, "dynamic")
    try:
        for mod, (x, var) in mini_modalities.items():
            (
                x.sortWithinPartitions("dataset", "cell_id")
                .write.mode("overwrite")
                .partitionBy("dataset")
                .parquet(_join_uri(product_dir, f"x_{mod}"))
            )
            (
                var.write.mode("overwrite")
                .partitionBy("dataset")
                .parquet(_join_uri(product_dir, f"var_{mod}"))
            )
    finally:
        spark.conf.set(dyn_key, prev_mode)
    merged_obs.write.mode("overwrite").parquet(_join_uri(product_dir, "obs"))

    # metadata lists derive from the data actually present: filter the
    # manifest to the merged obs' datasets so uuids/hbmids/count agree
    # with the product by construction
    present = [
        r.dataset for r in merged_obs.select("dataset").distinct().collect()
    ]
    lists = manifest.where(F.col("uuid").isin(present)).agg(
        F.sort_array(F.collect_list("uuid")).alias("uuids"),
        F.sort_array(F.collect_list("hubmap_id")).alias("hbmids"),
    ).first()
    metadata = {
        **prev_meta,
        "cell_count": int(prev_meta["cell_count"]) - removed + added,
        "dataset_uuids": list(lists.uuids),
        "dataset_hbmids": list(lists.hbmids),
        "dataset_count": len(lists.uuids),
        "modalities": sorted(product_mods | set(mini_modalities)),
    }
    _write_text_uri(
        spark,
        _join_uri(product_dir, "product.json"),
        _json.dumps(metadata, indent=2, sort_keys=True),
    )
    return metadata


def _delete_uri(spark, path: str) -> None:
    """Recursively delete `path` via the Hadoop FileSystem for its
    scheme (no-op if absent) — works for file://, hdfs://, s3a:// alike."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)
