"""Fault-tolerant lineage-checkpoint contract (round 10).

The executor-SIGKILL chaos sweep proved ``localCheckpoint`` blocks die
with their executor and take the query down
(CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — docs/SCALE_SWEEP.md round-10
addendum).  ``spill.lineage_checkpoint`` routes every lineage
truncation through a conf switch: reliable ``df.checkpoint()`` under
``adp.checkpoint.root``, ``localCheckpoint`` otherwise.  These tests
pin the switch itself; the end-to-end recovery proof is the chaos
sweep (25 executor kills, 345/345).
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from atac_data_products_spark.spill import ckpt_eager, ckpt_lazy, lineage_checkpoint


@pytest.fixture()
def ckpt_root(spark):
    root = tempfile.mkdtemp(prefix="adp_ckpt_test_")
    spark.conf.set("adp.checkpoint.root", root)
    try:
        yield root
    finally:
        spark.conf.unset("adp.checkpoint.root")


def _demo(spark):
    return spark.range(0, 100, 1, 4).select(
        "id", (F.col("id") % 7).alias("k")
    )


def test_default_mode_is_local_checkpoint(spark):
    # no conf -> localCheckpoint: nothing may be written to any
    # checkpoint dir, and values are unchanged
    assert spark.conf.get("adp.checkpoint.root", None) is None
    out = lineage_checkpoint(_demo(spark))
    assert out.count() == 100
    assert sorted(r.k for r in out.where("id < 3").collect()) == [0, 1, 2]


def test_reliable_mode_writes_to_the_conf_root(spark, ckpt_root):
    out = _demo(spark).transform(ckpt_eager)
    assert out.count() == 100
    # eager reliable checkpoint materializes partition files under the
    # conf root (this is what survives an executor SIGKILL)
    files = glob.glob(os.path.join(ckpt_root, "**", "part-*"), recursive=True)
    assert files, "reliable mode wrote no checkpoint partitions"
    # and the data read back from the checkpoint is intact
    assert out.agg(F.sum("id")).collect()[0][0] == 4950


def test_lazy_variant_materializes_on_first_action(spark, ckpt_root):
    out = _demo(spark).transform(ckpt_lazy)
    assert out.groupBy("k").count().count() == 7


def test_values_identical_across_modes(spark, ckpt_root):
    reliable = lineage_checkpoint(_demo(spark)).collect()
    spark.conf.unset("adp.checkpoint.root")
    local = lineage_checkpoint(_demo(spark)).collect()
    spark.conf.set("adp.checkpoint.root", ckpt_root)  # fixture unsets
    assert sorted(map(tuple, reliable)) == sorted(map(tuple, local))
