"""TSV manifest scan (SURVEY.md §2.1 scan_tsv_manifest).

The reference reads its uuid manifest with ``pd.read_csv(sep="\\t",
dtype=str)`` (bin/concatenate.py:121) — header row, every column a
string.  The engine mirrors that contract with an explicit all-string
schema (no inference pass over the data — one less full read at scale)
and drops the positional-index artifact column ``Unnamed: 0`` that the
reference writes by accident and drops on read (make_uuids_tsv.py:164,
bin/concatenate.py:108).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

MANIFEST_COLUMNS = [
    "uuid",
    "hubmap_id",
    "age",
    "sex",
    "height",
    "weight",
    "bmi",
    "cause_of_death",
    "race",
]


def manifest_schema(extra_index_col: bool = False) -> StructType:
    cols = (["Unnamed: 0"] if extra_index_col else []) + MANIFEST_COLUMNS
    return StructType([StructField(c, StringType(), True) for c in cols])


def scan_tsv_manifest(
    spark: SparkSession, path: str, with_index_artifact: bool = True
) -> DataFrame:
    """Read a reference-shaped manifest TSV: header, all-string, index
    artifact dropped (project_drop_col, bin/concatenate.py:108)."""
    df = (
        spark.read.options(sep="\t", header=True)
        .schema(manifest_schema(extra_index_col=with_index_artifact))
        .csv(path)
    )
    if with_index_artifact:
        df = df.drop("Unnamed: 0")
    return df
