"""Binary-file ingestion boundary (SURVEY.md §2.1 scan_h5ad, §1.4).

The reference loads AnnData HDF5 files eagerly on one node
(anndata.read_h5ad, bin/concatenate.py:62).  Spark has no native h5ad
source, so ingestion is the one place this engine runs Python per file —
and it is structured for scale:

  spark.read.format("binaryFile").load(glob)      # distributed file scan
    -> mapInPandas(decoder)                        # Arrow-batched decode
    -> long/COO rows (dataset, barcode, feature_id, value)
    -> write.partitionBy("dataset").parquet(...)   # canonical storage

Each file is decoded by exactly one task, files spread across executors;
decode output streams out as Arrow record batches (never one giant pandas
frame per node, unlike the reference's materialize-everything pattern at
bin/concatenate.py:128-136).

The actual HDF5 decode requires h5py/anndata, which this container does
not ship — `decode_h5ad_bytes` is therefore an import-gated stub with the
real signature; `decode_parquet_bytes` is a fully working decoder for the
same plumbing (used by tests and the scan_h5ad correctness query), since
pyarrow IS available.
"""

from __future__ import annotations

import io
import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

COO_SCHEMA = "dataset string, barcode string, feature_id string, value double"


def decode_h5ad_bytes(content: bytes, dataset: str) -> Iterator[pd.DataFrame]:
    """Decode one h5ad file's AnnData X matrix into COO chunks.

    Yields (dataset, barcode, feature_id, value) chunks, one per CSR row
    block, so a 10 GB matrix never materializes as one pandas frame.
    """
    try:
        import anndata  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container lacks anndata
        raise NotImplementedError(
            "h5ad decode requires the 'anndata' package (not shipped in this "
            "container); the Spark-side plumbing is exercised via "
            "decode_parquet_bytes instead"
        ) from exc
    import scipy.sparse as sp

    adata = anndata.read_h5ad(io.BytesIO(content))  # pragma: no cover
    x = sp.csr_matrix(adata.X)  # pragma: no cover
    barcodes = adata.obs.index.to_numpy()  # pragma: no cover
    features = adata.var.index.to_numpy()  # pragma: no cover
    block = 10_000  # pragma: no cover
    for start in range(0, x.shape[0], block):  # pragma: no cover
        sub = x[start : start + block].tocoo()
        yield pd.DataFrame(
            {
                "dataset": dataset,
                "barcode": barcodes[start + sub.row],
                "feature_id": features[sub.col],
                "value": sub.data.astype("float64"),
            }
        )


def ingest_binary_files(
    spark: SparkSession,
    path_glob: str,
    decoder: Callable[[bytes, str], Iterator[pd.DataFrame]],
    schema: str,
) -> DataFrame:
    """Distributed binary-file ingestion: binaryFile scan → Arrow-batched
    per-file decode.  `dataset` provenance derives from the file path
    (parent-directory uuid in the reference layout, bin/concatenate.py:59)."""
    binary = spark.read.format("binaryFile").load(path_glob)

    def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                dataset = os.path.basename(os.path.dirname(row["path"])) or os.path.splitext(
                    os.path.basename(row["path"])
                )[0]
                yield from decoder(row["content"], dataset)

    return binary.select("path", "content").mapInPandas(decode_partition, schema=schema)


def decode_parquet_bytes(columns: list[str] | None = None):
    """Working decoder for parquet-bytes payloads (pyarrow is shipped).

    Demonstrates the identical mapInPandas ingestion path with a format
    decodable in this container; yields record-batch-sized chunks.
    """
    import pyarrow.parquet as pq

    def _decode(content: bytes, dataset: str) -> Iterator[pd.DataFrame]:
        table = pq.read_table(io.BytesIO(content), columns=columns)
        for batch in table.to_batches(max_chunksize=65536):
            yield batch.to_pandas()

    return _decode
