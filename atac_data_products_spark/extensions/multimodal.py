"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns
with a typed metadata struct alongside.  Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched mapInPandas stages — each
batch a pandas frame of (id, payload bytes), output a typed feature
frame.  The media codec libraries are NOT in this container, so the
codec call is stubbed (`NotImplementedError`) while everything Spark
owns — schema, batch shape, partitioning, UDF signature — is real and
tested via the deterministic byte-level feature path.

Scale: payloads never pass through the driver; batches flow
executor-side via Arrow.  Partitioning by content-size bands keeps
decode tasks balanced (one 4K video next to a thumbnail is a straggler
otherwise).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, declared_bytes bigint"
)
FEATURE_SCHEMA = "media_id bigint, byte_len bigint, content_md5 string"


def with_payload(df: DataFrame, id_col: str, text_col: str, media_type: str = "text/plain") -> DataFrame:
    """Pack a column into the opaque-payload layout (binary + metadata)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(F.col(text_col)).cast("bigint").alias("declared_bytes"),
    )


def byte_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level features via Arrow-batched mapInPandas —
    the working stand-in for a codec decode stage."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "content_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


def decode_media(media: DataFrame, target: str = "rgb_frames"):
    """Real codec decode — stubbed: the image/audio libraries are not in
    this container.  The seam (signature, schema, batching) matches
    byte_features exactly; swap the inner function when Pillow/ffmpeg
    are available."""
    raise NotImplementedError(
        "media codec decode requires image/audio libraries not shipped in "
        "this container; use byte_features for the plumbing-equivalent path"
    )
