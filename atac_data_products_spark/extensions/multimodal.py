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


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_md5 string"


def frame_sample(media: DataFrame, frame_bytes: int = 16, every: int = 4) -> DataFrame:
    """Frame sampling over opaque payloads: split each payload into
    fixed-size byte "frames", keep every k-th, emit a digest per kept
    frame.

    With a real codec the chunker becomes the container demuxer and the
    digest becomes decode+thumbnail — the Spark seam (mapInPandas over
    binary, exploded typed rows out) is identical.  Partial trailing
    frames are kept (real demuxers emit them too).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = (len(raw) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    ids.append(mid)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(raw[i * frame_bytes : (i + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return media.select("media_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int):
    """Image resize — stubbed (no imaging library in this container).
    Signature and schema are the real seam; the body would be a Pillow
    call per payload inside the same mapInPandas shape as frame_sample."""
    raise NotImplementedError(
        "image resize requires an imaging library not shipped in this "
        "container; frame_sample demonstrates the identical Spark plumbing"
    )


def decode_media(media: DataFrame, target: str = "rgb_frames"):
    """Real codec decode — stubbed: the image/audio libraries are not in
    this container.  The seam (signature, schema, batching) matches
    byte_features exactly; swap the inner function when Pillow/ffmpeg
    are available."""
    raise NotImplementedError(
        "media codec decode requires image/audio libraries not shipped in "
        "this container; use byte_features for the plumbing-equivalent path"
    )
