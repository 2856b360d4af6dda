"""Pure-Python AVI/RIFF demuxer tests (extensions/avi.py) and the real
video demux seam built on it.

Hand-built containers exercise the chunk walk (nested LIST, rec
grouping, word alignment, audio interleave, truncation) independently
of the writer, so a shared encode/demux misunderstanding can't hide."""

from __future__ import annotations

import struct

import pytest

from atac_data_products_spark.extensions.avi import (
    demux_avi,
    encode_avi,
    is_avi,
)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (
        cid + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) & 1 else b"")
    )


def _lst(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _container(*parts: bytes) -> bytes:
    body = b"AVI " + b"".join(parts)
    return b"RIFF" + struct.pack("<I", len(body)) + body


_AVIH = _chunk(
    b"avih",
    struct.pack("<10I", 40000, 0, 0, 0, 2, 0, 1, 0, 32, 16) + b"\x00" * 16,
)
_HDRL = _lst(b"hdrl", _AVIH)


def test_roundtrip_header_and_frames():
    frames = [b"frame-one", b"fr2", b"", b"x" * 100]
    hdr, out = demux_avi(encode_avi(frames, 64, 48, fps=30))
    assert hdr["total_frames"] == 4
    assert (hdr["width"], hdr["height"]) == (64, 48)
    assert hdr["micro_sec_per_frame"] == 1_000_000 // 30
    assert [p for _, _, p in out] == frames
    assert all(s == 0 and k == "dc" for s, k, _ in out)


def test_odd_frame_word_aligned():
    # odd-sized frame forces a pad byte; the next frame must still parse
    frames = [b"abc", b"defg"]
    _, out = demux_avi(encode_avi(frames, 8, 8))
    assert [p for _, _, p in out] == frames


def test_rec_grouped_and_interleaved_audio():
    # type-1 AVIs group frames in LIST 'rec ' and interleave '01wb'
    movi = _lst(
        b"movi",
        _lst(b"rec ", _chunk(b"00dc", b"v0") + _chunk(b"01wb", b"aud0"))
        + _chunk(b"00dc", b"v1"),
    )
    hdr, out = demux_avi(_container(_HDRL, movi))
    assert out == [(0, "dc", b"v0"), (1, "wb", b"aud0"), (0, "dc", b"v1")]


def test_unknown_chunks_skipped():
    movi = _lst(b"movi", _chunk(b"00dc", b"v0"))
    junk = _chunk(b"JUNK", b"padding-bytes") + _lst(b"INFO", _chunk(b"ISFT", b"x"))
    _, out = demux_avi(_container(_HDRL, junk, movi, _chunk(b"idx1", b"\x00" * 16)))
    assert out == [(0, "dc", b"v0")]


def test_not_avi_rejected():
    assert not is_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="RIFF/'AVI '"):
        demux_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_missing_header_and_movi_rejected():
    with pytest.raises(ValueError, match="no hdrl"):
        demux_avi(_container(_lst(b"movi", _chunk(b"00dc", b"v"))))
    with pytest.raises(ValueError, match="no movi"):
        demux_avi(_container(_HDRL))


def test_truncated_rejected():
    raw = encode_avi([b"frame"], 8, 8)
    with pytest.raises(ValueError, match="truncated"):
        demux_avi(raw[: len(raw) - 3])
    short_avih = _lst(b"hdrl", _chunk(b"avih", b"\x00" * 8))
    with pytest.raises(ValueError, match="avih"):
        demux_avi(_container(short_avih, _lst(b"movi", b"")))


def test_spark_demux_video_frames(spark):
    """Distributed demux through the Arrow seam matches the payloads."""
    import hashlib

    from atac_data_products_spark.extensions.multimodal import (
        demux_video_frames,
    )

    payloads = {
        1: [b"a-frame", b"", b"ccc"],
        2: [b"solo" * 50],
    }
    media = spark.createDataFrame(
        [
            (k, bytearray(encode_avi(fs, 32, 16, fps=10)))
            for k, fs in payloads.items()
        ],
        "media_id bigint, payload binary",
    )
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in demux_video_frames(media).collect()
    }
    assert len(rows) == 4
    for mid, frames in payloads.items():
        for i, f in enumerate(frames):
            got = rows[(mid, i)]
            assert got["n_bytes"] == len(f)
            assert got["frame_md5"] == hashlib.md5(f).hexdigest()
            assert got["declared_frames"] == len(frames)
            assert (got["width"], got["height"]) == (32, 16)
            assert got["kind"] == "dc" and got["stream"] == 0


def test_spark_demux_non_avi_raises(spark):
    from atac_data_products_spark.extensions.multimodal import (
        demux_video_frames,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\nrest"))],
        "media_id bigint, payload binary",
    )
    with pytest.raises(Exception, match="not RIFF/AVI"):
        demux_video_frames(media).collect()

def test_superscript_digit_chunk_id_skipped():
    # latin-1 '\xb2\xb3' ('²³') passes str.isdigit but is NOT a stream
    # number; the demuxer must skip it as an unknown chunk ("rejected by
    # name" contract), not die in int() with a bare ValueError
    movi = _lst(
        b"movi", _chunk(b"\xb2\xb3dc", b"junk") + _chunk(b"00dc", b"v0")
    )
    _, out = demux_avi(_container(_HDRL, movi))
    assert out == [(0, "dc", b"v0")]


def test_spark_demux_null_payload_skipped(spark):
    # NULL payload has no frames (same contract as frame_sample); it
    # must not crash the executor with TypeError(bytes(None))
    from atac_data_products_spark.extensions.multimodal import (
        demux_video_frames,
    )

    media = spark.createDataFrame(
        [(1, bytearray(encode_avi([b"f0"], 8, 8))), (2, None)],
        "media_id bigint, payload binary",
    )
    rows = demux_video_frames(media).collect()
    assert [r["media_id"] for r in rows] == [1]
