"""Minimal pure-Python AVI (RIFF) demuxer + writer (stdlib struct only).

Upgrades the VIDEO plumbing from a byte-chunk stand-in to a real
container demux, the same pattern as extensions/png.py (image codec)
and extensions/wav.py (audio codec): AVI is RIFF — the identical
little-endian word-aligned chunk grammar as WAVE, plus nested ``LIST``
chunks — per the public Microsoft AVI RIFF File Reference (and the
OpenDML AVI extensions).  Layout: ``RIFF('AVI ' LIST('hdrl' avih ...)
LIST('movi' {'##dc'|'##db'|'##wb'} ...) [idx1])`` where ``##`` is the
zero-padded stream number, ``dc/db`` compressed/uncompressed video,
``wb`` audio.

What this module does and does not do, honestly: it DEMUXES — walks
the container, returns the main header (frame count, dimensions,
frame interval) and every movi payload tagged by stream and type.
Frame payloads remain opaque compressed bytes; DECODING them (MJPEG,
DV, ...) needs codec libraries not in this container and raises by
name downstream (extensions/multimodal.py).  That split mirrors real
pipelines, where demux and decode are separate stages — and demux is
the stage that determines the Spark seam (frame boundaries, per-frame
rows, batch shape).

Rejected by name, never misread: non-AVI RIFF forms, containers with
no ``hdrl``/``movi``, truncated chunks.
"""

from __future__ import annotations

import struct

AVI_HEADER_FIELDS = (
    "micro_sec_per_frame",
    "max_bytes_per_sec",
    "padding_granularity",
    "flags",
    "total_frames",
    "initial_frames",
    "streams",
    "suggested_buffer_size",
    "width",
    "height",
)


def is_avi(raw: bytes) -> bool:
    return len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"AVI "


def _walk(raw: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size, list_type) over a chunk
    span; RIFF chunks are word-aligned (odd sizes carry a pad byte)."""
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", raw, pos)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"truncated AVI: chunk {cid!r} declares {size} bytes, "
                f"{end - body} present"
            )
        if cid == b"LIST":
            yield cid, body + 4, size - 4, raw[body : body + 4]
        else:
            yield cid, body, size, None
        pos = body + size + (size & 1)


def demux_avi(raw: bytes) -> tuple[dict, list[tuple[int, str, bytes]]]:
    """AVI bytes -> (main header dict, [(stream_id, kind, payload)]).

    ``kind`` is the two-char chunk-type suffix: ``dc`` compressed
    video, ``db`` uncompressed video, ``wb`` audio.  Frames are
    returned in container order — the presentation order for type-1
    AVI, which is what a frame-sampling stage needs."""
    if not is_avi(raw):
        raise ValueError("not an AVI (bad RIFF/'AVI ' signature)")
    header: dict | None = None
    frames: list[tuple[int, str, bytes]] = []
    saw_movi = False
    for cid, body, size, ltype in _walk(raw, 12, len(raw)):
        if cid != b"LIST":
            continue
        if ltype == b"hdrl":
            for hcid, hbody, hsize, _ in _walk(raw, body, body + size):
                if hcid == b"avih":
                    if hsize < 40:
                        raise ValueError(
                            f"truncated AVI avih chunk ({hsize} bytes)"
                        )
                    vals = struct.unpack_from("<10I", raw, hbody)
                    header = dict(zip(AVI_HEADER_FIELDS, vals))
        elif ltype == b"movi":
            saw_movi = True
            for mcid, mbody, msize, mltype in _walk(raw, body, body + size):
                if mcid == b"LIST" and mltype == b"rec ":
                    span = list(_walk(raw, mbody, mbody + msize))
                else:
                    span = [(mcid, mbody, msize, mltype)]
                for fcid, fbody, fsize, _ in span:
                    tag = fcid.decode("latin-1")
                    # isdecimal, not isdigit: under latin-1, isdigit also
                    # accepts superscripts ('²'), so a hostile id like
                    # b'\xb2\xb3dc' would reach int() and raise a bare
                    # ValueError instead of being skipped as a non-frame
                    # chunk.  Latin-1 isdecimal is exactly ASCII 0-9.
                    if tag[:2].isdecimal() and tag[2:] in ("dc", "db", "wb"):
                        frames.append(
                            (int(tag[:2]), tag[2:], raw[fbody : fbody + fsize])
                        )
    if header is None:
        raise ValueError("AVI has no hdrl/avih header")
    if not saw_movi:
        raise ValueError("AVI has no movi list")
    return header, frames


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    kind: str = "dc",
    stream: int = 0,
) -> bytes:
    """Single-video-stream AVI writer (deterministic bytes: fixed chunk
    order, no idx1).  Exists for fixtures and round-trip tests — the
    demuxer is the production path."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<10I", 1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, 0, width, height
    ) + b"\x00" * 16  # 4 reserved dwords
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"\x00" * 4, 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0, 0, 0, 0, width, height,
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"\x00" * 4,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    tag = f"{stream:02d}{kind}".encode()
    movi = lst(b"movi", b"".join(chunk(tag, f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
