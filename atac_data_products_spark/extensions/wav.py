"""Minimal pure-Python WAV (RIFF/WAVE) PCM codec (stdlib struct + numpy).

Closes the multimodal AUDIO decode gap the same way extensions/png.py
closed the image one: the container ships no audio library and installs
are prohibited, but canonical PCM WAVE needs nothing beyond byte
arithmetic — a RIFF chunk walk, a ``fmt `` parse, and a ``data``
reinterpret.  Format per the public RIFF/WAVE specification (Microsoft
& IBM, *Multimedia Programming Interface and Data Specifications 1.0*,
1991; also RFC 2361's WAVE registry): a little-endian RIFF container
whose chunks are word-aligned (odd-sized chunks carry one pad byte),
with a mandatory ``fmt `` chunk ahead of ``data``.

Supported (what every mainstream writer emits at default settings):
wFormatTag 1 (integer PCM), 8-bit unsigned and 16-bit signed samples,
any channel count, any sample rate, unknown chunks (LIST/INFO, fact,
cue) skipped by the walk.  Rejected BY NAME, never misread: non-PCM
format tags (IEEE float 3, A-law 6, mu-law 7, EXTENSIBLE 0xFFFE),
other bit depths, truncated containers.

The codec runs inside the same Arrow-batched mapInPandas seam as
extensions/multimodal.py — parallelism is across payloads (one task
decodes many rows), the axis that scales at 100 TB of media.  Unlike
PNG there is no per-scanline sequential dependency: the sample block
is a single vectorized ``np.frombuffer`` reinterpret.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_NAMES = {
    0x0003: "IEEE float (wFormatTag 3)",
    0x0006: "A-law (wFormatTag 6)",
    0x0007: "mu-law (wFormatTag 7)",
    0xFFFE: "WAVE_FORMAT_EXTENSIBLE (0xFFFE)",
}


def is_wav(raw: bytes) -> bool:
    return len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int32 array of shape (n_frames, channels),
    sample_rate).  8-bit samples (unsigned per spec) are re-centered to
    signed by subtracting 128 so both depths share a zero baseline."""
    if not is_wav(raw):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid, size = struct.unpack_from("<4sI", raw, pos)
        body = raw[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes, "
                f"{len(body)} present"
            )
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"truncated WAV fmt chunk ({size} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            break  # fmt must precede data; nothing after data matters
    if fmt is None:
        raise ValueError("WAV has no fmt chunk")
    if data is None:
        raise ValueError("WAV has no data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if tag != 1:
        name = _FMT_NAMES.get(tag, f"wFormatTag {tag}")
        raise NotImplementedError(
            f"WAV codec supports integer PCM only; payload is {name}"
        )
    if bits not in (8, 16):
        raise NotImplementedError(
            f"WAV codec supports 8/16-bit PCM only; payload is {bits}-bit"
        )
    if channels < 1:
        raise ValueError("WAV declares zero channels")
    width = bits // 8
    frame_bytes = width * channels
    n_frames = len(data) // frame_bytes
    usable = data[: n_frames * frame_bytes]
    if bits == 16:
        samples = np.frombuffer(usable, dtype="<i2").astype(np.int32)
    else:
        samples = np.frombuffer(usable, dtype="u1").astype(np.int32) - 128
    return samples.reshape(n_frames, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(n_frames, channels) integer array -> canonical 44-byte-header
    WAV bytes.  Deterministic output (fixed chunk order, no metadata
    chunks) so encoded payloads are byte-stable across runs."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2:
        raise ValueError("samples must be (n_frames, channels)")
    n_frames, channels = arr.shape
    if bits == 16:
        payload = arr.astype("<i2").tobytes()
    elif bits == 8:
        payload = (arr.astype(np.int32) + 128).astype("u1").tobytes()
    else:
        raise NotImplementedError(f"encode_wav supports 8/16-bit PCM, not {bits}")
    width = bits // 8
    block_align = width * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
