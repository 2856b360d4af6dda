"""Adversarial-byte fuzz for the RIFF media parsers (wav.py, avi.py).

Contract under fuzz: arbitrary bytes, truncations, and bit-flipped
valid containers must either decode or raise ValueError /
NotImplementedError with a named reason — NEVER hang, loop, or leak a
raw struct.error / IndexError.  At 100 TB a partial upload or corrupt
object WILL hit the distributed decode seam; the executor-side
contract is a clean per-file error (same contract as
test_h5_truncated_bytes_raise_not_misread)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from atac_data_products_spark.extensions.avi import demux_avi, encode_avi
from atac_data_products_spark.extensions.wav import decode_wav, encode_wav

ALLOWED = (ValueError, NotImplementedError)


@given(raw=st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_wav_random_bytes_never_crash(raw):
    try:
        decode_wav(raw)
    except ALLOWED:
        pass


@given(raw=st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_avi_random_bytes_never_crash(raw):
    try:
        demux_avi(raw)
    except ALLOWED:
        pass


def _wav_fixture() -> bytes:
    rng = np.random.RandomState(11)
    return encode_wav(rng.randint(-3000, 3000, size=(37, 2)), 8000)


def _avi_fixture() -> bytes:
    return encode_avi([b"frame-%d" % i * (i + 1) for i in range(5)], 16, 8)


@given(
    pos=st.integers(min_value=0, max_value=len(_wav_fixture()) - 1),
    bit=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=150, deadline=None)
def test_wav_bit_flip_never_crashes(pos, bit):
    raw = bytearray(_wav_fixture())
    raw[pos] ^= 1 << bit
    try:
        samples, rate = decode_wav(bytes(raw))
        # decoded despite the flip: shape invariants must still hold
        assert samples.ndim == 2 and rate >= 0
    except ALLOWED:
        pass


@given(
    pos=st.integers(min_value=0, max_value=len(_avi_fixture()) - 1),
    bit=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=150, deadline=None)
def test_avi_bit_flip_never_crashes(pos, bit):
    raw = bytearray(_avi_fixture())
    raw[pos] ^= 1 << bit
    try:
        header, frames = demux_avi(bytes(raw))
        assert isinstance(header, dict) and isinstance(frames, list)
    except ALLOWED:
        pass


@given(frac=st.floats(0.0, 0.999))
@settings(max_examples=80, deadline=None)
def test_wav_truncation_never_crashes(frac):
    raw = _wav_fixture()
    cut = raw[: int(len(raw) * frac)]
    try:
        decode_wav(cut)
    except ALLOWED:
        pass


@given(frac=st.floats(0.0, 0.999))
@settings(max_examples=80, deadline=None)
def test_avi_truncation_never_crashes(frac):
    raw = _avi_fixture()
    cut = raw[: int(len(raw) * frac)]
    try:
        demux_avi(cut)
    except ALLOWED:
        pass


def test_wav_zero_channel_header_rejected():
    # a fmt chunk claiming 0 channels must not divide-by-zero
    import struct

    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    raw = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="zero channels"):
        decode_wav(raw)
