"""Pure-numpy media codecs (functions/media_codecs.py): encode/decode
round trips, header edge cases the netpbm and RIFF specs require, and
the nearest-neighbor index convention the SQL oracles mirror."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datafusion_catalogprovider_glue_spark.functions.media_codecs import (
    decode_ppm,
    decode_ppm_frames,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    resize_nearest,
)


def _rgb(w, h, seed=0):
    return ((seed + np.arange(w * h * 3)) % 256).astype(np.uint8).reshape(h, w, 3)


def test_ppm_round_trip_p6():
    arr = _rgb(13, 7, seed=42)
    decoded, end = decode_ppm(encode_ppm(arr))
    assert end == len(encode_ppm(arr))
    np.testing.assert_array_equal(decoded, arr)


def test_ppm_round_trip_p5_grayscale():
    arr = (np.arange(35) % 256).astype(np.uint8).reshape(5, 7)
    decoded, _ = decode_ppm(encode_ppm(arr))
    np.testing.assert_array_equal(decoded, arr)


def test_ppm_header_comments_and_whitespace():
    """The netpbm spec allows '#' comments and arbitrary whitespace
    between header tokens — a conformant decoder must skip both."""
    arr = _rgb(3, 2)
    raw = b"P6 # a comment\n# another\n  3\t2\n# last\n255\n" + arr.tobytes()
    decoded, _ = decode_ppm(raw)
    np.testing.assert_array_equal(decoded, arr)


def test_ppm_truncated_raster_raises():
    arr = _rgb(4, 4)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(arr)[:-5])


def test_ppm_16bit_maxval_refused():
    with pytest.raises(ValueError, match="8-bit"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_ppm_frame_stream_exact_boundaries():
    """Concatenated frames with different content split exactly —
    raster bytes that look like headers must not confuse the parser."""
    frames = [_rgb(5, 3, seed=k * 17) for k in range(4)]
    blob = b"".join(encode_ppm(f) for f in frames)
    out = decode_ppm_frames(blob)
    assert len(out) == 4
    for got, want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_wav_round_trip():
    s = (np.arange(-300, 300, 7)).astype(np.int16)
    rate, decoded = decode_wav_pcm16(encode_wav_pcm16(s, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(decoded, s)


def test_wav_skips_unknown_chunks():
    """Real writers emit LIST/fact chunks before data; the chunk walk
    must skip them by declared size (including odd-size padding)."""
    s = np.array([1, -2, 3], dtype=np.int16)
    raw = encode_wav_pcm16(s, 8000)
    # splice an unknown 3-byte chunk (padded to 4) after fmt
    fmt_end = raw.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    patched = (
        raw[:4]
        + struct.pack("<I", struct.unpack("<I", raw[4:8])[0] + len(extra))
        + raw[8:fmt_end]
        + extra
        + raw[fmt_end:]
    )
    rate, decoded = decode_wav_pcm16(patched)
    assert rate == 8000
    np.testing.assert_array_equal(decoded, s)


def test_wav_stereo_refused():
    s = np.array([0, 1], dtype=np.int16)
    raw = bytearray(encode_wav_pcm16(s, 8000))
    fmt_body = raw.index(b"fmt ") + 8
    struct.pack_into("<H", raw, fmt_body + 2, 2)  # channels = 2
    with pytest.raises(ValueError, match="mono"):
        decode_wav_pcm16(bytes(raw))


def test_resize_nearest_floor_convention():
    """dst(y,x) = src(y*h//H, x*w//W) — the exact convention the
    multimodal_resize oracle recomputes in SQL."""
    arr = _rgb(8, 6, seed=5)
    small = resize_nearest(arr, 4, 3)
    for y in range(3):
        for x in range(4):
            np.testing.assert_array_equal(
                small[y, x], arr[(y * 6) // 3, (x * 8) // 4]
            )


def test_resize_upsample():
    arr = _rgb(2, 2)
    big = resize_nearest(arr, 4, 4)
    assert big.shape == (4, 4, 3)
    np.testing.assert_array_equal(big[0, 0], arr[0, 0])
    np.testing.assert_array_equal(big[3, 3], arr[1, 1])


# ---------------------------------------------------------------------------
# property tests: any raster/sample vector round-trips byte-exactly
# ---------------------------------------------------------------------------

import hypothesis.strategies as st
from hypothesis import given, settings


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**32 - 1),
    gray=st.booleans(),
)
def test_ppm_round_trip_property(w, h, seed, gray):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    decoded, end = decode_ppm(encode_ppm(arr))
    assert end == len(encode_ppm(arr))
    np.testing.assert_array_equal(decoded, arr)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(0, 2000),
    seed=st.integers(0, 2**32 - 1),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
)
def test_wav_round_trip_property(n, seed, rate):
    rng = np.random.default_rng(seed)
    s = rng.integers(-(2**15), 2**15, size=n).astype(np.int16)
    got_rate, decoded = decode_wav_pcm16(encode_wav_pcm16(s, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(decoded, s)


@settings(max_examples=100, deadline=None)
@given(
    frames=st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12), st.integers(0, 255)),
        min_size=1,
        max_size=6,
    )
)
def test_ppm_frame_stream_property(frames):
    """Concatenated frames of VARYING dimensions split exactly — the
    parser must derive each frame's length from its own header."""
    arrs = [
        ((np.arange(w * h * 3) + s) % 256).astype(np.uint8).reshape(h, w, 3)
        for w, h, s in frames
    ]
    out = decode_ppm_frames(b"".join(encode_ppm(a) for a in arrs))
    assert len(out) == len(arrs)
    for got, want in zip(out, arrs):
        np.testing.assert_array_equal(got, want)
