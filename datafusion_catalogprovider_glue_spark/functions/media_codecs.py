"""Pure-numpy media codecs for container-feasible formats.

Real encoders/decoders for two public formats that need no external
library — the decode step of the multimodal operators runs on REAL
pixels/samples through these, not a stand-in:

- **PPM/PGM** (netpbm P6/P5, https://netpbm.sourceforge.net/doc/ppm.html):
  ASCII header (magic, whitespace/comments, width height maxval) + raw
  raster.  The decoder handles comments, arbitrary whitespace, and
  trailing bytes (so concatenated frames — a raw "video" — parse
  frame by frame).
- **WAV PCM16** (RIFF/WAVE, the Microsoft/IBM spec): chunked RIFF
  container walked chunk-by-chunk to find ``fmt `` and ``data`` —
  unknown chunks are skipped by their declared size, as the spec
  requires.

Swapping in JPEG/FLAC support means adding a codec here; the operator
dataflow (Arrow batches of binary payloads → numpy kernel → declared
schema) does not change.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# netpbm P5 (grayscale) / P6 (RGB)
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 → P6, or (h, w) uint8 → P5."""
    if arr.dtype != np.uint8:
        raise ValueError(f"netpbm raster must be uint8, got {arr.dtype}")
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"unsupported raster shape {arr.shape}")
    h, w = arr.shape[:2]
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _read_header_token(data: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited header token, skipping '#' comments."""
    n = len(data)
    while pos < n:
        c = data[pos : pos + 1]
        if c == b"#":
            while pos < n and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not data[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("netpbm: truncated header")
    return data[start:pos], pos


def decode_ppm(data: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode one P5/P6 image starting at ``offset``.

    Returns (raster, next_offset): (h, w, 3) uint8 for P6, (h, w) for
    P5; ``next_offset`` points past the raster so concatenated frames
    decode in sequence.
    """
    magic, pos = _read_header_token(data, offset)
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"netpbm: bad magic {magic!r}")
    w_tok, pos = _read_header_token(data, pos)
    h_tok, pos = _read_header_token(data, pos)
    max_tok, pos = _read_header_token(data, pos)
    w, h, maxval = int(w_tok), int(h_tok), int(max_tok)
    if not (0 < maxval < 256):
        raise ValueError(f"netpbm: only 8-bit rasters (maxval {maxval})")
    pos += 1  # exactly ONE whitespace byte separates header and raster
    channels = 3 if magic == b"P6" else 1
    count = w * h * channels
    if len(data) - pos < count:
        raise ValueError("netpbm: truncated raster")
    raster = np.frombuffer(data, dtype=np.uint8, count=count, offset=pos)
    shape = (h, w, 3) if magic == b"P6" else (h, w)
    return raster.reshape(shape), pos + count


def decode_ppm_frames(data: bytes) -> list[np.ndarray]:
    """Decode back-to-back netpbm images (a raw frame stream)."""
    frames, pos = [], 0
    while pos < len(data):
        arr, pos = decode_ppm(data, pos)
        frames.append(arr)
    return frames


def resize_nearest(arr: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Nearest-neighbor resize: dst(y, x) = src(y*h//dst_h, x*w//dst_w)
    — the floor-index convention the SQL oracle mirrors."""
    h, w = arr.shape[:2]
    ys = (np.arange(dst_h) * h) // dst_h
    xs = (np.arange(dst_w) * w) // dst_w
    return arr[np.ix_(ys, xs)]


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM signed 16-bit little-endian)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Mono PCM16 WAV from an int16 sample vector."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE container → (sample_rate, int16 samples).

    Walks the chunk list (skipping unknown chunks by declared size,
    honoring the spec's even-byte chunk padding) rather than assuming
    a fixed 44-byte header — real writers emit LIST/fact chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE file")
    pos, n = 12, len(data)
    rate, samples = None, None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", data, body)
            (bits,) = struct.unpack_from("<H", data, body + 14)
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise ValueError(
                    f"wav: only mono PCM16 (fmt={audio_fmt}, "
                    f"bits={bits}, ch={channels})"
                )
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)  # chunks pad to even byte counts
    if rate is None or samples is None:
        raise ValueError("wav: missing fmt or data chunk")
    return rate, samples
