"""Delta Lake DELETION VECTOR sidecar codec (PROTOCOL.md §Deletion
Vectors) — pure Python, same discipline as the Avro/Iceberg readers.

The reference reads DV-bearing tables through the deltalake crate
(glue.rs:214-240 registers delta tables; the crate applies DVs
internally).  delta-spark is not available in this environment, so
this module implements the OPEN on-disk format directly:

* **Descriptor** (the ``deletionVector`` struct on add/remove
  actions): ``storageType`` of ``u`` (relative file, path derived
  from a Z85-encoded UUID), ``p`` (absolute path), or ``i`` (bitmap
  inlined in the log, Z85-encoded); plus ``offset`` / ``sizeInBytes``
  / ``cardinality``.
* **File layout** (types u/p): 1-byte format version (= 1), then at
  ``offset`` a 4-byte BIG-endian length (== sizeInBytes), the DV
  data, and a 4-byte big-endian CRC-32 of the data.
* **DV data**: 4-byte LITTLE-endian magic 1681511377, then a 64-bit
  RoaringBitmapArray in "portable" form — an 8-byte LE bitmap count,
  then per index (= the high 32 bits of the row index) one standard
  32-bit RoaringBitmap (RoaringFormatSpec: cookie, per-container
  key/cardinality headers, then array / bitset / run containers).

Deleted row indexes are positions within the data file's row order —
exactly what Spark's ``_metadata.row_index`` exposes — so applying a
DV is the same (file, row_index) anti join as Iceberg positional
deletes (sources/iceberg.py).

The encoder half exists for fixtures/tests (writing a DV the decoder
then must read back byte-for-byte) and is format-faithful: array
containers under the 4096-cardinality cutover, bitset containers
above it.
"""

from __future__ import annotations

import os
import struct
import uuid
import zlib

from datafusion_catalogprovider_glue_spark.errors import DeltaError

# --- Z85 (ZeroMQ base-85, the variant Delta uses for UUIDs and
# --- inline DVs)
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}

DV_MAGIC = 1681511377
DV_FORMAT_VERSION = 1
_COOKIE_RUN = 12347
_COOKIE_NO_RUN = 12346
_ARRAY_CUTOVER = 4096


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise DeltaError(f"z85 payload length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise DeltaError(f"invalid z85 character {c!r}")
            acc = acc * 85 + _Z85_INDEX[c]
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise DeltaError(f"z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out += reversed(chunk)
    return "".join(out)


# --- 32-bit RoaringBitmap (standard portable serialization) ---------


def _parse_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard-format 32-bit RoaringBitmap starting at
    ``pos``; return (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<i", data, pos)
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n_containers = (cookie >> 16) + 1
        pos += 4
        flag_bytes = (n_containers + 7) // 8
        run_flags = data[pos : pos + flag_bytes]
        pos += flag_bytes
        has_offsets = n_containers >= 4
    elif cookie == _COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<i", data, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n_containers + 7) // 8)
        has_offsets = True
    else:
        raise DeltaError(f"unrecognized roaring bitmap cookie {cookie}")
    headers = []
    for i in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", data, pos)
        headers.append((key, card_m1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * n_containers  # offsets are redundant for a full scan
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif card <= _ARRAY_CUTOVER:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (w_i << 6) + low.bit_length() - 1)
                    w &= w - 1
    return values, pos


def _serialize_roaring32(values: list[int]) -> bytes:
    """Standard no-run-container serialization (cookie 12346): array
    containers below the cutover, 8 KB bitsets above it."""
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray(struct.pack("<ii", _COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header: absolute byte offsets of each container
    offset = len(out) + 4 * len(keys)
    payloads = []
    offsets = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_CUTOVER:
            payload = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payload = struct.pack("<1024Q", *words)
        offsets.append(offset)
        offset += len(payload)
        payloads.append(payload)
    for o in offsets:
        out += struct.pack("<i", o)
    for p in payloads:
        out += p
    return bytes(out)


# --- 64-bit RoaringBitmapArray (portable) ---------------------------


def decode_dv_data(data: bytes) -> list[int]:
    """Magic-prefixed portable RoaringBitmapArray → sorted row indexes."""
    if len(data) < 12:
        raise DeltaError(f"deletion vector too short ({len(data)} bytes)")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DV_MAGIC:
        raise DeltaError(f"bad deletion vector magic {magic} (want {DV_MAGIC})")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _parse_roaring32(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def encode_dv_data(row_indexes: list[int]) -> bytes:
    by_high: dict[int, list[int]] = {}
    for r in sorted(set(row_indexes)):
        by_high.setdefault(r >> 32, []).append(r & 0xFFFFFFFF)
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<iq", DV_MAGIC, n_bitmaps))
    for high in range(n_bitmaps):
        out += _serialize_roaring32(by_high.get(high, []))
    return bytes(out)


# --- descriptor resolution ------------------------------------------


def dv_absolute_path(table_path: str, descriptor: dict) -> str:
    """Resolve a u/p descriptor to the sidecar file path.  Type ``u``:
    pathOrInlineDv is ``<random prefix><20-char z85 uuid>``; the file
    lives at ``<table>/<prefix>/deletion_vector_<uuid>.bin``."""
    st = descriptor["storageType"]
    p = descriptor["pathOrInlineDv"]
    if st == "p":
        return p
    if st == "u":
        prefix, enc = p[:-20], p[-20:]
        u = uuid.UUID(bytes=z85_decode(enc))
        name = f"deletion_vector_{u}.bin"
        return os.path.join(table_path, prefix, name) if prefix else os.path.join(
            table_path, name
        )
    raise DeltaError(f"unsupported deletion vector storageType {st!r}")


def read_dv(table_path: str, descriptor: dict) -> list[int]:
    """Descriptor → sorted deleted row indexes (driver- or
    executor-side; the blob is sizeInBytes — KBs)."""
    st = descriptor["storageType"]
    size = int(descriptor["sizeInBytes"])
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])[:size]
    else:
        path = dv_absolute_path(table_path, descriptor)
        with open(path, "rb") as f:
            blob = f.read()
        off = int(descriptor["offset"])
        (stored_size,) = struct.unpack_from(">i", blob, off)
        if stored_size != size:
            raise DeltaError(
                f"deletion vector size mismatch at {path!r}: "
                f"descriptor {size}, file {stored_size}"
            )
        data = blob[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise DeltaError(f"deletion vector checksum mismatch at {path!r}")
    rows = decode_dv_data(data)
    card = int(descriptor.get("cardinality", len(rows)))
    if card != len(rows):
        raise DeltaError(
            f"deletion vector cardinality mismatch: descriptor {card}, "
            f"decoded {len(rows)}"
        )
    return rows


def write_dv_file(
    table_path: str, row_indexes: list[int], prefix: str = ""
) -> dict:
    """Fixture/test writer: persist a DV for ``row_indexes`` as a
    ``u``-type sidecar and return the descriptor dict to embed in an
    ``add`` action."""
    data = encode_dv_data(row_indexes)
    u = uuid.uuid4()
    enc = z85_encode(u.bytes)
    target_dir = os.path.join(table_path, prefix) if prefix else table_path
    os.makedirs(target_dir, exist_ok=True)
    path = os.path.join(target_dir, f"deletion_vector_{u}.bin")
    offset = 1  # right after the 1-byte format version
    with open(path, "wb") as f:
        f.write(bytes([DV_FORMAT_VERSION]))
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + enc,
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(set(row_indexes)),
    }
