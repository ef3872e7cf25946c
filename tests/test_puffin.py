"""Puffin codec (sources/puffin.py) — pure-Python unit pins.

Layout-level checks a Spark round trip can't isolate: magics, footer
structure, CRC gate, roaring container cutover, >32-bit positions.
"""

import struct
import zlib

import pytest

from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
from datafusion_catalogprovider_glue_spark.sources.puffin import (
    DV_BLOB_MAGIC,
    PUFFIN_MAGIC,
    decode_dv_blob,
    encode_dv_blob,
    read_puffin_dv,
    read_puffin_footer,
    write_puffin_dv_file,
)


def test_blob_layout_is_spec_exact():
    """len(magic+vector) BE · magic D1 D3 39 64 · vector · CRC BE."""
    blob = encode_dv_blob([1, 5, 9])
    (vec_len,) = struct.unpack_from(">I", blob, 0)
    vec = blob[4:4 + vec_len]
    assert vec[:4] == DV_BLOB_MAGIC == bytes([0xD1, 0xD3, 0x39, 0x64])
    (crc,) = struct.unpack_from(">I", blob, 4 + vec_len)
    assert crc == (zlib.crc32(vec) & 0xFFFFFFFF)
    assert len(blob) == 4 + vec_len + 4  # nothing trailing


@pytest.mark.parametrize(
    "positions",
    [
        [0],
        list(range(100)),                      # array container
        list(range(0, 60000, 2)),              # bitset container (>4096)
        [2**32 - 1, 2**32, 2**33 + 7, 2**40],  # multiple high keys
        [],
    ],
)
def test_blob_round_trip(positions):
    assert decode_dv_blob(encode_dv_blob(positions)) == sorted(positions)


def test_blob_crc_gate():
    blob = bytearray(encode_dv_blob(list(range(50))))
    blob[10] ^= 0xFF  # inside the vector
    with pytest.raises(NotImplementedYet, match="CRC"):
        decode_dv_blob(bytes(blob))


def test_blob_magic_gate():
    blob = bytearray(encode_dv_blob([1]))
    blob[4] ^= 0xFF  # first magic byte
    with pytest.raises(NotImplementedYet, match="magic"):
        decode_dv_blob(bytes(blob))


def test_file_round_trip_and_footer(tmp_path):
    path = str(tmp_path / "dv.puffin")
    dvs = {
        "data/a.parquet": [3, 1, 2, 2],          # dupes collapse
        "data/b.parquet": [10**10, 5],
    }
    meta = write_puffin_dv_file(path, dvs, snapshot_id=42, sequence_number=7)
    raw = open(path, "rb").read()
    assert raw[:4] == PUFFIN_MAGIC and raw[-4:] == PUFFIN_MAGIC
    blobs = read_puffin_footer(path)
    assert len(blobs) == 2
    for b in blobs:
        assert b["type"] == "deletion-vector-v1"
        assert b["snapshot-id"] == 42 and b["sequence-number"] == 7
        f = b["properties"]["referenced-data-file"]
        got = read_puffin_dv(path, b["offset"], b["length"])
        assert got == sorted(set(dvs[f]))
        assert int(b["properties"]["cardinality"]) == len(got)
        assert meta[f]["offset"] == b["offset"]


def test_compressed_footer_refuses(tmp_path):
    path = str(tmp_path / "dv.puffin")
    write_puffin_dv_file(path, {"f": [1]}, 1, 1)
    raw = bytearray(open(path, "rb").read())
    raw[-8] |= 1  # flags bit 0: footer-compressed
    bad = str(tmp_path / "bad.puffin")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedYet, match="compressed"):
        read_puffin_footer(bad)


def test_not_a_puffin_refuses(tmp_path):
    p = str(tmp_path / "x.puffin")
    open(p, "wb").write(b"PARQUET1" * 10)
    with pytest.raises(NotImplementedYet, match="not a puffin"):
        read_puffin_footer(p)
