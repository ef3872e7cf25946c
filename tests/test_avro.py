"""B3: pure-Python Avro fallback reader, tested against container
files produced by an independent hand-rolled writer (no avro libs in
this container — which is why sources/avro_fallback.py exists)."""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pytest

from datafusion_catalogprovider_glue_spark.catalog.catalog import GlueCatalog
from datafusion_catalogprovider_glue_spark.catalog.fake_glue import FakeGlueClient
from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
    read_avro_fallback,
    schema_from_avro_file,
)
from datafusion_catalogprovider_glue_spark.sources.formats import (
    AVRO_IN,
    AVRO_OUT,
    AVRO_SERDE,
)

SYNC = bytes(range(16))

WRITER_SCHEMA = {
    "type": "record",
    "name": "Rec",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
    ],
}


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zigzag(len(b)) + b


def _encode_row(row) -> bytes:
    rid, name, score, flag = row
    out = _zigzag(rid)
    if name is None:
        out += _zigzag(0)  # union branch 0 = null
    else:
        out += _zigzag(1) + _string(name)
    out += struct.pack("<d", score)
    out += b"\x01" if flag else b"\x00"
    return out


def write_avro(path: str, rows, codec: str = "null") -> None:
    payload = b"".join(_encode_row(r) for r in rows)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate, per spec
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    meta = {
        "avro.schema": json.dumps(WRITER_SCHEMA).encode(),
        "avro.codec": codec.encode(),
    }
    buf.write(_zigzag(len(meta)))
    for k, v in meta.items():
        buf.write(_string(k))
        buf.write(_zigzag(len(v)) + v)
    buf.write(_zigzag(0))  # end of metadata map
    buf.write(SYNC)
    buf.write(_zigzag(len(rows)))
    buf.write(_zigzag(len(payload)))
    buf.write(payload)
    buf.write(SYNC)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


ROWS_A = [(1, "alpha", 1.5, True), (2, None, -2.25, False)]
ROWS_B = [(3, "gamma", 0.0, True)]


@pytest.fixture
def avro_dir(tmp_path):
    d = tmp_path / "avro_table"
    d.mkdir()
    write_avro(str(d / "part-0.avro"), ROWS_A, codec="null")
    write_avro(str(d / "part-1.avro"), ROWS_B, codec="deflate")
    return str(d)


def test_schema_inference_from_header(avro_dir):
    st = schema_from_avro_file(avro_dir)
    assert [(f.name, f.dataType.simpleString()) for f in st.fields] == [
        ("id", "bigint"),
        ("name", "string"),
        ("score", "double"),
        ("flag", "boolean"),
    ]


def test_read_both_codecs(spark, avro_dir):
    df = read_avro_fallback(spark, avro_dir, schema_from_avro_file(avro_dir))
    rows = {(r.id, r.name, r.score, r.flag) for r in df.collect()}
    assert rows == set(ROWS_A) | set(ROWS_B)


def test_catalog_avro_dispatch_uses_fallback(spark, avro_dir):
    client = FakeGlueClient(
        {
            "adb": {
                "at": {
                    "DatabaseName": "adb",
                    "Name": "at",
                    "Parameters": {},
                    "PartitionKeys": [],
                    "StorageDescriptor": {
                        "InputFormat": AVRO_IN,
                        "OutputFormat": AVRO_OUT,
                        "SerdeInfo": {"SerializationLibrary": AVRO_SERDE},
                        "Columns": [
                            {"Name": "id", "Type": "bigint"},
                            {"Name": "name", "Type": "string"},
                            {"Name": "score", "Type": "double"},
                            {"Name": "flag", "Type": "boolean"},
                        ],
                        "Location": avro_dir,
                    },
                }
            }
        }
    )
    catalog = GlueCatalog(spark, client)
    entry = catalog.register_table("adb", "at")
    assert entry.format == "avro"
    got = {(r.id, r.name, r.score, r.flag) for r in spark.table(entry.view).collect()}
    assert got == set(ROWS_A) | set(ROWS_B)


def test_unsupported_nested_type_is_loud(tmp_path):
    bad = dict(WRITER_SCHEMA)
    bad["fields"] = [{"name": "xs", "type": {"type": "array", "items": "long"}}]
    p = str(tmp_path / "bad.avro")
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    meta = {"avro.schema": json.dumps(bad).encode(), "avro.codec": b"null"}
    buf.write(_zigzag(len(meta)))
    for k, v in meta.items():
        buf.write(_string(k))
        buf.write(_zigzag(len(v)) + v)
    buf.write(_zigzag(0))
    buf.write(SYNC)
    buf.write(_zigzag(1))
    buf.write(_zigzag(2))
    buf.write(_zigzag(1) + _zigzag(0))
    buf.write(SYNC)
    with open(p, "wb") as f:
        f.write(buf.getvalue())
    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        decode_container_file,
    )

    with pytest.raises(NotImplementedYet):
        decode_container_file(p)


def test_negative_count_metadata_block(spark, tmp_path):
    """Avro spec: a negative map-block count means abs(count) items
    preceded by ONE long byte-size for the whole block."""
    payload = _encode_row(ROWS_A[0])
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    items = [
        ("avro.schema", json.dumps(WRITER_SCHEMA).encode()),
        ("avro.codec", b"null"),
    ]
    body = b"".join(_string(k) + _zigzag(len(v)) + v for k, v in items)
    buf.write(_zigzag(-len(items)))  # negative count
    buf.write(_zigzag(len(body)))    # block byte size, once
    buf.write(body)
    buf.write(_zigzag(0))
    buf.write(SYNC)
    buf.write(_zigzag(1))
    buf.write(_zigzag(len(payload)))
    buf.write(payload)
    buf.write(SYNC)
    p = str(tmp_path / "neg.avro")
    with open(p, "wb") as f:
        f.write(buf.getvalue())
    st = schema_from_avro_file(p)
    df = read_avro_fallback(spark, p, st)
    assert [tuple(r) for r in df.collect()] == [ROWS_A[0]]


def test_writer_reader_roundtrip(spark, tmp_path):
    """The writer is the encode mirror of the reader: negative zigzag
    longs, None union branches, IEEE doubles, booleans, bytes."""
    from pyspark.sql import types as T

    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        write_avro_container,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("raw", T.BinaryType()),
        ]
    )
    rows = [
        (-(2**40), True, -0.1, "héllo", b"\x00\xff"),
        (None, None, None, None, None),
        (7, False, float("inf"), "", b""),
    ]
    p = str(tmp_path / "rt.avro")
    write_avro_container(p, schema, rows, block_size=2)  # force 2 blocks
    df = read_avro_fallback(spark, p, schema)
    got = sorted(
        [tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v for v in r) for r in df.collect()],
        key=str,
    )
    assert got == sorted(rows, key=str)


def test_distributed_sink_roundtrip(spark, tmp_path):
    """Partition-parallel write → multi-file read-back: values and
    row count survive; empty partitions write no file."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        read_avro_fallback,
        write_avro_distributed,
    )
    from datafusion_catalogprovider_glue_spark.tables import load_table

    sup = load_table(spark, "/root/testdata/sf0.001", "supplier").repartition(4)
    out = str(tmp_path / "sup_avro")
    paths = write_avro_distributed(sup, out)
    assert 1 <= len(paths) <= 4 and all(p.endswith(".avro") for p in paths)
    back = read_avro_fallback(spark, out, sup.schema)
    assert back.count() == sup.count()
    a = sup.agg(F.sum(F.col("s_acctbal").cast("decimal(18,2)"))).collect()[0][0]
    b = back.agg(F.sum(F.col("s_acctbal").cast("decimal(18,2)"))).collect()[0][0]
    assert a == b


def test_avro_logical_types_roundtrip(spark, tmp_path):
    """timestamp-micros / date logical types (r7, what Hudi MoR logs
    over event tables need): datetimes round-trip through the
    container codec as epoch micros/days with no tz reinterpretation,
    and schema inference maps them back to timestamp/date."""
    import datetime
    import os

    from pyspark.sql import types as T

    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        read_avro_fallback,
        schema_from_avro_file,
        write_avro_container,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("d", T.DateType()),
        ]
    )
    rows = [
        (1, datetime.datetime(2024, 1, 7, 22, 31, 8, 123456),
         datetime.date(2024, 1, 7)),
        (2, None, None),
        (3, datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
         datetime.date(1969, 12, 31)),
    ]
    path = os.path.join(str(tmp_path), "lt.avro")
    write_avro_container(path, schema, rows)
    inferred = schema_from_avro_file(path)
    assert [f.dataType.simpleString() for f in inferred.fields] == [
        "bigint", "timestamp", "date"
    ]
    got = sorted(
        (r["k"], r["ts"], r["d"])
        for r in read_avro_fallback(spark, path, schema).collect()
    )
    assert got == sorted(rows)
