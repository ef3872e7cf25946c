"""B8: minimal Delta snapshot reader against hand-crafted transaction
logs (the protocol is open; delta-spark isn't in this container, which
is exactly why sources/delta.py exists).  Covers add/remove replay,
schema-from-metaData, partitionValues attachment, checkpoint bases,
and the Glue catalog's delta dispatch path."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from datafusion_catalogprovider_glue_spark.catalog.catalog import GlueCatalog
from datafusion_catalogprovider_glue_spark.catalog.fake_glue import FakeGlueClient
from datafusion_catalogprovider_glue_spark.errors import DeltaError
from datafusion_catalogprovider_glue_spark.sources.delta import read_delta

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_data_file(spark, tmp_path, table_dir, name, rows):
    df = spark.createDataFrame(rows, "id long, v string")
    staging = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(staging))
    part = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(staging)
        for f in fs
        if f.endswith(".parquet")
    )
    os.makedirs(table_dir, exist_ok=True)
    shutil.move(part, os.path.join(table_dir, name))


def _meta_action(partition_cols=()):
    return {
        "metaData": {
            "id": "test-table",
            "schemaString": SCHEMA_JSON,
            "partitionColumns": list(partition_cols),
            "format": {"provider": "parquet"},
        }
    }


def _commit(table_dir, version, actions):
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def test_snapshot_add_remove_replay(spark, tmp_path):
    t = str(tmp_path / "delta_t1")
    _write_data_file(spark, tmp_path, t, "f1.parquet", [(1, "a"), (2, "b")])
    _write_data_file(spark, tmp_path, t, "f2.parquet", [(3, "c")])
    _write_data_file(spark, tmp_path, t, "f3.parquet", [(4, "d")])
    _commit(t, 0, [_meta_action(), {"add": {"path": "f1.parquet", "partitionValues": {}}}])
    _commit(t, 1, [{"add": {"path": "f2.parquet", "partitionValues": {}}}])
    # version 2 compacts f1+f2 into f3
    _commit(
        t,
        2,
        [
            {"remove": {"path": "f1.parquet"}},
            {"remove": {"path": "f2.parquet"}},
            {"add": {"path": "f3.parquet", "partitionValues": {}}},
        ],
    )
    df = read_delta(spark, t)
    assert [f.name for f in df.schema.fields] == ["id", "v"]
    assert {(r.id, r.v) for r in df.collect()} == {(4, "d")}


def test_snapshot_partitioned(spark, tmp_path):
    t = str(tmp_path / "delta_t2")
    _write_data_file(spark, tmp_path, t, "p1.parquet", [(1, "a")])
    _write_data_file(spark, tmp_path, t, "p2.parquet", [(2, "b")])
    schema = json.loads(SCHEMA_JSON)
    schema["fields"].append(
        {"name": "year", "type": "integer", "nullable": True, "metadata": {}}
    )
    meta = _meta_action(["year"])
    meta["metaData"]["schemaString"] = json.dumps(schema)
    _commit(
        t,
        0,
        [
            meta,
            {"add": {"path": "p1.parquet", "partitionValues": {"year": "2023"}}},
            {"add": {"path": "p2.parquet", "partitionValues": {"year": "2024"}}},
        ],
    )
    df = read_delta(spark, t)
    rows = {(r.id, r.v, r.year) for r in df.collect()}
    assert rows == {(1, "a", 2023), (2, "b", 2024)}
    assert dict(df.dtypes)["year"] == "int"


def test_snapshot_from_checkpoint(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "delta_t3")
    _write_data_file(spark, tmp_path, t, "c1.parquet", [(10, "x")])
    _write_data_file(spark, tmp_path, t, "c2.parquet", [(11, "y")])
    log_dir = os.path.join(t, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    # checkpoint at version 1: metaData + add c1
    # partitionValues omitted: pyarrow can't write an empty struct, and
    # the reader defaults absent partitionValues to {}
    ckpt_rows = [
        {"metaData": {"schemaString": SCHEMA_JSON, "partitionColumns": []},
         "add": None, "remove": None},
        {"metaData": None, "add": {"path": "c1.parquet"}, "remove": None},
    ]
    pq.write_table(
        pa.Table.from_pylist(ckpt_rows),
        os.path.join(log_dir, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 2}, f)
    # commits 0/1 deliberately absent (pruned); commit 2 adds c2
    _commit(t, 2, [{"add": {"path": "c2.parquet", "partitionValues": {}}}])
    df = read_delta(spark, t)
    assert {(r.id, r.v) for r in df.collect()} == {(10, "x"), (11, "y")}


def test_catalog_delta_dispatch_uses_fallback_reader(spark, tmp_path):
    t = str(tmp_path / "delta_t4")
    _write_data_file(spark, tmp_path, t, "f.parquet", [(7, "z")])
    _commit(t, 0, [_meta_action(), {"add": {"path": "f.parquet", "partitionValues": {}}}])
    client = FakeGlueClient(
        {
            "ddb": {
                "dt": {
                    "DatabaseName": "ddb",
                    "Name": "dt",
                    "Parameters": {"table_type": "DELTA"},  # case-insensitive match
                    "PartitionKeys": [],
                    "StorageDescriptor": {"Columns": [], "Location": t},
                }
            }
        }
    )
    catalog = GlueCatalog(spark, client)
    entry = catalog.register_table("ddb", "dt")
    assert entry.is_delta
    assert {(r.id, r.v) for r in spark.table(entry.view).collect()} == {(7, "z")}


def test_missing_log_raises_delta_error(spark, tmp_path):
    with pytest.raises(DeltaError):
        read_delta(spark, str(tmp_path / "not_a_delta_table"))


def test_time_travel_version_as_of(spark, tmp_path):
    t = str(tmp_path / "delta_t5")
    _write_data_file(spark, tmp_path, t, "f1.parquet", [(1, "a")])
    _write_data_file(spark, tmp_path, t, "f2.parquet", [(2, "b")])
    _commit(t, 0, [_meta_action(), {"add": {"path": "f1.parquet", "partitionValues": {}}}])
    _commit(
        t,
        1,
        [
            {"remove": {"path": "f1.parquet"}},
            {"add": {"path": "f2.parquet", "partitionValues": {}}},
        ],
    )
    v0 = {(r.id, r.v) for r in read_delta(spark, t, version=0).collect()}
    v1 = {(r.id, r.v) for r in read_delta(spark, t, version=1).collect()}
    latest = {(r.id, r.v) for r in read_delta(spark, t).collect()}
    assert v0 == {(1, "a")}
    assert v1 == {(2, "b")} == latest
    with pytest.raises(DeltaError):
        read_delta(spark, t, version=9)


def test_schema_evolution_mid_log(spark, tmp_path):
    """A metaData action AFTER files were added evolves the schema
    (column add); old files surface NULL for the new column — the
    Delta schema-evolution contract the deltalake crate implements
    and Spark's declared-schema parquet read gives us for free."""
    table_dir = str(tmp_path / "tbl")
    _write_data_file(spark, tmp_path, table_dir, "a.parquet", [(1, "x"), (2, "y")])
    df2 = spark.createDataFrame([(3, "z", 30.0)], "id long, v string, score double")
    staging = tmp_path / "stage_b"
    df2.coalesce(1).write.parquet(str(staging))
    part = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(staging)
        for f in fs
        if f.endswith(".parquet")
    )
    shutil.move(part, os.path.join(table_dir, "b.parquet"))

    evolved = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "score", "type": "double", "nullable": True, "metadata": {}},
            ],
        }
    )
    _commit(table_dir, 0, [_meta_action(), {"add": {"path": "a.parquet", "partitionValues": {}}}])
    _commit(
        table_dir,
        1,
        [
            {"metaData": {"id": "test-table", "schemaString": evolved,
                          "partitionColumns": [], "format": {"provider": "parquet"}}},
            {"add": {"path": "b.parquet", "partitionValues": {}}},
        ],
    )
    df = read_delta(spark, table_dir)
    assert [f.name for f in df.schema.fields] == ["id", "v", "score"]
    rows = {r.id: (r.v, r.score) for r in df.collect()}
    assert rows == {1: ("x", None), 2: ("y", None), 3: ("z", 30.0)}


# ---------------------------------------------------------------------------
# column mapping + deletion vectors
# ---------------------------------------------------------------------------

CM_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-0001",
                },
            },
            {
                "name": "v",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-0002",
                },
            },
        ],
    }
)


def _cm_meta(mode="name", schema=CM_SCHEMA_JSON):
    return {
        "metaData": {
            "id": "cm-table",
            "schemaString": schema,
            "partitionColumns": [],
            "format": {"provider": "parquet"},
            "configuration": {"delta.columnMapping.mode": mode},
        }
    }


def test_column_mapping_name_mode(spark, tmp_path):
    """Parquet files carry physical names; the snapshot read must
    project back to the logical names from schemaString metadata."""
    table_dir = str(tmp_path / "cm")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "`col-0001` long, `col-0002` string")
    staging = tmp_path / "stage_cm"
    df.coalesce(1).write.parquet(str(staging))
    part = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(staging)
        for f in fs
        if f.endswith(".parquet")
    )
    os.makedirs(table_dir, exist_ok=True)
    shutil.move(part, os.path.join(table_dir, "a.parquet"))
    _commit(table_dir, 0, [_cm_meta(), {"add": {"path": "a.parquet", "partitionValues": {}}}])
    out = read_delta(spark, table_dir)
    assert [f.name for f in out.schema.fields] == ["id", "v"]
    assert {(r.id, r.v) for r in out.collect()} == {(1, "x"), (2, "y")}


def test_column_mapping_id_mode_binds_by_field_id(spark, tmp_path):
    """r7: id mode READS (was a loud refusal) — logical columns bind to
    physical parquet columns by PARQUET:field_id, not name or
    position.  The fixture's physical order is REVERSED and its names
    are unrelated to the physicalName metadata, so any non-id binding
    would swap or miss columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table_dir = str(tmp_path / "cmid")
    os.makedirs(table_dir, exist_ok=True)
    # physical file: (string col with field_id 2) BEFORE (long col, id 1)
    t = pa.table(
        {
            "zz-str": pa.array(["x", "y"], pa.string()),
            "aa-long": pa.array([1, 2], pa.int64()),
        }
    )
    fields = [
        pa.field("zz-str", pa.string(), True,
                 metadata={b"PARQUET:field_id": b"2"}),
        pa.field("aa-long", pa.int64(), True,
                 metadata={b"PARQUET:field_id": b"1"}),
    ]
    pq.write_table(t.cast(pa.schema(fields)), os.path.join(table_dir, "a.parquet"))
    _commit(
        table_dir,
        0,
        [
            _cm_meta(mode="id"),
            {"add": {"path": "a.parquet", "partitionValues": {}}},
        ],
    )
    got = sorted(
        (r["id"], r["v"]) for r in read_delta(spark, table_dir).collect()
    )
    assert got == [(1, "x"), (2, "y")]


def test_column_mapping_unknown_mode_refused(spark, tmp_path):
    table_dir = str(tmp_path / "cmweird")
    with pytest.raises(DeltaError, match="columnMapping.mode"):
        _commit(table_dir, 0, [_cm_meta(mode="banana")])
        read_delta(spark, table_dir)


def test_column_mapping_missing_physical_name_refused(spark, tmp_path):
    table_dir = str(tmp_path / "cmmiss")
    _write_data_file(spark, tmp_path, table_dir, "a.parquet", [(1, "x")])
    _commit(
        table_dir,
        0,
        [_cm_meta(schema=SCHEMA_JSON), {"add": {"path": "a.parquet", "partitionValues": {}}}],
    )
    with pytest.raises(DeltaError, match="physicalName"):
        read_delta(spark, table_dir).collect()


def test_dv_codec_roundtrip():
    """Pure codec pins: z85 and the portable RoaringBitmapArray must
    round-trip through the format-faithful encoder — array containers
    below the 4096 cutover, 8 KB bitset containers above it, and
    row indexes above 2^32 spanning multiple 32-bit bitmaps."""
    from datafusion_catalogprovider_glue_spark.sources.dv import (
        decode_dv_data,
        encode_dv_data,
        z85_decode,
        z85_encode,
    )

    assert z85_decode(z85_encode(b"\x00\x01\x02\x03")) == b"\x00\x01\x02\x03"
    assert z85_decode(z85_encode(bytes(range(16)))) == bytes(range(16))
    # ZeroMQ RFC test vector
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"

    small = [0, 1, 3, 7, 65535, 65536, 100000]
    assert decode_dv_data(encode_dv_data(small)) == sorted(small)
    dense = list(range(0, 10000))  # forces a bitset container
    assert decode_dv_data(encode_dv_data(dense)) == dense
    wide = [5, (1 << 32) + 9, (2 << 32) + 123456]  # multi-bitmap
    assert decode_dv_data(encode_dv_data(wide)) == sorted(wide)


def test_deletion_vector_file_sidecar(spark, tmp_path):
    """An add carrying a u-type deletionVector must mask exactly the
    listed row indexes of that file (and only that file)."""
    from datafusion_catalogprovider_glue_spark.sources.dv import write_dv_file

    table_dir = str(tmp_path / "dv")
    rows_a = [(i, f"a{i}") for i in range(10)]
    rows_b = [(100 + i, f"b{i}") for i in range(5)]
    _write_data_file(spark, tmp_path, table_dir, "a.parquet", rows_a)
    _write_data_file(spark, tmp_path, table_dir, "b.parquet", rows_b)
    dv = write_dv_file(table_dir, [1, 3, 7])
    _commit(
        table_dir,
        0,
        [
            _meta_action(),
            {"add": {"path": "a.parquet", "partitionValues": {},
                     "deletionVector": dv}},
            {"add": {"path": "b.parquet", "partitionValues": {}}},
        ],
    )
    got = sorted(r.id for r in read_delta(spark, table_dir).collect())
    assert got == [0, 2, 4, 5, 6, 8, 9] + [100, 101, 102, 103, 104]


def test_deletion_vector_inline_and_supersede(spark, tmp_path):
    """An i-type (inline z85) DV masks rows; a later add of the same
    path REPLACES the file's DV (protocol: add actions carry the
    file's full metadata) — here clearing it resurrects the rows."""
    from datafusion_catalogprovider_glue_spark.sources.dv import (
        encode_dv_data,
        z85_encode,
    )

    table_dir = str(tmp_path / "dvi")
    _write_data_file(
        spark, tmp_path, table_dir, "a.parquet", [(i, f"r{i}") for i in range(6)]
    )
    data = encode_dv_data([0, 5])
    pad = (-len(data)) % 4
    inline = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": 2,
    }
    _commit(
        table_dir,
        0,
        [
            _meta_action(),
            {"add": {"path": "a.parquet", "partitionValues": {},
                     "deletionVector": inline}},
        ],
    )
    assert sorted(r.id for r in read_delta(spark, table_dir).collect()) == [
        1, 2, 3, 4,
    ]
    # version 1: re-add without a DV -> all rows live again
    _commit(table_dir, 1, [{"add": {"path": "a.parquet", "partitionValues": {}}}])
    assert sorted(r.id for r in read_delta(spark, table_dir).collect()) == [
        0, 1, 2, 3, 4, 5,
    ]
    # time travel still sees the DV at version 0
    assert sorted(
        r.id for r in read_delta(spark, table_dir, version=0).collect()
    ) == [1, 2, 3, 4]


def test_deletion_vector_cdf_derivation(spark, tmp_path):
    """r7 (was a loud refusal): CDF over DV commits — a re-add with a
    grown DV derives deletes at the NEW−OLD mask positions; a removed
    file that carried a DV contributes only its LIVE rows as deletes;
    the masked rows never double-count."""
    from datafusion_catalogprovider_glue_spark.sources.delta import read_delta_cdf
    from datafusion_catalogprovider_glue_spark.sources.dv import write_dv_file

    table_dir = str(tmp_path / "dvcdf")
    _write_data_file(
        spark, tmp_path, table_dir, "a.parquet", [(1, "x"), (2, "y"), (3, "z")]
    )
    _write_data_file(spark, tmp_path, table_dir, "b.parquet", [(1, "X")])
    _commit(
        table_dir,
        0,
        [_meta_action(), {"add": {"path": "a.parquet", "partitionValues": {}}}],
    )
    # v1: the merge_delta_dv shape — mask row 0 of a, insert b
    dv1 = write_dv_file(table_dir, [0])
    _commit(
        table_dir,
        1,
        [
            {"add": {"path": "a.parquet", "partitionValues": {},
                     "deletionVector": dv1}},
            {"add": {"path": "b.parquet", "partitionValues": {}}},
        ],
    )
    # v2: the DV grows to {0, 2} — only row 2 newly dies
    dv2 = write_dv_file(table_dir, [0, 2])
    _commit(
        table_dir,
        2,
        [
            {"add": {"path": "a.parquet", "partitionValues": {},
                     "deletionVector": dv2}},
        ],
    )
    # v3: the masked file is removed — only its LIVE row (2,"y") dies
    _commit(
        table_dir,
        3,
        [{"remove": {"path": "a.parquet", "deletionTimestamp": 1,
                     "dataChange": True}}],
    )
    got = {
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in read_delta_cdf(spark, table_dir).collect()
    }
    assert got == {
        (0, "insert", 1, "x"),
        (0, "insert", 2, "y"),
        (0, "insert", 3, "z"),
        (1, "delete", 1, "x"),
        (1, "insert", 1, "X"),
        (2, "delete", 3, "z"),
        (3, "delete", 2, "y"),
    }
    # range selection still honors DV state accumulated BEFORE the range
    tail = {
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in read_delta_cdf(spark, table_dir, from_version=2).collect()
    }
    assert tail == {(2, "delete", 3, "z"), (3, "delete", 2, "y")}


def test_cdf_prefers_change_files_and_derives_otherwise(spark, tmp_path):
    """A commit WITH cdc actions is represented only by its change
    files (its add/remove are ignored for CDF); a commit WITHOUT them
    derives inserts from adds and deletes from removed files."""
    from datafusion_catalogprovider_glue_spark.sources.delta import read_delta_cdf

    table_dir = str(tmp_path / "cdf")
    _write_data_file(spark, tmp_path, table_dir, "a.parquet", [(1, "x"), (2, "y")])
    _write_data_file(spark, tmp_path, table_dir, "b.parquet", [(1, "X"), (2, "y")])
    cdc = spark.createDataFrame(
        [(1, "x", "update_preimage"), (1, "X", "update_postimage")],
        "id long, v string, _change_type string",
    )
    staging = tmp_path / "stage_cdc"
    cdc.coalesce(1).write.parquet(str(staging))
    part = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(staging)
        for f in fs
        if f.endswith(".parquet")
    )
    os.makedirs(os.path.join(table_dir, "_change_data"), exist_ok=True)
    shutil.move(part, os.path.join(table_dir, "_change_data", "c.parquet"))

    _commit(table_dir, 0, [_meta_action(), {"add": {"path": "a.parquet", "partitionValues": {}, "dataChange": True}}])
    _commit(
        table_dir,
        1,
        [
            {"add": {"path": "b.parquet", "partitionValues": {}, "dataChange": True}},
            {"remove": {"path": "a.parquet", "dataChange": True}},
            {"cdc": {"path": "_change_data/c.parquet", "partitionValues": {}, "dataChange": False}},
        ],
    )
    _commit(table_dir, 2, [{"remove": {"path": "b.parquet", "dataChange": True}}])

    ch = read_delta_cdf(spark, table_dir)
    got = {
        (r._commit_version, r._change_type, r.id, r.v) for r in ch.collect()
    }
    assert got == {
        (0, "insert", 1, "x"),
        (0, "insert", 2, "y"),
        (1, "update_preimage", 1, "x"),
        (1, "update_postimage", 1, "X"),
        (2, "delete", 1, "X"),
        (2, "delete", 2, "y"),
    }
    # version range selection
    v1 = read_delta_cdf(spark, table_dir, from_version=1, to_version=1)
    assert {r._change_type for r in v1.collect()} == {
        "update_preimage",
        "update_postimage",
    }


def test_cdf_compaction_commit_is_silent(spark, tmp_path):
    """dataChange=false add/remove (compaction) must produce NO change
    rows — rewriting files is not a data change."""
    from datafusion_catalogprovider_glue_spark.sources.delta import read_delta_cdf

    table_dir = str(tmp_path / "cdfc")
    _write_data_file(spark, tmp_path, table_dir, "a.parquet", [(1, "x")])
    _write_data_file(spark, tmp_path, table_dir, "a2.parquet", [(1, "x")])
    _commit(table_dir, 0, [_meta_action(), {"add": {"path": "a.parquet", "partitionValues": {}, "dataChange": True}}])
    _commit(
        table_dir,
        1,
        [
            {"add": {"path": "a2.parquet", "partitionValues": {}, "dataChange": False}},
            {"remove": {"path": "a.parquet", "dataChange": False}},
        ],
    )
    ch = read_delta_cdf(spark, table_dir, from_version=1)
    assert ch.count() == 0
