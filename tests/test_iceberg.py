"""Iceberg-style manifest-chain reader (sources/iceberg.py).

The gate key scan_iceberg proves the aggregate values; these pin the
reader mechanics: snapshot selection, DELETED-entry exclusion, schema
derivation from the Iceberg schema JSON, and the error path.
"""

from __future__ import annotations

import pytest

from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
from datafusion_catalogprovider_glue_spark.operators import catalog_ops
from datafusion_catalogprovider_glue_spark.sources.iceberg import (
    IcebergSnapshot,
    read_iceberg,
)
from datafusion_catalogprovider_glue_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def table_dir(spark):
    # materialize the two-snapshot fixture via the gate key
    catalog_ops.scan_iceberg(spark, SF_SMOKE).collect()
    return catalog_ops._text_scan_dir(SF_SMOKE, "supplier_iceberg")


def test_current_snapshot_excludes_deleted_file(spark, table_dir):
    snap = IcebergSnapshot(table_dir)
    assert [f.rsplit("/", 1)[-1] for f in snap.files] == ["lo.parquet"]


def test_pinned_snapshot_reads_full_file(spark, table_dir):
    snap = IcebergSnapshot(table_dir, snapshot_id=1)
    assert [f.rsplit("/", 1)[-1] for f in snap.files] == ["full.parquet"]
    df = read_iceberg(spark, table_dir, snapshot_id=1)
    expected = load_table(spark, SF_SMOKE, "supplier")
    assert df.count() == expected.count()
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, expected.collect()))


def test_schema_comes_from_metadata_json(spark, table_dir):
    df = read_iceberg(spark, table_dir)
    assert [f.name for f in df.schema.fields] == [
        "s_suppkey",
        "s_name",
        "s_nationkey",
        "s_acctbal",
    ]
    assert dict(df.dtypes)["s_suppkey"] == "bigint"
    assert dict(df.dtypes)["s_nationkey"] == "int"


def test_unknown_snapshot_raises(spark, table_dir):
    with pytest.raises(NotImplementedYet, match="snapshot 99"):
        IcebergSnapshot(table_dir, snapshot_id=99)


# ---------------------------------------------------------------------------
# v2 positional deletes
# ---------------------------------------------------------------------------


def test_pos_deletes_rowlevel(spark):
    """Latest snapshot hides exactly the s_suppkey%7==0 rows; the
    pinned first snapshot still sees them; non-deleted rows are
    untouched."""
    from datafusion_catalogprovider_glue_spark.operators import catalog_ops
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        IcebergSnapshot,
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    # build the fixture via the registered query (idempotent)
    catalog_ops.scan_iceberg_pos_deletes(spark, SF_SMOKE).collect()
    table_dir = catalog_ops._text_scan_dir(SF_SMOKE, "supplier_iceberg_v2")

    snap = IcebergSnapshot(table_dir)
    assert snap.delete_files, "latest snapshot must carry a delete file"
    assert not IcebergSnapshot(table_dir, snapshot_id=1).delete_files

    all_keys = {
        r.s_suppkey
        for r in load_table(spark, SF_SMOKE, "supplier").select("s_suppkey").collect()
    }
    latest = {r.s_suppkey for r in read_iceberg(spark, table_dir).select("s_suppkey").collect()}
    snap1 = {
        r.s_suppkey
        for r in read_iceberg(spark, table_dir, snapshot_id=1).select("s_suppkey").collect()
    }
    assert snap1 == all_keys
    assert latest == {k for k in all_keys if k % 7 != 0}


# ---------------------------------------------------------------------------
# v2 equality deletes + full-path delete matching
# ---------------------------------------------------------------------------


def _mini_iceberg(spark, root, *, manifest_rows, data, deletes=None):
    """Hand-built single-snapshot table.  ``data`` maps a relative
    parquet path → rows of (k long, v string); ``deletes`` maps a
    relative path → (schema_ddl, rows).  ``manifest_rows`` are
    (status, content, file_path, seq) tuples."""
    import json
    import os
    import shutil

    from pyspark.sql import types as T

    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        write_avro_container,
    )

    root = str(root)
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    def _stage(rel, df):
        staging = os.path.join(root, "_stage")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        dest = os.path.join(root, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(part, dest)
        shutil.rmtree(staging)

    row_schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    for rel, rows in data.items():
        _stage(rel, spark.createDataFrame(rows, row_schema))
    for rel, (ddl, rows) in (deletes or {}).items():
        _stage(rel, spark.createDataFrame(rows, ddl))

    manifest_schema = T.StructType(
        [
            T.StructField("status", T.IntegerType()),
            T.StructField("content", T.IntegerType()),
            T.StructField("file_path", T.StringType()),
            T.StructField("file_format", T.StringType()),
            T.StructField("record_count", T.LongType()),
            T.StructField("sequence_number", T.LongType()),
        ]
    )
    write_avro_container(
        os.path.join(meta_dir, "manifest-1.avro"),
        manifest_schema,
        [(st, c, p, "PARQUET", 0, sq) for st, c, p, sq in manifest_rows],
    )
    write_avro_container(
        os.path.join(meta_dir, "snap-1.avro"),
        T.StructType(
            [
                T.StructField("manifest_path", T.StringType()),
                T.StructField("manifest_length", T.LongType()),
                T.StructField("added_snapshot_id", T.LongType()),
            ]
        ),
        [("metadata/manifest-1.avro", 1, 1)],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "mini",
        "location": root,
        "current-schema-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {"id": 2, "name": "v", "required": False, "type": "string"},
                ],
            }
        ],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return root


def test_pos_delete_full_path_no_basename_collision(spark, tmp_path):
    """Two data files share the basename part.parquet in different
    directories; the delete file names only data/a/part.parquet pos 0
    — the row at the same position of data/b/part.parquet survives."""
    root = _mini_iceberg(
        spark,
        tmp_path / "t",
        data={
            "data/a/part.parquet": [(1, "a")],
            "data/b/part.parquet": [(2, "b")],
        },
        deletes={
            "data/deletes.parquet": (
                "file_path string, pos long",
                [("data/a/part.parquet", 0)],
            )
        },
        manifest_rows=[
            (1, 0, "data/a/part.parquet", 1),
            (1, 0, "data/b/part.parquet", 1),
            (1, 1, "data/deletes.parquet", 2),
        ],
    )
    got = {(r.k, r.v) for r in read_iceberg(spark, root).collect()}
    assert got == {(2, "b")}


def test_eq_delete_sequence_scoping(spark, tmp_path):
    """Equality delete at seq 2 removes matching rows only from data
    files with seq < 2: the seq-1 file loses k=1, the seq-3 re-added
    file keeps it (spec: strict seq(delete) > seq(data))."""
    root = _mini_iceberg(
        spark,
        tmp_path / "t",
        data={
            "data/old.parquet": [(1, "old"), (2, "keep")],
            "data/readd.parquet": [(1, "readded")],
        },
        deletes={
            "data/eq.parquet": ("k long", [(1,)]),
        },
        manifest_rows=[
            (1, 0, "data/old.parquet", 1),
            (1, 2, "data/eq.parquet", 2),
            (1, 0, "data/readd.parquet", 3),
        ],
    )
    got = {(r.k, r.v) for r in read_iceberg(spark, root).collect()}
    assert got == {(2, "keep"), (1, "readded")}


def test_eq_delete_multi_column_null_safe(spark, tmp_path):
    """Multi-column equality ids match null-safely: a delete row with
    v=NULL removes exactly the data row whose v is NULL."""
    root = _mini_iceberg(
        spark,
        tmp_path / "t",
        data={"data/d.parquet": [(1, None), (1, "x"), (2, None)]},
        deletes={"data/eq.parquet": ("k long, v string", [(1, None)])},
        manifest_rows=[
            (1, 0, "data/d.parquet", 1),
            (1, 2, "data/eq.parquet", 2),
        ],
    )
    got = {(r.k, r.v) for r in read_iceberg(spark, root).collect()}
    assert got == {(1, "x"), (2, None)}


def test_partition_pruning_file_count(spark):
    """partition_filter must prune at the MANIFEST level: only the
    matching partition's file reaches the scan."""
    from datafusion_catalogprovider_glue_spark.operators import catalog_ops

    catalog_ops.scan_iceberg_partition_pruned(spark, SF_SMOKE).collect()
    root = catalog_ops._text_scan_dir(SF_SMOKE, "supplier_iceberg_part")
    snap = IcebergSnapshot(root)
    assert len(snap.files) == 3
    assert len(snap.partitions) == 3
    pruned = read_iceberg(spark, root, partition_filter={"bucket": 2})
    # the pruned plan reads one file: every surviving row is bucket 2
    rows = pruned.select("s_nationkey").distinct().collect()
    assert rows and all(r.s_nationkey % 3 == 2 for r in rows)
    # filter on a partition value no file has -> empty scan, not error
    assert read_iceberg(spark, root, partition_filter={"bucket": 99}).count() == 0


def _write_meta(tmp_path, schemas, current_schema_id, files_with_seq):
    """Minimal v2 metadata + single-snapshot manifest chain over
    already-written parquet files."""
    import json
    import os

    from pyspark.sql import types as T

    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        write_avro_container,
    )

    meta_dir = tmp_path / "metadata"
    os.makedirs(meta_dir, exist_ok=True)
    manifest_schema = T.StructType(
        [
            T.StructField("status", T.IntegerType()),
            T.StructField("content", T.IntegerType()),
            T.StructField("file_path", T.StringType()),
            T.StructField("file_format", T.StringType()),
            T.StructField("record_count", T.LongType()),
            T.StructField("sequence_number", T.LongType()),
        ]
    )
    list_schema = T.StructType(
        [
            T.StructField("manifest_path", T.StringType()),
            T.StructField("manifest_length", T.LongType()),
            T.StructField("added_snapshot_id", T.LongType()),
        ]
    )
    write_avro_container(
        str(meta_dir / "manifest-1.avro"),
        manifest_schema,
        [(1, 0, fp, "PARQUET", 1, seq) for fp, seq in files_with_seq],
    )
    write_avro_container(
        str(meta_dir / "snap-1.avro"),
        list_schema,
        [("metadata/manifest-1.avro",
          os.path.getsize(meta_dir / "manifest-1.avro"), 1)],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "evolve-unit",
        "location": str(tmp_path),
        "current-schema-id": current_schema_id,
        "schemas": schemas,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}],
    }
    (meta_dir / "v1.metadata.json").write_text(json.dumps(meta))
    (meta_dir / "version-hint.text").write_text("1")


def test_schema_evolution_resolves_rename_by_field_id_metadata(spark, tmp_path):
    # a file carrying explicit PARQUET:field_id metadata must resolve
    # by ID even when BOTH its name and the current name diverge from
    # history (ids beat name matching)
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(tmp_path / "data", exist_ok=True)
    sch = pa.schema(
        [
            pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field("legacy", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    pq.write_table(
        pa.table({"k": [1, 2], "legacy": ["a", "b"]}, schema=sch),
        tmp_path / "data" / "old.parquet",
    )
    schemas = [
        {
            "schema-id": 0,
            "type": "struct",
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                # history never mentions "legacy": only the id links it
                {"id": 2, "name": "v0", "required": False, "type": "string"},
            ],
        },
        {
            "schema-id": 1,
            "type": "struct",
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "v1", "required": False, "type": "string"},
                {"id": 3, "name": "added", "required": False, "type": "long"},
            ],
        },
    ]
    _write_meta(tmp_path, schemas, 1, [("data/old.parquet", 1)])
    out = read_iceberg(spark, str(tmp_path)).orderBy("k").collect()
    assert [r.v1 for r in out] == ["a", "b"]
    assert [r.added for r in out] == [None, None]


def test_schema_evolution_falls_back_to_historical_names(spark, tmp_path):
    # files WITHOUT field-id metadata (e.g. written by plain Spark)
    # resolve through the field id's historical-name chain
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(tmp_path / "data", exist_ok=True)
    pq.write_table(
        pa.table({"k": [7], "old_name": ["x"]}),
        tmp_path / "data" / "old.parquet",
    )
    pq.write_table(
        pa.table({"k": [8], "new_name": ["y"], "extra": [5]}),
        tmp_path / "data" / "new.parquet",
    )
    schemas = [
        {
            "schema-id": 0,
            "type": "struct",
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "old_name", "required": False, "type": "string"},
            ],
        },
        {
            "schema-id": 1,
            "type": "struct",
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "new_name", "required": False, "type": "string"},
                {"id": 3, "name": "extra", "required": False, "type": "long"},
            ],
        },
    ]
    _write_meta(
        tmp_path, schemas, 1, [("data/old.parquet", 1), ("data/new.parquet", 2)]
    )
    out = {r.k: r for r in read_iceberg(spark, str(tmp_path)).collect()}
    assert out[7].new_name == "x" and out[7].extra is None
    assert out[8].new_name == "y" and out[8].extra == 5


# ---------------------------------------------------------------------------
# round 6: partition transforms (spec §partition-transforms)
# ---------------------------------------------------------------------------


def test_transform_spec_vectors():
    """The Iceberg spec's published transform test vectors (Appendix B
    hash requirements + transform examples) — external parity, not
    self-consistency."""
    from datafusion_catalogprovider_glue_spark.sources.iceberg_transforms import (
        _bucket_hash,
        apply_transform,
    )

    import datetime

    assert _bucket_hash(34) == 2017239379          # int widens to long
    assert _bucket_hash("iceberg") == 1210000089   # UTF-8 bytes
    # spec Appendix B: timestamps hash their epoch MICROSECONDS as a
    # long (vector is the signed-int32 view of the murmur output)
    ts_hash = _bucket_hash(datetime.datetime(2017, 11, 16, 22, 31, 8))
    assert ts_hash - (1 << 32) == -2047944441
    # the same instant tz-aware (UTC-8) must hash identically
    tz = datetime.timezone(datetime.timedelta(hours=-8))
    assert _bucket_hash(
        datetime.datetime(2017, 11, 16, 14, 31, 8, tzinfo=tz)
    ) == ts_hash
    assert apply_transform("day", "2017-11-16") == 17486
    assert apply_transform("month", "2017-11-16") == 574
    assert apply_transform("year", "2017-11-16") == 47
    assert apply_transform("hour", "2017-11-16 22:31:08") == 419686
    assert apply_transform("truncate[10]", -1) == -10   # floor, not trunc
    assert apply_transform("truncate[3]", "iceberg") == "ice"
    assert apply_transform("bucket[16]", None) is None


def test_transform_column_matches_scalar(spark):
    """transform_column (the executor-side Spark half, including the
    numpy-vectorized murmur3 long path and the per-row string path)
    agrees value-for-value with apply_transform (the driver-side scalar
    half pruning folds through) — the invariant the whole
    write-then-prune round trip rests on."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.iceberg_transforms import (
        apply_transform,
        transform_column,
    )

    longs = [-(2**40), -17, -1, 0, 1, 34, 2**33, None]
    df = spark.createDataFrame([(v,) for v in longs], "v bigint")
    for transform in ("bucket[16]", "bucket[7]", "truncate[10]"):
        got = [
            r["t"]
            for r in df.select(
                transform_column(F.col("v"), transform, "bigint").alias("t")
            ).collect()
        ]
        want = [
            None if v is None else apply_transform(transform, v)
            for v in longs
        ]
        assert got == want, (transform, got, want)

    strs = ["iceberg", "", "ü-umlaut", "a" * 100, None]
    sdf = spark.createDataFrame([(v,) for v in strs], "v string")
    for transform in ("bucket[8]", "truncate[4]"):
        got = [
            r["t"]
            for r in sdf.select(
                transform_column(F.col("v"), transform, "string").alias("t")
            ).collect()
        ]
        want = [
            None if v is None else apply_transform(transform, v)
            for v in strs
        ]
        assert got == want, (transform, got, want)

    ts = ["2017-11-16 22:31:08", "1969-12-31 23:00:00", "2024-01-05 00:00:00"]
    tdf = spark.createDataFrame(
        [(v,) for v in ts], "v string"
    ).select(F.col("v").cast("timestamp_ntz").alias("v"))
    for transform in ("year", "month", "day", "hour"):
        got = [
            r["t"]
            for r in tdf.select(
                transform_column(F.col("v"), transform, "timestamp_ntz").alias("t")
            ).collect()
        ]
        want = [apply_transform(transform, v) for v in ts]
        assert got == want, (transform, got, want)


def test_transform_write_prune_roundtrip(spark, tmp_path):
    """bucket[N]-partitioned write → manifest tuples carry bucket
    ordinals → a source-value partition_filter prunes to exactly the
    files of that bucket and returns every row of the value."""
    import json

    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        IcebergSnapshot,
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_transforms import (
        apply_transform,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )

    table = str(tmp_path / "bkt")
    df = spark.createDataFrame(
        [(i, f"name-{i}") for i in range(64)], "k bigint, v string"
    )
    append_iceberg(df, table, partition_by="k", transform="bucket[4]")
    snap = IcebergSnapshot(table)
    assert snap.partition_spec == [
        {"name": "k_bucket", "transform": "bucket[4]", "source": "k"}
    ]
    buckets = {
        json.loads(json.dumps(snap.partitions.get(f)))["k_bucket"]
        for f in snap.files
    }
    assert len(buckets) > 1
    out = read_iceberg(spark, table, partition_filter={"k": 34})
    rows = {(r["k"], r["v"]) for r in out.collect()}
    assert (34, "name-34") in rows
    b34 = apply_transform("bucket[4]", 34)
    assert all(apply_transform("bucket[4]", k) == b34 for k, _ in rows)
    # pruned plan touches only that bucket's files
    expect_files = {
        f
        for f in snap.files
        if snap.partitions.get(f, {}).get("k_bucket") == b34
    }
    assert len(out.inputFiles()) == len(expect_files) < len(snap.files)


def test_multi_field_partition_spec_roundtrip(spark, tmp_path):
    """Multi-field spec (truncate[2](grp) + bucket[2](k)): tuples carry
    BOTH fields, pruning composes per filter key, single-field filters
    prune on their dimension only, and the same-spec re-append is
    accepted while a different spec refuses."""
    import json

    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        IcebergSnapshot,
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_transforms import (
        apply_transform,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )

    table = str(tmp_path / "multi")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}x") for i in range(24)], "k bigint, grp string"
    )
    spec = [("grp", "truncate[2]"), ("k", "bucket[2]")]
    append_iceberg(df, table, partition_by=spec)
    append_iceberg(df, table, partition_by=spec)  # same-spec re-append
    snap = IcebergSnapshot(table)
    assert snap.partition_spec == [
        {"name": "grp_trunc", "transform": "truncate[2]", "source": "grp"},
        {"name": "k_bucket", "transform": "bucket[2]", "source": "k"},
    ]
    tuples = {
        json.dumps(snap.partitions.get(f), sort_keys=True) for f in snap.files
    }
    assert all('"grp_trunc"' in t and '"k_bucket"' in t for t in tuples)
    # two-key filter prunes to one cell; rows are exactly that cell's
    out = read_iceberg(
        spark, table, partition_filter={"grp": "g1x", "k": 7}
    )
    b7 = apply_transform("bucket[2]", 7)
    rows = {(r["k"], r["grp"]) for r in out.collect()}
    assert (7, "g1x") in rows
    assert all(
        g.startswith("g1") and apply_transform("bucket[2]", k) == b7
        for k, g in rows
    )
    cell = [
        f
        for f in snap.files
        if snap.partitions.get(f, {}).get("grp_trunc") == "g1"
        and snap.partitions.get(f, {}).get("k_bucket") == b7
    ]
    assert len(out.inputFiles()) == len(cell) < len(snap.files)
    # single-key filter prunes only its dimension
    out_g = read_iceberg(spark, table, partition_filter={"grp": "g0x"})
    assert {r["grp"] for r in out_g.select("grp").distinct().collect()} == {"g0x"}
    # r7: a different spec EVOLVES the table (new versioned spec, new
    # default) instead of refusing; old files still prune through
    # their original spec
    extra = spark.createDataFrame([(100, "g9x")], "k bigint, grp string")
    append_iceberg(extra, table, partition_by=[("grp", "identity")])
    snap2 = IcebergSnapshot(table)
    assert len(snap2.partition_specs) == 2
    assert snap2.partition_spec == [
        {"name": "grp", "transform": "identity", "source": "grp"}
    ]
    # files span both spec ids
    assert len({snap2.spec_of[f] for f in snap2.files}) == 2
    # the SAME two-key filter still prunes the old-spec files through
    # the OLD spec; the new-spec file (different grp) is pruned by its
    # identity tuple
    out2 = read_iceberg(
        spark, table, partition_filter={"grp": "g1x", "k": 7}
    )
    assert {(r["k"], r["grp"]) for r in out2.collect()} == rows
    assert len(out2.inputFiles()) == len(cell)
    # a filter matching the NEW spec's identity value reads the new file
    out3 = read_iceberg(spark, table, partition_filter={"grp": "g9x"})
    assert {(r["k"], r["grp"]) for r in out3.collect()} == {(100, "g9x")}


def test_bucket_on_timestamp_column_and_prune(spark, tmp_path):
    """bucket[N] on a timestamptz column (r7; was refused): the column
    half hashes unix_micros identically to the scalar half under ANY
    session timezone, and a bucketed-timestamp write prunes to the
    probe key's bucket."""
    import datetime

    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        IcebergSnapshot,
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_transforms import (
        apply_transform,
        transform_column,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + datetime.timedelta(hours=7 * i, microseconds=13 * i))
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp")
    got = [
        r["b"]
        for r in df.select(
            transform_column(F.col("ts"), "bucket[8]", "timestamp").alias("b")
        ).collect()
    ]
    want = [apply_transform("bucket[8]", ts) for _k, ts in rows]
    assert got == want
    # NULL stays NULL
    dfn = spark.createDataFrame([(1, None)], "k int, ts timestamp")
    assert dfn.select(
        transform_column(F.col("ts"), "bucket[8]", "timestamp").alias("b")
    ).collect()[0]["b"] is None
    # write-prune round trip
    table = str(tmp_path / "tsbucket")
    append_iceberg(df, table, partition_by="ts", transform="bucket[8]")
    snap = IcebergSnapshot(table)
    probe = rows[5][1]
    bval = apply_transform("bucket[8]", probe)
    cell = [
        f
        for f in snap.files
        if snap.partitions.get(f, {}).get("ts_bucket") == bval
    ]
    out = read_iceberg(spark, table, partition_filter={"ts": probe})
    assert 0 < len(cell) < len(snap.files)
    assert len(out.inputFiles()) == len(cell)
    got_keys = {r["k"] for r in out.collect()}
    assert rows[5][0] in got_keys
    assert all(apply_transform("bucket[8]", rows[k][1]) == bval for k in got_keys)
