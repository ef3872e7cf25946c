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
