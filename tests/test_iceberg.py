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
