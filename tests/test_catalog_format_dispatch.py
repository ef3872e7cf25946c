"""A5b/A5c table-type dispatch edge pins (r10).

The gate key covers the happy paths; these pin the refusal contracts
and the read-optimized opt-in for MoR tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.catalog.catalog import GlueCatalog
from datafusion_catalogprovider_glue_spark.catalog.fake_glue import (
    FakeGlueClient,
)
from datafusion_catalogprovider_glue_spark.errors import SparkError


def _tbl(name, loc, ttype, extra=None):
    return {
        "DatabaseName": "db",
        "Name": name,
        "Parameters": {"table_type": ttype, **(extra or {})},
        "PartitionKeys": [],
        "StorageDescriptor": {"Columns": [], "Location": loc},
    }


def test_mor_table_refuses_without_ro_opt_in(spark, tmp_path):
    """A MoR hudi table registered through the catalog must refuse a
    silent base-only read; hoodie.query.as.ro.table=true opts into the
    read-optimized view explicitly and serves base files only."""
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "mor")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, v long"
    )
    append_hudi(base, table, n_groups=1)
    upsert_hudi_log(
        spark,
        spark.createDataFrame([(3, 999)], "k long, v long"),
        table,
        key="k",
    )
    client = FakeGlueClient({"db": {"t": _tbl("t", table, "hudi")}})
    catalog = GlueCatalog(spark, client)
    with pytest.raises(SparkError, match="MERGE-ON-READ"):
        catalog.register_table("db", "t")
    # read-optimized opt-in: base files only (the un-compacted log
    # record does NOT appear — read-optimized semantics by contract)
    client_ro = FakeGlueClient(
        {"db": {"t_ro": _tbl(
            "t_ro", table, "hudi",
            {"hoodie.query.as.ro.table": "true"},
        )}}
    )
    entry = GlueCatalog(spark, client_ro).register_table("db", "t_ro")
    rows = {
        (r.k, r.v)
        for r in spark.table(entry.view).select("k", "v").collect()
    }
    assert (3, 30) in rows and (3, 999) not in rows


def test_cow_hudi_table_registers_directly(spark, tmp_path):
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi,
    )

    table = str(tmp_path / "cow")
    append_hudi(
        spark.createDataFrame([(1, 1), (2, 2)], "k long, v long"),
        table,
        n_groups=1,
    )
    upsert_hudi(
        spark,
        spark.createDataFrame([(1, 100)], "k long, v long"),
        table,
        key="k",
    )
    client = FakeGlueClient({"db": {"c": _tbl("c", table, "hudi")}})
    entry = GlueCatalog(spark, client).register_table("db", "c")
    rows = {
        (r.k, r.v)
        for r in spark.table(entry.view).select("k", "v").collect()
    }
    assert rows == {(1, 100), (2, 2)}


def test_iceberg_dispatch_applies_row_level_deletes(spark, tmp_path):
    """table_type=ICEBERG must resolve through the metadata chain with
    row-level deletes applied — the exact thing a listing scan misses."""
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        merge_iceberg_pos_delete,
    )

    table = str(tmp_path / "ice")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], "k long, s string"
    )
    append_iceberg(df, table)
    merge_iceberg_pos_delete(
        spark, table,
        df.filter(F.col("k") == 5),
        on=["k"], matched_delete=F.lit(True),
    )
    client = FakeGlueClient({"db": {"i": _tbl("i", table, "ICEBERG")}})
    entry = GlueCatalog(spark, client).register_table("db", "i")
    ks = {r.k for r in spark.table(entry.view).select("k").collect()}
    assert ks == set(range(10)) - {5}
