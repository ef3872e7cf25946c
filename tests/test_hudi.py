"""Hudi CoW reader semantics: timeline filtering, file-slice
resolution (later instant wins per file group), and point-in-time
reads (sources/hudi.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.errors import SparkError
from datafusion_catalogprovider_glue_spark.operators.catalog_ops import (
    _HUDI_T1,
    _HUDI_T2,
    _hudi_fixture,
)
from datafusion_catalogprovider_glue_spark.sources.hudi import (
    hudi_completed_instants,
    read_hudi,
)
from datafusion_catalogprovider_glue_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def hudi_dir(spark):
    return _hudi_fixture(spark, SF_SMOKE)


def test_timeline_excludes_inflight(hudi_dir):
    """The t2 inflight marker sits next to the completed commits and
    must not surface as an instant."""
    assert hudi_completed_instants(hudi_dir) == [_HUDI_T1, _HUDI_T2]


def test_snapshot_resolves_latest_file_slice(spark, hudi_dir):
    """Snapshot = odd rows at t1 + even rows rewritten (price doubled)
    at t2, row for row."""
    orders = load_table(spark, SF_SMOKE, "orders")
    want = {
        (r.o_orderkey, round(r.o_totalprice * (2 if r.o_orderkey % 2 == 0 else 1), 2))
        for r in orders.select("o_orderkey", "o_totalprice").collect()
    }
    got = {
        (r.o_orderkey, round(r.o_totalprice, 2))
        for r in read_hudi(spark, hudi_dir).select("o_orderkey", "o_totalprice").collect()
    }
    assert got == want


def test_point_in_time_sees_first_commit(spark, hudi_dir):
    """as_of=t1 excludes the t2 rewrite: the read reconstructs the
    original orders exactly."""
    orders = load_table(spark, SF_SMOKE, "orders")
    want = {(r.o_orderkey, r.o_totalprice) for r in orders.select("o_orderkey", "o_totalprice").collect()}
    got = {
        (r.o_orderkey, r.o_totalprice)
        for r in read_hudi(spark, hudi_dir, as_of=_HUDI_T1)
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    assert got == want
    assert read_hudi(spark, hudi_dir, as_of=_HUDI_T1).count() == orders.count()


def test_as_of_before_first_instant_refuses(spark, hudi_dir):
    with pytest.raises(SparkError):
        read_hudi(spark, hudi_dir, as_of="19990101000000")


def test_missing_timeline_refuses(spark, tmp_path):
    with pytest.raises(SparkError):
        read_hudi(spark, str(tmp_path))


# ---------------------------------------------------------------------------
# merge-on-read
# ---------------------------------------------------------------------------

from datafusion_catalogprovider_glue_spark.operators.catalog_ops import (  # noqa: E402
    _HUDI_MOR_T1,
    _hudi_mor_fixture,
)
from datafusion_catalogprovider_glue_spark.sources.hudi import (  # noqa: E402
    hudi_mor_instants,
    read_hudi_mor,
)


@pytest.fixture(scope="module")
def mor_dir(spark):
    return _hudi_mor_fixture(spark, SF_SMOKE)


def test_mor_timeline_has_both_actions(mor_dir):
    acts = [a for _t, a in hudi_mor_instants(mor_dir)]
    assert acts == ["commit", "deltacommit"]  # inflight marker excluded


def test_mor_snapshot_merges_log_over_base(spark, mor_dir):
    orders = load_table(spark, SF_SMOKE, "orders")
    want = {
        (r.o_orderkey,
         round(r.o_totalprice * (3 if r.o_orderkey % 10 == 0 else 1), 2))
        for r in orders.select("o_orderkey", "o_totalprice").collect()
    }
    got = {
        (r.o_orderkey, round(r.o_totalprice, 2))
        for r in read_hudi_mor(spark, mor_dir, key_col="o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    assert got == want


def test_mor_merge_touches_only_price(spark, mor_dir):
    """Partial-payload merge must leave every non-updated column
    byte-identical to the base row."""
    orders = load_table(spark, SF_SMOKE, "orders")
    base = {r.o_orderkey: (r.o_orderstatus, r.o_custkey) for r in orders.collect()}
    for r in read_hudi_mor(spark, mor_dir, key_col="o_orderkey").collect():
        assert (r.o_orderstatus, r.o_custkey) == base[r.o_orderkey]


def test_mor_read_optimized_ignores_log(spark, mor_dir):
    orders = load_table(spark, SF_SMOKE, "orders")
    ro = read_hudi_mor(spark, mor_dir, key_col="o_orderkey", read_optimized=True)
    assert {
        (r.o_orderkey, r.o_totalprice)
        for r in ro.select("o_orderkey", "o_totalprice").collect()
    } == {
        (r.o_orderkey, r.o_totalprice)
        for r in orders.select("o_orderkey", "o_totalprice").collect()
    }


def test_mor_as_of_before_deltacommit_equals_read_optimized(spark, mor_dir):
    pinned = read_hudi_mor(spark, mor_dir, key_col="o_orderkey", as_of=_HUDI_MOR_T1)
    ro = read_hudi_mor(spark, mor_dir, key_col="o_orderkey", read_optimized=True)
    assert sorted(map(tuple, pinned.collect())) == sorted(map(tuple, ro.collect()))
