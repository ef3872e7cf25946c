"""The t2 gate, replicated locally: every query with an oracle must
hash-match DuckDB at sf0.01; oracle-less queries must at least run."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECTNESS
from tests.oracle_harness import check_rows_only, compare, duckdb_conn

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_CORRECTNESS)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    df = QUERIES[name](spark, SF_CORRECTNESS)
    if name in ORACLE:
        compare(df, con, ORACLE[name])
    else:
        # rows-only keys still pass through the driver's canonicalizer,
        # so the shape lints apply to them too (round-1 lesson:
        # agg_approx_percentile ERRORED despite having no oracle).
        assert check_rows_only(df) >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
