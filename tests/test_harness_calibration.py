"""Calibration pins for the driver-gate replica (tests/oracle_harness).

Round 1 proved the old harness normalized away both real driver
failure classes (CORRECTNESS_r01.json): the HUGEINT→float64 dtype
mismatch (scan_delta FAIL) and the unhashable-ndarray canon crash
(agg_percentile ERR).  These tests re-create both classes on minimal
fixtures and assert the corrected harness FLAGS them — if a future
edit re-softens the canon, these go red.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.oracle_harness import (
    _cell,
    canon,
    check_rows_only,
    compare,
    lint_oracle,
    lint_spark_schema,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 10), (2, 40)) v(k, x)")
    yield c
    c.close()


def test_hugeint_class_reproduced(con):
    """The exact round-1 scan_delta failure: DuckDB SUM(INTEGER) →
    HUGEINT → pandas float64, vs Spark int64.  The lint must reject
    the uncast oracle, and the dtype-tagged canon must distinguish
    the values even without the lint."""
    bad = lint_oracle(con, "SELECT k, SUM(x) AS key_sum FROM t GROUP BY k")
    assert bad and "HUGEINT" in bad[0]
    ok = lint_oracle(
        con, "SELECT k, CAST(SUM(x) AS BIGINT) AS key_sum FROM t GROUP BY k"
    )
    assert ok == []
    # value-level: int64 50 must never hash-equal float64 50.0
    assert _cell(np.int64(50)) != _cell(np.float64(50.0))
    i_rows = canon(pd.DataFrame({"key_sum": pd.array([50], dtype="int64")}))
    f_rows = canon(pd.DataFrame({"key_sum": pd.array([50.0], dtype="float64")}))
    assert i_rows != f_rows


def test_array_class_reproduced(spark):
    """The exact round-1 agg_percentile ERR: array-typed output cells
    are unhashable in the driver's pandas sort.  Both the static lint
    and the canon itself must flag an array column."""
    df = spark.createDataFrame([(1, [0.25, 0.5])], "k int, quartiles array<double>")
    bad = lint_spark_schema(df)
    assert bad and "quartiles" in bad[0]
    # the canon crash itself (two rows so sort_values actually factorizes)
    pdf = pd.DataFrame(
        {"k": [1, 2], "quartiles": [np.array([0.25, 0.5]), np.array([0.1, 0.2])]}
    )
    with pytest.raises(TypeError):
        canon(pdf)
    with pytest.raises(AssertionError, match="crash the driver"):
        check_rows_only(df)


def test_nested_oracle_types_flagged(con):
    assert lint_oracle(con, "SELECT [1, 2] AS arr")  # LIST
    assert lint_oracle(con, "SELECT {'a': 1} AS st")  # STRUCT
    assert lint_oracle(con, "SELECT 1 AS a, 'x' AS b") == []


def test_decimal_vs_float_distinct():
    """Decimal output must not silently equal float output — the old
    harness coerced Decimal→float and could mask a dtype mismatch."""
    from decimal import Decimal

    assert _cell(Decimal("1.5")) != _cell(1.5)


def test_matching_sides_still_pass(spark, con):
    """Positive control: a well-shaped query passes the full compare."""
    df = spark.createDataFrame([(1, 10), (2, 40)], "k int, x int")
    compare(
        df.groupBy("k").sum("x").withColumnRenamed("sum(x)", "sx"),
        con,
        "SELECT k, CAST(SUM(x) AS BIGINT) AS sx FROM t GROUP BY k",
    )
