"""Local replica of the driver's correctness gate — calibrated to the
REAL driver's observed behavior in round 1 (CORRECTNESS_r01.json).

Round-1 lesson: the old harness normalized too much and missed both
driver failure classes.  The real driver materializes both sides as
raw pandas frames (Spark ``toPandas``-equivalent, DuckDB ``.df()``),
sorts with ``DataFrame.sort_values`` over the raw columns, and hashes
values dtype-sensitively.  Two consequences this replica now
reproduces faithfully:

1. **Array/map-typed output columns CRASH the gate** — pandas
   ``sort_values`` factorizes object columns and ``numpy.ndarray``
   cells are unhashable (``TypeError``), exactly the ERR recorded for
   ``agg_percentile``/``agg_collect``/``agg_approx_percentile`` in
   round 1.  We deliberately sort the raw frame so the same crash
   happens here first.
2. **Hashing is dtype-sensitive** — DuckDB ``SUM(INTEGER)`` returns
   HUGEINT, which ``.df()`` materializes as float64 (``50.0``), while
   Spark returns int64 (``50``); the driver hash-mismatched
   (``scan_delta`` round 1).  The cell encoding below tags the value
   family (int / float / decimal / bool / str / timestamp / date), so
   int64 ``50`` never equals float64 ``50.0``.

On top of the compare, :func:`lint_oracle` / :func:`lint_spark_schema`
statically reject the two landmine classes (HUGEINT/UHUGEINT oracle
columns; array/map/struct Spark output columns) so a key fails loudly
in-repo before the driver ever samples it.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from datafusion_catalogprovider_glue_spark.tables import TABLE_NAMES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


# --------------------------------------------------------------------------
# driver-faithful canonicalization
# --------------------------------------------------------------------------


def _cell(v) -> str:
    """Dtype-tagged scalar encoding.  The tag makes the hash
    dtype-sensitive the way the driver's is: int64 50 != float64 50.0,
    Decimal != float.  Unknown/unhashable types raise, mirroring the
    driver's ERR behavior."""
    if v is None:
        return "NULL"
    # bool before int: bool is a subclass of int
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (np.integer, int)):
        return f"i:{int(v)}"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "NULL" if math.isnan(f) else f"f:{f!r}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "NULL"
        return f"t:{v.to_pydatetime().replace(tzinfo=None).isoformat(sep=' ', timespec='microseconds')}"
    if isinstance(v, _dt.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat(sep=' ', timespec='microseconds')}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    # arrays / maps / structs: the real driver crashes earlier, in
    # sort_values; this is a backstop in case sorting happened to succeed.
    raise TypeError(f"unhashable result cell type {type(v).__name__}: {v!r}")


def canon(pdf: pd.DataFrame) -> list[str]:
    """The driver's canon: column order by sorted name, row order by
    pandas ``sort_values`` over ALL raw columns (this is where
    array-typed cells blow up, by design), then one dtype-tagged
    string per row."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        # kind irrelevant (full-key sort); raw columns on purpose —
        # ndarray cells must raise TypeError exactly like the driver.
        pdf = pdf.sort_values(by=cols)
    rows = [
        "|".join(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()  # full-row tie-break; sort_values already grouped equal keys
    return rows


# --------------------------------------------------------------------------
# static shape lints (the round-1 landmine classes)
# --------------------------------------------------------------------------

_BAD_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def lint_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """DESCRIBE the oracle and return offending columns: HUGEINT /
    UHUGEINT (pandas-materialize as float64 → dtype mismatch vs Spark
    int64) and LIST/STRUCT/MAP (crash the driver canon)."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = []
    for name, dtype, *_ in desc:
        up = dtype.upper()
        if any(t in up for t in _BAD_DUCK_TYPES):
            bad.append(f"{name} {dtype} (HUGEINT-class: cast to BIGINT)")
        if "[]" in up or up.startswith(("STRUCT", "MAP", "LIST", "UNION")):
            bad.append(f"{name} {dtype} (nested type: gate cannot hash)")
    return bad


def lint_spark_schema(spark_df) -> list[str]:
    """Return offending Spark output columns: ArrayType / MapType /
    StructType crash the driver's pandas sort (round-1 ERR class)."""
    from pyspark.sql import types as T

    return [
        f"{f.name} {f.dataType.simpleString()} (nested type: gate cannot hash)"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


# --------------------------------------------------------------------------
# compare
# --------------------------------------------------------------------------


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    timings: dict | None = None,
) -> None:
    """Driver-gate replica: schema lints first (fail fast on landmine
    shapes), then rows / column names / dtype-sensitive value hash.
    When ``timings`` is passed, records spark_secs (the toPandas
    materialization of the Spark plan) and oracle_secs (lint +
    DuckDB execution) so sweep artifacts can attribute cost."""
    import time as _time

    from pyspark.sql import types as T

    schema_bad = lint_spark_schema(spark_df)
    # DateType can NEVER hash-match an oracle: pandas has no date dtype,
    # so DuckDB DATE materializes as datetime64 (midnight Timestamps)
    # while Spark DateType stays datetime.date objects.  Emit midnight
    # timestamps (date_trunc('day', ...)) on both sides instead.
    schema_bad += [
        f"{f.name} date (DATE output cannot hash-match: use date_trunc('day',...))"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, T.DateType)
    ]
    assert not schema_bad, f"spark output shape would crash the driver: {schema_bad}"
    t0 = _time.time()
    oracle_bad = lint_oracle(con, sql)
    assert not oracle_bad, f"oracle output shape would fail the driver: {oracle_bad}"

    t1 = _time.time()
    s_pdf = spark_df.toPandas()
    t2 = _time.time()
    d_pdf = con.execute(sql).df()
    t3 = _time.time()
    if timings is not None:
        timings["spark_secs"] = t2 - t1
        timings["oracle_secs"] = (t1 - t0) + (t3 - t2)

    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), (
        f"column mismatch: spark={sorted(s_pdf.columns)} duckdb={sorted(d_pdf.columns)}"
    )
    assert len(s_pdf) == len(d_pdf), (
        f"row count mismatch: spark={len(s_pdf)} duckdb={len(d_pdf)}"
    )
    s_canon = canon(s_pdf)
    d_canon = canon(d_pdf)
    if s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:5]
        raise AssertionError(
            f"value mismatch ({len([1 for a, b in zip(s_canon, d_canon) if a != b])} rows"
            f" differ); first diffs (spark, duckdb): {diffs}"
        )


def check_rows_only(spark_df) -> int:
    """The driver's weaker no-oracle check — but with the shape lint
    included, because round 1 proved the canon crash hits no-oracle
    keys too (``agg_approx_percentile`` ERRORED without an oracle)."""
    schema_bad = lint_spark_schema(spark_df)
    assert not schema_bad, f"spark output shape would crash the driver: {schema_bad}"
    n = spark_df.count()
    assert n >= 0
    # the driver still materializes + canonicalizes the frame; make sure
    # that path cannot crash either.
    canon(spark_df.toPandas())
    return n
