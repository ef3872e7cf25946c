"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables, then compares row count, column-name set, and the
order-insensitive multiset of values — strictly (exact equality,
including floats: the operator library is written so numeric results
are bit-identical across engines, see functions/__init__.py).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from datafusion_catalogprovider_glue_spark.tables import TABLE_NAMES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_canon = _canon(s_rows, s_cols)
    d_canon = _canon(d_rows, d_cols)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(
            f"value mismatch ({len(diffs)}+ rows differ); first diffs "
            f"(spark, duckdb): {diffs}"
        )
