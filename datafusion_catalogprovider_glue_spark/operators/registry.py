"""Query registry feeding the driver contract (__spark_entry__.py).

Each operator module registers named queries with an optional DuckDB
oracle SQL string.  ``queries()`` / ``oracle_sql()`` in
``__spark_entry__`` are thin views over this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional oracle SQL.

    The oracle must be ANSI SQL runnable by DuckDB over views named
    exactly like the testdata tables, with every computed column
    aliased identically to the Spark side (driver hash-compares by
    column name).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all_operator_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from datafusion_catalogprovider_glue_spark.operators import (  # noqa: F401
        analytics,
        bpe,
        catalog_ops,
        curation,
        dedup,
        funnel,
        geo,
        graph,
        layout,
        meta_ops,
        multimodal,
        packing,
        relational,
        similarity,
        text,
        tpch_extra,
        tpch_rest,
    )
    from datafusion_catalogprovider_glue_spark.streaming import (  # noqa: F401
        joins,
        stateful,
        windows,
    )
