"""Testdata table access.

The driver's synthetic tables (see /root/repo/TESTDATA.md) are one
parquet file per table under an sf-dir.  Loading is declarative
(``spark.read.parquet``) so Catalyst gets predicate pushdown, column
pruning and (on partitioned layouts) partition pruning for free —
the same metadata story the reference sets up for DataFusion via
``ListingTable`` (glue.rs:257-272).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects outright ([PARQUET_TYPE_ILLEGAL]).  Read nanos as raw
        # int64 and rebuild a (µs-truncated) timestamp — the same
        # ns→µs truncation the reference accepts for its Timestamp
        # mapping (SURVEY §1.3, glue.rs:466).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every testdata table as a temp view ``<prefix><name>``.

    Mirrors the reference's register_all flow (glue.rs:136-172): every
    table of every database lands in the session catalog so plain SQL
    can reach it.
    """
    names = []
    for name in TABLE_NAMES:
        view = f"{prefix}{name}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names
