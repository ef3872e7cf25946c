"""Local, AWS-free stand-in for the Glue Data Catalog API.

Serves Glue-API-shaped dicts (``GetDatabases`` / ``GetTables`` /
``GetTable``) from an in-memory fixture, so the catalog layer is fully
testable without AWS — the reference's own CI never touches AWS either
(SURVEY.md §5).  The real path is a thin boto3 client behind the same
three methods (``boto3.client("glue")`` responses are exactly this
shape), gated behind an import-try.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from datafusion_catalogprovider_glue_spark.errors import AwsError

# Glue type strings for the driver's testdata tables (FIXTURES.md §1).
TESTDATA_GLUE_COLUMNS: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}

_PARQUET_SD = {
    "InputFormat": "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
    "OutputFormat": "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat",
    "SerdeInfo": {
        "SerializationLibrary": "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"
    },
}


def parquet_table(
    database: str,
    name: str,
    location: str,
    columns: list[tuple[str, str]],
    partition_keys: Optional[list[tuple[str, str]]] = None,
    parameters: Optional[dict[str, str]] = None,
) -> dict:
    """Build a Glue ``Table`` dict for a parquet table."""
    return {
        "DatabaseName": database,
        "Name": name,
        "Parameters": dict(parameters or {}),
        "PartitionKeys": [
            {"Name": n, "Type": t} for n, t in (partition_keys or [])
        ],
        "StorageDescriptor": {
            **_PARQUET_SD,
            "Columns": [{"Name": n, "Type": t} for n, t in columns],
            "Location": location,
        },
    }


class FakeGlueClient:
    """Glue API double: ``{db: {table: TableDict}}`` behind the three
    calls the reference makes (glue.rs:70-75, 105-110, 146-157), plus
    ``GetPartitions`` (the call real partitioned Glue tables need when
    their partitions carry explicit per-partition StorageDescriptors
    rather than Hive-style directories under one root)."""

    def __init__(
        self,
        databases: dict[str, dict[str, dict]],
        page_size: int = 0,
        partitions: Optional[dict[tuple[str, str], list[dict]]] = None,
        column_stats: Optional[dict[tuple[str, str], dict]] = None,
    ):
        self._databases = databases
        # page_size > 0 emulates live Glue's NextToken pagination
        self._page_size = page_size
        # (db, table) -> [{"Values": [...], "StorageDescriptor": {...}}]
        self._partitions = dict(partitions or {})
        # (db, table) -> {column: ColumnStatistics item} — what a real
        # catalog records after `aws glue start-column-statistics-...`
        self._column_stats = dict(column_stats or {})
        # per-API call counts — lets tests pin HOW MANY Glue round
        # trips a code path costs (lazy resolution: exactly one
        # GetTable; register_all: databases x tables)
        self.calls: dict[str, int] = {}

    def _paginate(self, items: list, key: str, token) -> dict:
        start = int(token) if token is not None else 0
        if self._page_size <= 0:
            return {key: items[start:]}
        page = items[start : start + self._page_size]
        out = {key: page}
        if start + self._page_size < len(items):
            out["NextToken"] = str(start + self._page_size)
        return out

    def _count(self, api: str) -> None:
        self.calls[api] = self.calls.get(api, 0) + 1

    def get_databases(self, NextToken=None) -> dict:
        self._count("GetDatabases")
        items = [{"Name": db} for db in sorted(self._databases)]
        return self._paginate(items, "DatabaseList", NextToken)

    def get_tables(self, DatabaseName: str, NextToken=None) -> dict:
        self._count("GetTables")
        try:
            tables = self._databases[DatabaseName]
        except KeyError:
            raise AwsError(f"EntityNotFoundException: database {DatabaseName}")
        items = [tables[t] for t in sorted(tables)]
        return self._paginate(items, "TableList", NextToken)

    def get_table(self, DatabaseName: str, Name: str) -> dict:
        self._count("GetTable")
        try:
            return {"Table": self._databases[DatabaseName][Name]}
        except KeyError:
            raise AwsError(
                f"EntityNotFoundException: table {DatabaseName}.{Name}"
            )

    def get_partitions(
        self, DatabaseName: str, TableName: str, NextToken=None
    ) -> dict:
        """Glue GetPartitions shape: each partition carries its Values
        (one per PartitionKey, in key order) and its own
        StorageDescriptor whose Location may live ANYWHERE — not
        necessarily under the table root.  Paginated like the other
        calls."""
        self._count("GetPartitions")
        if DatabaseName not in self._databases or (
            TableName not in self._databases[DatabaseName]
        ):
            raise AwsError(
                f"EntityNotFoundException: table {DatabaseName}.{TableName}"
            )
        items = self._partitions.get((DatabaseName, TableName), [])
        return self._paginate(items, "Partitions", NextToken)

    def get_column_statistics_for_table(
        self, DatabaseName: str, TableName: str, ColumnNames: list
    ) -> dict:
        """Glue ``GetColumnStatisticsForTable``: per requested column
        either a ColumnStatistics item (ColumnName + StatisticsData
        keyed by Type: LONG/DOUBLE/... with NumberOfNulls /
        NumberOfDistinctValues / Minimum/MaximumValue) or an entry in
        ``Errors`` (ColumnStatisticsNotFound) — real Glue only has
        stats for columns an analysis run covered.  Max 100 columns
        per call, like the live API."""
        self._count("GetColumnStatisticsForTable")
        if len(ColumnNames) > 100:
            raise AwsError("ValidationException: at most 100 ColumnNames")
        if DatabaseName not in self._databases or (
            TableName not in self._databases[DatabaseName]
        ):
            raise AwsError(
                f"EntityNotFoundException: table {DatabaseName}.{TableName}"
            )
        have = self._column_stats.get((DatabaseName, TableName), {})
        out, errors = [], []
        for name in ColumnNames:
            if name in have:
                out.append(have[name])
            else:
                errors.append(
                    {
                        "ColumnName": name,
                        "Error": {
                            "ErrorCode": "ColumnStatisticsNotFound",
                            "ErrorMessage": f"no statistics for {name}",
                        },
                    }
                )
        return {"ColumnStatisticsList": out, "Errors": errors}

    @classmethod
    def from_json(cls, path: str) -> "FakeGlueClient":
        with open(path) as fh:
            return cls(json.load(fh))


def glue_column_statistics(
    client, database: str, table: str, columns: list
) -> dict[str, dict]:
    """Ingest Glue-recorded column statistics into the engine's CBO
    profile shape ({column: {n_nulls, n_distinct, min_val, max_val}})
    — the catalog-plane twin of the one-pass computed profile
    (operators/catalog_ops.catalog_column_stats): where the catalog
    already analyzed a column, planning reads KB of API response
    instead of re-scanning the table; absent columns are simply
    missing from the result and the caller recomputes them.  Parses
    the Long/Double/Boolean StatisticsData arms (the numeric subset a
    CBO consumes); other arms are skipped rather than misread."""
    resp = client.get_column_statistics_for_table(
        DatabaseName=database, TableName=table, ColumnNames=list(columns)
    )
    out: dict[str, dict] = {}
    for item in resp.get("ColumnStatisticsList") or []:
        data = item.get("StatisticsData") or {}
        kind = data.get("Type")
        arm = {
            "LONG": "LongColumnStatisticsData",
            "DOUBLE": "DoubleColumnStatisticsData",
            "BOOLEAN": "BooleanColumnStatisticsData",
        }.get(kind)
        if arm is None or arm not in data:
            continue
        d = data[arm]
        if kind == "BOOLEAN":
            # Real Glue BooleanColumnStatisticsData carries
            # NumberOfTrues/NumberOfFalses (no NDV field); derive the
            # distinct count from which sides are populated so a CBO
            # consumer never sees n_distinct=0 for an analyzed column.
            n_distinct = int(int(d.get("NumberOfTrues", 0)) > 0) + int(
                int(d.get("NumberOfFalses", 0)) > 0
            )
        else:
            n_distinct = int(d.get("NumberOfDistinctValues", 0))
        prof = {
            "n_nulls": int(d.get("NumberOfNulls", 0)),
            "n_distinct": n_distinct,
        }
        if "MinimumValue" in d:
            prof["min_val"] = float(d["MinimumValue"])
        if "MaximumValue" in d:
            prof["max_val"] = float(d["MaximumValue"])
        out[item["ColumnName"]] = prof
    return out


def testdata_fixture(sf_dir: str, database: str = "default") -> FakeGlueClient:
    """FakeGlue catalog describing the driver's testdata tables."""
    tables = {
        name: parquet_table(
            database,
            name,
            os.path.join(sf_dir, f"{name}.parquet"),
            cols,
        )
        for name, cols in TESTDATA_GLUE_COLUMNS.items()
    }
    return FakeGlueClient({database: tables})


def boto3_glue_client(region_name: Optional[str] = None):
    """The real AWS path (untested live, mirroring the reference whose
    AWS path is also CI-untested — SURVEY.md §5).  boto3 responses have
    exactly the FakeGlueClient shape."""
    try:
        import boto3  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover
        raise AwsError(
            "boto3 is not installed; use FakeGlueClient for local catalogs"
        ) from exc
    return boto3.client("glue", region_name=region_name)  # pragma: no cover
