"""Iceberg-style snapshot reader — the second open-table-format source.

The reference reads exactly one table format beyond plain files: Delta,
via the deltalake crate's own ``_delta_log`` replay (glue.rs:214-240).
This module extends the same self-reading approach to the OTHER open
table format, Apache Iceberg (spec: https://iceberg.apache.org/spec/),
without requiring the iceberg-spark runtime JAR:

    metadata/version-hint.text  →  metadata/v<N>.metadata.json
      →  snapshot (current-snapshot-id, or a pinned one = time travel)
      →  manifest list (an Avro container file)
      →  manifests (Avro) with per-data-file entries
      →  parquet scan over the live files

Manifests are decoded with the built-in Avro codec
(sources/avro_fallback.py), mirroring how the Delta path self-reads
its JSON log.  Scope is a SUBSET of the spec, mirroring the Delta
reader's scoping: v2 metadata, unpartitioned data files, entry
``status`` handling (0=EXISTING / 1=ADDED kept, 2=DELETED dropped),
flat manifest records carrying the spec's field *names*
(manifest_path; status, file_path, file_format, record_count) without
the spec's nested ``data_file`` struct or field-id metadata.  Schema
comes from the Iceberg schema JSON in the metadata file.

Scale shape is identical to Delta's: the metadata chain is a
driver-side read of KB-sized files (manifest lists exist precisely so
planners can prune manifests without reading them all), and the data
files fan out to executors as an ordinary multi-file parquet scan.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
    decode_container_file,
)

_ICEBERG_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "binary": T.BinaryType(),
}

STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2


def _iceberg_schema_to_spark(schema: dict) -> T.StructType:
    fields = []
    for f in schema.get("fields", []):
        t = f["type"]
        if not isinstance(t, str) or t.startswith("decimal"):
            raise NotImplementedYet(
                f"iceberg reader subset: unsupported type {t!r} for {f['name']!r}"
            )
        # every field nullable, matching the catalog's Glue-derived
        # schemas (glue.rs:535) regardless of Iceberg's `required`
        fields.append(T.StructField(f["name"], _ICEBERG_TO_SPARK[t], True))
    return T.StructType(fields)


def _named(schema: dict, row: tuple) -> dict:
    return {f["name"]: v for f, v in zip(schema["fields"], row)}


class IcebergSnapshot:
    """Resolved file set + schema of an Iceberg table at a snapshot."""

    def __init__(self, table_path: str, snapshot_id: Optional[int] = None):
        self.table_path = table_path
        meta_dir = os.path.join(table_path, "metadata")
        with open(os.path.join(meta_dir, "version-hint.text")) as f:
            version = int(f.read().strip())
        with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as f:
            meta = json.load(f)

        schemas = meta.get("schemas") or [meta.get("schema")]
        current_schema_id = meta.get("current-schema-id", 0)
        schema_json = next(
            (s for s in schemas if s.get("schema-id", 0) == current_schema_id),
            schemas[0],
        )
        self.schema = _iceberg_schema_to_spark(schema_json)

        want = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
        snap = next(
            (s for s in meta["snapshots"] if s["snapshot-id"] == want), None
        )
        if snap is None:
            known = [s["snapshot-id"] for s in meta["snapshots"]]
            raise NotImplementedYet(
                f"snapshot {want} not in table (snapshots: {known})"
            )

        list_schema, list_rows = decode_container_file(
            os.path.join(table_path, snap["manifest-list"])
        )
        self.files: list[str] = []
        self.delete_files: list[str] = []  # v2 positional delete files
        for list_row in list_rows:
            manifest_path = _named(list_schema, list_row)["manifest_path"]
            m_schema, m_rows = decode_container_file(
                os.path.join(table_path, manifest_path)
            )
            for m_row in m_rows:
                entry = _named(m_schema, m_row)
                if entry["status"] == STATUS_DELETED:
                    continue
                fmt = (entry.get("file_format") or "PARQUET").upper()
                if fmt != "PARQUET":
                    raise NotImplementedYet(
                        f"iceberg reader subset: {fmt} data files"
                    )
                path = os.path.join(table_path, entry["file_path"])
                # spec v2 manifest `content`: 0 = data, 1 = position
                # deletes, 2 = equality deletes (unsupported subset)
                content = entry.get("content") or 0
                if content == 0:
                    self.files.append(path)
                elif content == 1:
                    self.delete_files.append(path)
                else:
                    raise NotImplementedYet(
                        "iceberg reader subset: equality delete files"
                    )
        self.files.sort()
        self.delete_files.sort()


def read_iceberg(
    spark: SparkSession, table_path: str, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Load an Iceberg table snapshot (current, or a pinned
    snapshot-id — time travel), applying v2 POSITIONAL DELETE files
    when the snapshot carries them (format spec: delete files list
    (file_path, pos) of deleted rows; a merge-on-read scan drops
    those positions).

    The merge uses the file source's ``_metadata`` struct: every data
    row already knows its (file_name, row_index), so applying deletes
    is ONE left anti join against the loaded delete set — no
    per-file branching, no row numbering pass, and the delete side is
    small by construction (Iceberg compacts it away over time).  At
    100 TB the anti join broadcasts the delete set per the usual
    small-side rule."""
    from pyspark.sql import functions as F

    snap = IcebergSnapshot(table_path, snapshot_id)
    if not snap.files:
        return spark.createDataFrame([], snap.schema)
    data = spark.read.schema(snap.schema).parquet(*snap.files)
    if not snap.delete_files:
        return data
    cols = data.columns
    with_pos = data.select(
        *cols,
        F.col("_metadata.file_name").alias("_if_file"),
        F.col("_metadata.row_index").alias("_if_pos"),
    )
    dels = (
        spark.read.parquet(*snap.delete_files)
        .select(
            F.element_at(F.split(F.col("file_path"), "/"), -1).alias("_if_file"),
            F.col("pos").cast("long").alias("_if_pos"),
        )
        .distinct()
    )
    return with_pos.join(
        F.broadcast(dels), ["_if_file", "_if_pos"], "left_anti"
    ).select(*cols)
