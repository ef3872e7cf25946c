"""Fixture: an APPEND-ONLY three-snapshot Iceberg v2 table for the
incremental-append scan — supplier split by s_suppkey % 3, one chunk
appended per snapshot (1 → chunk0, 2 → +chunk1, 3 → +chunk2), each
snapshot's manifest listing the cumulative file set the way a real
append commit's manifest chain does."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table

# Deliberately NON-monotonic snapshot IDs (real Iceberg IDs are random
# longs): sorted order [331, 944273, 6781534021] ≠ commit order, so any
# reader that orders the chain by ID value scrambles the appends and
# fails the hash gate.  sequence-number / snapshot-log carry the truth.
SNAP_IDS = (6781534021, 331, 944273)


def build_iceberg_append_chain(spark: SparkSession, sf_dir: str) -> str:
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        write_avro_container,
    )

    table_dir = scan_dir(sf_dir, "supplier_iceberg_appends_v2")
    meta_dir = os.path.join(table_dir, "metadata")
    if os.path.exists(os.path.join(meta_dir, "version-hint.text")):
        return table_dir

    supplier = load_table(spark, sf_dir, "supplier")

    def _stage(name: str, df) -> int:
        staging = os.path.join(table_dir, f"_stage_{name}")
        df.repartition(1).write.mode("overwrite").parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
        shutil.move(part, os.path.join(table_dir, "data", name))
        n = df.count()
        shutil.rmtree(staging)
        return n

    counts = [
        _stage(f"chunk{i}.parquet", supplier.filter(F.col("s_suppkey") % 3 == i))
        for i in range(3)
    ]

    os.makedirs(meta_dir, exist_ok=True)
    manifest_schema = T.StructType(
        [
            T.StructField("status", T.IntegerType()),
            T.StructField("content", T.IntegerType()),
            T.StructField("file_path", T.StringType()),
            T.StructField("file_format", T.StringType()),
            T.StructField("record_count", T.LongType()),
            T.StructField("sequence_number", T.LongType()),
        ]
    )
    list_schema = T.StructType(
        [
            T.StructField("manifest_path", T.StringType()),
            T.StructField("manifest_length", T.LongType()),
            T.StructField("added_snapshot_id", T.LongType()),
        ]
    )
    for ordinal, snap in enumerate(SNAP_IDS, start=1):
        rows = [
            (0, 0, f"data/chunk{i}.parquet", "PARQUET", counts[i], i + 1)
            for i in range(ordinal)  # cumulative: commit N holds chunks 0..N-1
        ]
        manifest = f"manifest-append-s{snap}.avro"
        write_avro_container(
            os.path.join(meta_dir, manifest), manifest_schema, rows
        )
        write_avro_container(
            os.path.join(meta_dir, f"snap-{snap}.avro"),
            list_schema,
            [
                (
                    f"metadata/{manifest}",
                    os.path.getsize(os.path.join(meta_dir, manifest)),
                    snap,
                )
            ],
        )
    to_iceberg = {
        "bigint": "long", "int": "int", "double": "double",
        "string": "string", "float": "float", "boolean": "boolean",
        "date": "date", "timestamp_ntz": "timestamp",
    }
    schema_fields = [
        {
            "id": i + 1,
            "name": f.name,
            "required": False,
            "type": to_iceberg[f.dataType.simpleString()],
        }
        for i, f in enumerate(supplier.schema.fields)
    ]
    meta = {
        "format-version": 2,
        "table-uuid": "supplier-iceberg-append-chain-fixture",
        "location": table_dir,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": schema_fields}],
        "current-snapshot-id": SNAP_IDS[-1],
        "snapshots": [
            {
                "snapshot-id": s,
                "sequence-number": k,
                "manifest-list": f"metadata/snap-{s}.avro",
            }
            for k, s in enumerate(SNAP_IDS, start=1)
        ],
        "snapshot-log": [
            {"timestamp-ms": 1700000000000 + k, "snapshot-id": s}
            for k, s in enumerate(SNAP_IDS, start=1)
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return table_dir
