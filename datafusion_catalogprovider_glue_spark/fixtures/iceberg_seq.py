"""Fixture: an Iceberg v2 table pinning SEQUENCE-NUMBER SCOPING of
positional deletes (format spec §position-delete-files: a delete file
applies only to data files with sequence number <= its own).

Timeline:
* snapshot 2 — data file at sequence 1 + position-delete file at
  sequence 2 masking every supplier with s_suppkey % 7 == 0 (the
  delete APPLIES: 1 <= 2);
* snapshot 3 — the SAME data file re-added at sequence 3 (delete/
  re-insert compaction), the delete file still present at sequence 2
  (the delete must NOT apply: 3 > 2 — every row returns).

A reader that ignores sequence numbers returns the masked rows in
snapshot 3 too and hash-mismatches."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table


def build_iceberg_pos_delete_seq(spark: SparkSession, sf_dir: str) -> str:
    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        write_avro_container,
    )

    table_dir = scan_dir(sf_dir, "supplier_iceberg_seq")
    meta_dir = os.path.join(table_dir, "metadata")
    if os.path.exists(os.path.join(meta_dir, "version-hint.text")):
        return table_dir

    supplier = load_table(spark, sf_dir, "supplier")
    ordered = supplier.repartition(1).sortWithinPartitions("s_suppkey")

    def _stage(name: str, df) -> int:
        staging = os.path.join(table_dir, f"_stage_{name}")
        df.write.mode("overwrite").parquet(staging)
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

    n_full = _stage("full.parquet", ordered)
    w = Window.orderBy("s_suppkey")
    dels = (
        supplier.select("s_suppkey")
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .filter(F.col("s_suppkey") % 7 == 0)
        .select(F.lit("data/full.parquet").alias("file_path"), F.col("pos"))
    )
    n_dels = _stage("deletes.parquet", dels.repartition(1))

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
    write_avro_container(
        os.path.join(meta_dir, "manifest-s2.avro"),
        manifest_schema,
        [
            (0, 0, "data/full.parquet", "PARQUET", n_full, 1),
            (1, 1, "data/deletes.parquet", "PARQUET", n_dels, 2),
        ],
    )
    write_avro_container(
        os.path.join(meta_dir, "manifest-s3.avro"),
        manifest_schema,
        [
            (1, 0, "data/full.parquet", "PARQUET", n_full, 3),
            (0, 1, "data/deletes.parquet", "PARQUET", n_dels, 2),
        ],
    )
    for snap, manifest in ((2, "manifest-s2.avro"), (3, "manifest-s3.avro")):
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
        "table-uuid": "supplier-iceberg-seq-fixture",
        "location": table_dir,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": schema_fields}],
        "current-snapshot-id": 3,
        "snapshots": [
            {"snapshot-id": 2, "manifest-list": "metadata/snap-2.avro"},
            {"snapshot-id": 3, "manifest-list": "metadata/snap-3.avro"},
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return table_dir
