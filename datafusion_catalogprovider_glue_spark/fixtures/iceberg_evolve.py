"""Fixture: an Iceberg v2 table pinning SCHEMA EVOLUTION (format spec
§schema-evolution / §column-projection): columns are identified by
FIELD ID, so a rename keeps serving data written under the old name
and a column added later reads as null from older files.

Timeline:
* schema 0 — (1 p_partkey long, 2 p_name string, 3 p_retailprice
  double); data file ``even.parquet`` (p_partkey % 2 == 0) written
  under these names;
* schema 1 (current) — field 2 RENAMED p_name → part_name, field 4
  p_brand string ADDED; data file ``odd.parquet`` (p_partkey % 2 == 1)
  written under the new names with real p_brand values;
* the current snapshot lists BOTH files.

A name-only reader returns part_name = NULL for every even part (the
rename breaks it) and hash-mismatches; the field-id resolution maps
even.parquet's p_name onto part_name and fills p_brand with null."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table


def build_iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> str:
    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        write_avro_container,
    )

    table_dir = scan_dir(sf_dir, "part_iceberg_evolve")
    meta_dir = os.path.join(table_dir, "metadata")
    if os.path.exists(os.path.join(meta_dir, "version-hint.text")):
        return table_dir

    part = load_table(spark, sf_dir, "part")

    def _stage(name: str, df) -> int:
        staging = os.path.join(table_dir, f"_stage_{name}")
        df.repartition(1).write.mode("overwrite").parquet(staging)
        pfile = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
        shutil.move(pfile, os.path.join(table_dir, "data", name))
        n = df.count()
        shutil.rmtree(staging)
        return n

    n_even = _stage(
        "even.parquet",
        part.filter(F.col("p_partkey") % 2 == 0).select(
            "p_partkey", "p_name", "p_retailprice"
        ),
    )
    n_odd = _stage(
        "odd.parquet",
        part.filter(F.col("p_partkey") % 2 == 1).select(
            "p_partkey",
            F.col("p_name").alias("part_name"),
            "p_retailprice",
            "p_brand",
        ),
    )

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
        os.path.join(meta_dir, "manifest-s1.avro"),
        manifest_schema,
        [
            (0, 0, "data/even.parquet", "PARQUET", n_even, 1),
            (1, 0, "data/odd.parquet", "PARQUET", n_odd, 2),
        ],
    )
    write_avro_container(
        os.path.join(meta_dir, "snap-1.avro"),
        list_schema,
        [
            (
                "metadata/manifest-s1.avro",
                os.path.getsize(os.path.join(meta_dir, "manifest-s1.avro")),
                1,
            )
        ],
    )
    schema0 = {
        "schema-id": 0,
        "type": "struct",
        "fields": [
            {"id": 1, "name": "p_partkey", "required": False, "type": "long"},
            {"id": 2, "name": "p_name", "required": False, "type": "string"},
            {
                "id": 3,
                "name": "p_retailprice",
                "required": False,
                "type": "double",
            },
        ],
    }
    schema1 = {
        "schema-id": 1,
        "type": "struct",
        "fields": [
            {"id": 1, "name": "p_partkey", "required": False, "type": "long"},
            {"id": 2, "name": "part_name", "required": False, "type": "string"},
            {
                "id": 3,
                "name": "p_retailprice",
                "required": False,
                "type": "double",
            },
            {"id": 4, "name": "p_brand", "required": False, "type": "string"},
        ],
    }
    meta = {
        "format-version": 2,
        "table-uuid": "part-iceberg-evolve-fixture",
        "location": table_dir,
        "current-schema-id": 1,
        "schemas": [schema0, schema1],
        "current-snapshot-id": 1,
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"},
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return table_dir
