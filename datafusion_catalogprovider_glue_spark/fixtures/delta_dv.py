"""Fixture: a Delta table whose single data file carries a DELETION
VECTOR masking a known key set (PROTOCOL.md §Deletion Vectors).

Layout built once per scale factor:
* ``nation.parquet`` — the nation table sorted by n_nationkey (one
  file, so row_index is the rank in that order);
* ``deletion_vector_<uuid>.bin`` — u-type sidecar written by the
  format-faithful encoder in sources/dv.py, deleting the row indexes
  of ``DELETED_KEYS``;
* a one-commit ``_delta_log`` whose add action carries the DV
  descriptor.

The reader must surface exactly nation minus DELETED_KEYS — the
oracle is plain SQL with a NOT IN."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table

DELETED_KEYS = (3, 7, 19)


def build_nation_delta_dv(spark: SparkSession, sf_dir: str) -> str:
    from datafusion_catalogprovider_glue_spark.sources.dv import write_dv_file

    table_dir = scan_dir(sf_dir, "nation_delta_dv")
    log_dir = os.path.join(table_dir, "_delta_log")
    commit = os.path.join(log_dir, f"{0:020d}.json")
    if os.path.exists(commit):
        return table_dir

    nation = load_table(spark, sf_dir, "nation").orderBy("n_nationkey")
    staging = os.path.join(table_dir, "_stage")
    nation.coalesce(1).sortWithinPartitions("n_nationkey").write.mode(
        "overwrite"
    ).parquet(staging)
    part = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(staging)
        for f in fs
        if f.endswith(".parquet")
    )
    os.makedirs(table_dir, exist_ok=True)
    shutil.move(part, os.path.join(table_dir, "nation.parquet"))
    shutil.rmtree(staging)

    # row_index of each deleted key = its rank in the file's sort order
    keys = [r.n_nationkey for r in nation.select("n_nationkey").collect()]
    positions = [i for i, k in enumerate(keys) if k in DELETED_KEYS]
    dv = write_dv_file(table_dir, positions)

    meta = {
        "metaData": {
            "id": "nation-delta-dv",
            "schemaString": nation.schema.json(),
            "partitionColumns": [],
            "format": {"provider": "parquet"},
        }
    }
    os.makedirs(log_dir, exist_ok=True)
    with open(commit, "w") as fh:
        fh.write(json.dumps(meta) + "\n")
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "nation.parquet",
                        "partitionValues": {},
                        "deletionVector": dv,
                    }
                }
            )
            + "\n"
        )
    return table_dir
