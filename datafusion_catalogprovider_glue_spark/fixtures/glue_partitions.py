"""Fixture: a Glue table whose partitions live in SCATTERED
directories (the ALTER TABLE ADD PARTITION ... LOCATION layout) —
exercising explicit GetPartitions registration, which directory
discovery cannot see.

customer splits by c_mktsegment into one parquet directory per
segment under non-Hive names (``seg_0`` ... ``seg_4``), with the
partition column REMOVED from the data files per the Hive convention;
the table root itself stays EMPTY, so any reader that falls back to
listing under the root returns nothing and hash-mismatches."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table


def build_scattered_partitions(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list[dict]]:
    """Build once; returns (table_root, partition list) where each
    partition dict is Glue GetPartitions shaped."""
    root = scan_dir(sf_dir, "glue_scattered")
    manifest = os.path.join(root, "_partitions.json")
    if os.path.exists(manifest):
        with open(manifest) as fh:
            return os.path.join(root, "table_root"), json.load(fh)

    customer = load_table(spark, sf_dir, "customer")
    segments = sorted(
        r.c_mktsegment
        for r in customer.select("c_mktsegment").distinct().collect()
    )
    partitions = []
    for i, seg in enumerate(segments):
        loc = os.path.join(root, f"seg_{i}")
        (
            customer.filter(customer.c_mktsegment == seg)
            .drop("c_mktsegment")
            .write.mode("overwrite")
            .parquet(loc)
        )
        partitions.append(
            {"Values": [seg], "StorageDescriptor": {"Location": loc}}
        )
    os.makedirs(os.path.join(root, "table_root"), exist_ok=True)
    with open(manifest, "w") as fh:
        json.dump(partitions, fh)
    return os.path.join(root, "table_root"), partitions
