"""Fixture: a days(ts)-partitioned Iceberg table over the events
testdata — the most common real-Iceberg layout (spec
§partition-transforms) — written by the engine's own partitioned
writer (sources/iceberg_writer.py + sources/iceberg_transforms.py),
idempotent per scale factor."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table


def build_iceberg_days_events(spark: SparkSession, sf_dir: str) -> str:
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )

    table_dir = scan_dir(sf_dir, "events_iceberg_days")
    if os.path.exists(
        os.path.join(table_dir, "metadata", "version-hint.text")
    ):
        return table_dir
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    append_iceberg(events, table_dir, partition_by="ts", transform="day")
    return table_dir
