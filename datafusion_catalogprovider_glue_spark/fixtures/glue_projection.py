"""Fixture: a date-projected Glue table layout — events split by day
into template-addressed directories (``day-YYYY-MM-DD``), NON-Hive
names so directory discovery can't bind the partition column, and the
partition value itself absent from the data files.  Exercises AWS Glue
PARTITION PROJECTION registration: the catalog must enumerate the
configured date range, substitute ``storage.location.template``, skip
configured-but-absent days, and re-attach ``dt`` as a typed literal."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table


def build_projected_days(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build once; returns (table_root, location_template)."""
    root = scan_dir(sf_dir, "glue_projection")
    marker = os.path.join(root, "_done.json")
    template = os.path.join(root, "day-${dt}")
    if os.path.exists(marker):
        return os.path.join(root, "table_root"), template

    ev = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    days = sorted(r["dt"] for r in ev.select("dt").distinct().collect())
    for d in days:
        (
            ev.filter(F.col("dt") == d)
            .drop("dt")
            .write.mode("overwrite")
            .parquet(os.path.join(root, f"day-{d}"))
        )
    os.makedirs(os.path.join(root, "table_root"), exist_ok=True)
    with open(marker, "w") as fh:
        json.dump({"days": days}, fh)
    return os.path.join(root, "table_root"), template
