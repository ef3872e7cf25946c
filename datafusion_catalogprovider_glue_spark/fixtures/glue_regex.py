"""Fixture: customer rendered as raw LOG LINES for the RegexSerDe gate
key — ``cust <key> seg=<segment> nation:<nationkey> bal[<acctbal>]``
plus a deliberate garbage line that must parse as an all-NULL row
(Hive RegexSerDe's non-matching-line contract)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table

REGEX_PATTERN = r"^cust (\d+) seg=(\S+) nation:(\d+) bal\[(-?[0-9.]+)\]$"


def build_regex_log(spark: SparkSession, sf_dir: str) -> str:
    root = scan_dir(sf_dir, "glue_regex_log")
    marker = os.path.join(root, "_SUCCESS_FIXTURE")
    if os.path.exists(marker):
        return os.path.join(root, "lines")

    c = load_table(spark, sf_dir, "customer")
    line = F.concat(
        F.lit("cust "),
        F.col("c_custkey").cast("string"),
        F.lit(" seg="),
        F.col("c_mktsegment"),
        F.lit(" nation:"),
        F.col("c_nationkey").cast("string"),
        F.lit(" bal["),
        # 2-dp decimal string: exact, round-trips through the regex
        F.col("c_acctbal").cast("decimal(12,2)").cast("string"),
        F.lit("]"),
    )
    lines = c.select(line.alias("value")).unionByName(
        spark.createDataFrame(
            [("GARBAGE not a customer line",)], "value string"
        )
    )
    lines.coalesce(2).write.mode("overwrite").text(os.path.join(root, "lines"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return os.path.join(root, "lines")
