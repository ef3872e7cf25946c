"""Fixtures: two-commit Hudi copy-on-write and merge-on-read orders
tables (timeline files hand-written per the Hudi layout spec), built
once per scale factor.  Moved out of operators/ so the one-time
builder conveniences (driver-side collect of the delta-log records,
local file moves) stay off the production operator surface."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table


_HUDI_T1 = "20240101000000"
_HUDI_T2 = "20240102000000"
_HUDI_MOR_T1 = "20240201000000"
_HUDI_MOR_T2 = "20240202000000"


def build_hudi_cow(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a two-commit CoW orders table once per scale factor.

    Commit t1 writes the table as two file groups (even / odd order
    keys); commit t2 REWRITES the even file group with o_totalprice
    doubled (the CoW update path: a new base file under a new instant
    for the same fileId).  Snapshot read must therefore stitch
    {even@t2, odd@t1}; point-in-time at t1 must see the original."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    table_dir = scan_dir(sf_dir, "orders_hudi")
    tl_dir = os.path.join(table_dir, ".hoodie")
    done = os.path.join(tl_dir, f"{_HUDI_T2}.commit")
    if os.path.exists(done):
        return table_dir
    orders = load_table(spark, sf_dir, "orders")

    def _stage(name: str, df) -> int:
        staging = os.path.join(table_dir, f"_stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        shutil.move(part, os.path.join(table_dir, name))
        shutil.rmtree(staging)
        return 0

    os.makedirs(tl_dir, exist_ok=True)
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    odd = orders.filter(F.col("o_orderkey") % 2 == 1)
    f_even_1 = f"fg-even_0-0-0_{_HUDI_T1}.parquet"
    f_odd_1 = f"fg-odd_0-0-0_{_HUDI_T1}.parquet"
    f_even_2 = f"fg-even_0-1-0_{_HUDI_T2}.parquet"
    _stage(f_even_1, even)
    _stage(f_odd_1, odd)
    _stage(f_even_2, even.withColumn("o_totalprice", F.col("o_totalprice") * 2))
    with open(os.path.join(tl_dir, "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.name=orders_hudi\n")
        fh.write("hoodie.table.type=COPY_ON_WRITE\n")
    with open(os.path.join(tl_dir, f"{_HUDI_T1}.commit"), "w") as fh:
        json.dump(
            {
                "partitionToWriteStats": {
                    "": [
                        {"fileId": "fg-even", "path": f_even_1},
                        {"fileId": "fg-odd", "path": f_odd_1},
                    ]
                }
            },
            fh,
        )
    # an inflight marker that must be ignored by the timeline reader
    open(os.path.join(tl_dir, f"{_HUDI_T2}.commit.inflight"), "w").close()
    with open(os.path.join(tl_dir, f"{_HUDI_T2}.commit"), "w") as fh:
        json.dump(
            {
                "partitionToWriteStats": {
                    "": [{"fileId": "fg-even", "path": f_even_2}]
                }
            },
            fh,
        )
    return table_dir


def build_hudi_mor(spark: SparkSession, sf_dir: str) -> str:
    """Two-instant MOR orders table: commit t1 writes two base file
    groups; deltacommit t2 appends an Avro log with PARTIAL records
    (o_orderkey, o_totalprice tripled) for keys divisible by 10 —
    snapshot reads must merge the log over the base, read-optimized
    reads must ignore it."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        write_avro_container,
    )

    table_dir = scan_dir(sf_dir, "orders_hudi_mor")
    tl_dir = os.path.join(table_dir, ".hoodie")
    done = os.path.join(tl_dir, f"{_HUDI_MOR_T2}.deltacommit")
    if os.path.exists(done):
        return table_dir
    orders = load_table(spark, sf_dir, "orders")

    def _stage(name: str, df) -> None:
        staging = os.path.join(table_dir, f"_stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        shutil.move(part, os.path.join(table_dir, name))
        shutil.rmtree(staging)

    os.makedirs(tl_dir, exist_ok=True)
    f_even = f"fg-even_0-0-0_{_HUDI_MOR_T1}.parquet"
    f_odd = f"fg-odd_0-0-0_{_HUDI_MOR_T1}.parquet"
    _stage(f_even, orders.filter(F.col("o_orderkey") % 2 == 0))
    _stage(f_odd, orders.filter(F.col("o_orderkey") % 2 == 1))
    log_name = f".fg-even_{_HUDI_MOR_T1}.log.1_0-1-0.avro"
    upd = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", (F.col("o_totalprice") * 3).alias("o_totalprice"))
        .collect()
    )
    write_avro_container(
        os.path.join(table_dir, log_name),
        T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("o_totalprice", T.DoubleType()),
            ]
        ),
        [(r.o_orderkey, r.o_totalprice) for r in upd],
    )
    with open(os.path.join(tl_dir, "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.name=orders_hudi_mor\n")
        fh.write("hoodie.table.type=MERGE_ON_READ\n")
    with open(os.path.join(tl_dir, f"{_HUDI_MOR_T1}.commit"), "w") as fh:
        json.dump(
            {
                "partitionToWriteStats": {
                    "": [
                        {"fileId": "fg-even", "path": f_even},
                        {"fileId": "fg-odd", "path": f_odd},
                    ]
                }
            },
            fh,
        )
    open(os.path.join(tl_dir, f"{_HUDI_MOR_T2}.deltacommit.inflight"), "w").close()
    with open(done, "w") as fh:
        json.dump(
            {
                "partitionToWriteStats": {
                    "": [{"fileId": "fg-even", "path": log_name}]
                }
            },
            fh,
        )
    return table_dir
