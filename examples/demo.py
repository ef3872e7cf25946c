"""End-to-end demo — the Spark twin of the reference's examples/demo.rs.

Mirrors the reference demo flow step for step (citations into
/root/reference):

1. build a Glue client + catalog            (demo.rs:36-66)
2. register every database and table       (register_all, demo.rs:53-64;
   per-table failures printed, not fatal)
3. query information_schema.tables/columns (demo.rs:68-90)
4. sample every table: SELECT * LIMIT 10,  (demo.rs:92-123)
   collecting per-table failures

The reference runs against live AWS Glue + S3; this demo runs fully
offline against the driver testdata through FakeGlue (the boto3 path
is the same `GlueCatalog` with a real client handed in).

Run:  python examples/demo.py [sf_dir]    (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession

from datafusion_catalogprovider_glue_spark.catalog.catalog import GlueCatalog
from datafusion_catalogprovider_glue_spark.catalog.fake_glue import testdata_fixture
from datafusion_catalogprovider_glue_spark.errors import GlueError
from datafusion_catalogprovider_glue_spark.infoschema import (
    information_schema_columns,
    information_schema_tables,
)
from datafusion_catalogprovider_glue_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="glue-spark-demo")

    # 1-2. register the whole catalog (A4: GetDatabases × GetTables)
    catalog = GlueCatalog(spark, testdata_fixture(sf_dir))
    results = catalog.register_all()
    failures = [r for r in results if isinstance(r, Exception)]
    print(f"registered {len(results) - len(failures)} tables, {len(failures)} failures")
    for f in failures:
        print("  failure:", f)

    # 3. information_schema (demo.rs:68-90: filtered + ordered)
    print("\ninformation_schema.tables:")
    information_schema_tables(catalog).orderBy("table_schema", "table_name").show(
        100, truncate=False
    )
    print("information_schema.columns for 'lineitem':")
    (
        information_schema_columns(catalog)
        .filter("table_name = 'lineitem'")
        .orderBy("ordinal_position")
        .show(100, truncate=False)
    )

    # 4. sample loop (demo.rs:92-123): SELECT * LIMIT 10 per table,
    #    failures collected, not fatal
    print("sampling every table (limit 10):")
    for key, rows in catalog.sample_all(limit=10).items():
        if isinstance(rows, GlueError):
            print(f"  {key}: FAILED: {rows}")
        else:
            print(f"  {key}: {len(rows)} rows")

    # and one real query through the same surface (EP2)
    print("\ntop 5 nations by customer count:")
    catalog.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_customers
        FROM glue__default__customer c
        JOIN glue__default__nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_customers DESC, n_name LIMIT 5
        """
    ).show(truncate=False)

    # 5. LAZY resolution (r5): a FRESH catalog serves SQL with one
    #    GetTable per referenced table — no register_all needed
    lazy = GlueCatalog(spark, testdata_fixture(sf_dir), view_prefix="lazy__")
    spark.catalog.dropTempView(lazy.view_name("default", "region"))
    n = lazy.sql("SELECT COUNT(*) AS n FROM lazy__default__region").collect()[0].n
    print(f"\nlazy resolution: {n} regions via a single GetTable")

    # 6. the WRITE trio (r5): materialize a curated table as Delta,
    #    merge a correction in, and round-trip through our own readers
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.delta import read_delta
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        merge_delta,
    )

    out = tempfile.mkdtemp(prefix="glue_spark_demo_delta_")
    nation = spark.table(catalog.view_name("default", "nation"))
    append_delta(nation.select("n_nationkey", "n_name"), out)
    fix = nation.select("n_nationkey", F.upper("n_name").alias("n_name"))
    merge_delta(spark, out, fix.limit(5), on=["n_nationkey"])
    print("post-merge Delta snapshot (first 5 rows):")
    read_delta(spark, out).orderBy("n_nationkey").show(5, truncate=False)
    shutil.rmtree(out, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
