"""Per-key job profile (optimization round): run each key the way the
bench does (fixture build + noop sink) and record, from the Spark UI
REST API, how many JOBS the key launches and where the wall time goes
(sum of job durations vs driver-side gap time).

At bench scale the fixtures are small, so per-job fixed overhead and
driver-side work dominate — job COUNT is the first-order lever
(guide §1.2: fix the distributed algorithm / number of passes first).

Usage:
    python tools/profile_keys.py --keys k1,k2,... [--sf DIR] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--keys", required=True)
    ap.add_argument("--out", default="/tmp/key_profile.json")
    ap.add_argument("--runs", type=int, default=1,
                    help="extra measured runs after the profiled one")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("key-profile")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_catalogprovider_glue_spark.operators import registry
    from datafusion_catalogprovider_glue_spark.tables import load_table

    registry.load_all_operator_modules()
    load_table(spark, args.sf, "lineitem").count()  # warm the JVM

    base = f"http://localhost:4099/api/v1"
    app_id = _api(base, "/applications")[0]["id"]
    api = f"{base}/applications/{app_id}"

    out: dict[str, dict] = {}
    for key in args.keys.split(","):
        fn = registry.QUERIES[key]
        # warmup run (codegen) exactly like bench.py
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _api(api, "/jobs")}
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = [j for j in _api(api, "/jobs")
                if j["jobId"] not in jobs_before]
        durs = []
        for j in jobs:
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
                d = (datetime.strptime(j["completionTime"], fmt)
                     - datetime.strptime(j["submissionTime"], fmt)
                     ).total_seconds()
            except Exception:
                d = None
            durs.append({
                "id": j["jobId"],
                "desc": (j.get("description") or j["name"])[:90],
                "secs": round(d, 3) if d is not None else None,
                "tasks": j.get("numTasks"),
            })
        job_sum = sum(d["secs"] or 0 for d in durs)
        best = wall
        for _ in range(max(0, args.runs - 1)):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[key] = {
            "wall_s": round(wall, 3),
            "best_s": round(best, 3),
            "n_jobs": len(jobs),
            "jobs_sum_s": round(job_sum, 3),
            "driver_gap_s": round(max(0.0, wall - job_sum), 3),
            "jobs": sorted(durs, key=lambda d: -(d["secs"] or 0))[:15],
        }
        print(f"{key}: wall {wall:.2f}s best {best:.2f}s "
              f"jobs {len(jobs)} (sum {job_sum:.2f}s, "
              f"gap {out[key]['driver_gap_s']:.2f}s)", flush=True)
        spark.catalog.clearCache()
        from datafusion_catalogprovider_glue_spark.operators import (
            dedup,
            similarity,
        )

        similarity.invalidate_kmeans_cache()
        dedup.invalidate_pair_cache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
