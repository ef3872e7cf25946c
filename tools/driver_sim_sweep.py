"""Full driver-sim sweep: every registered key through the corrected
correctness-gate replica (tests/oracle_harness), writing a per-key
artifact the judge can diff against the driver's sampled
CORRECTNESS_r{N}.json.

Usage:
    python tools/driver_sim_sweep.py [--sf /root/testdata/sf0.01] \
        [--out SWEEP.json] [--keys k1,k2,...]

Runs in ONE fresh Spark process with a deliberately hostile session
conf (non-UTC timezone) the way the round driver does — operators
must normalize via apply_engine_conf.  Statuses mirror the driver's:
PASS (oracle hash green), rows-only (no oracle by design, canon-safe),
FAIL (mismatch), ERR (harness crash — the round-1 array class).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "SWEEP_LOCAL.json"))
    ap.add_argument("--keys", default=None, help="comma-separated subset")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim-sweep")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from tests.oracle_harness import check_rows_only, compare, duckdb_conn

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    keys = sorted(qs) if not args.keys else args.keys.split(",")
    con = duckdb_conn(args.sf)

    results: dict[str, dict] = {}
    n_pass = n_rows = n_fail = n_err = 0
    t_all = time.time()
    for i, k in enumerate(keys):
        t0 = time.time()
        rec: dict = {"status": None, "secs": None, "err": None}
        try:
            df = qs[k](spark, args.sf)
            t_build = time.time() - t0
            if k in osql:
                timings: dict = {}
                compare(df, con, osql[k], timings=timings)
                # spark_secs includes plan/fixture build (some keys do
                # real Spark work eagerly: localCheckpoint, fixtures)
                rec["spark_secs"] = round(t_build + timings["spark_secs"], 2)
                rec["oracle_secs"] = round(timings["oracle_secs"], 2)
                rec["status"] = "PASS"
                n_pass += 1
            else:
                rec["status"] = "rows-only"
                rec["spark_rows"] = check_rows_only(df)
                n_rows += 1
        except AssertionError as ex:
            rec["status"] = "FAIL"
            rec["err"] = str(ex)[:500]
            n_fail += 1
        except Exception as ex:
            rec["status"] = "ERR"
            rec["err"] = f"{type(ex).__name__}: {str(ex)[:400]}"
            n_err += 1
            traceback.print_exc(limit=3)
        rec["secs"] = round(time.time() - t0, 2)
        results[k] = rec
        print(f"[{i + 1}/{len(keys)}] {k}: {rec['status']} ({rec['secs']}s)", flush=True)

    summary = {
        "sf": args.sf,
        "n_keys": len(keys),
        "pass": n_pass,
        "rows_only": n_rows,
        "fail": n_fail,
        "err": n_err,
        "total_secs": round(time.time() - t_all, 1),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    return 0 if (n_fail + n_err) == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
