"""Scale-up evidence: run the bench headline set at two scale factors
and report the per-query wall-time ratio.

10x more data through a plan whose shape is right costs well under
10x wall time at this size (fixed scheduling overheads amortize and
the scan/shuffle stages parallelize); a query whose ratio approaches
or exceeds the data ratio is flagged — it is the one whose plan would
be re-audited before a 1000-executor run.

Usage:
    python tools/scaling_report.py [--lo sf0.01] [--hi sf0.1] \
        [--out SCALING_r02.json]

Writes {query: {lo_s, hi_s, ratio}, summary: {...}} and prints the
flagged list.  Ratios are computed from bench.py's own best-of-2
steady-state numbers, so JIT/codegen constants are already excluded.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, keys: str = "") -> dict:
    # row counts make output-bound growth distinguishable from compute
    # growth in the ratio (counted untimed, outside the measured runs)
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_COUNT_ROWS="1",
    )
    if keys:
        env["SPARK_GRAFT_BENCH_KEYS"] = keys
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith('{"metric"')][-1]
    parsed = json.loads(line)
    # the PRINTED line truncates its per-query dict to fit the
    # driver's 2000-char tail (key sets >~55 drop their fastest
    # entries) — the complete record always lands in bench_full.json;
    # prefer it whenever it matches this run
    full_path = os.path.join(REPO, "bench_full.json")
    try:
        with open(full_path) as fh:
            full = json.load(fh)
        if full.get("sf") == parsed.get("sf") and set(
            parsed.get("queries") or {}
        ) <= set(full.get("queries") or {}):
            return full
    except Exception:
        pass
    return parsed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default="/root/testdata/sf0.01")
    ap.add_argument("--hi", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r02.json"))
    ap.add_argument(
        "--data-ratio", type=float, default=10.0,
        help="hi/lo data-volume ratio; queries scaling worse are flagged",
    )
    ap.add_argument(
        "--keys", default="",
        help="comma-separated bench-key subset (default: full headline)",
    )
    args = ap.parse_args()

    lo = run_bench(args.lo, args.keys)
    hi = run_bench(args.hi, args.keys)
    rows = {}
    flagged = []
    for k, lo_s in lo["queries"].items():
        hi_s = hi["queries"].get(k)
        if hi_s is None:
            continue
        ratio = round(hi_s / lo_s, 2) if lo_s > 0 else None
        rows[k] = {"lo_s": lo_s, "hi_s": hi_s, "ratio": ratio}
        lo_rows = (lo.get("rows") or {}).get(k)
        hi_rows = (hi.get("rows") or {}).get(k)
        if lo_rows is not None and hi_rows is not None:
            rows[k]["lo_rows"] = lo_rows
            rows[k]["hi_rows"] = hi_rows
            rows[k]["rows_ratio"] = (
                round(hi_rows / lo_rows, 2) if lo_rows > 0 else None
            )
        if ratio is not None and ratio > args.data_ratio:
            flagged.append(k)
    ratios = sorted(
        r["ratio"] for r in rows.values() if r["ratio"] is not None
    )
    report = {
        "lo": {"sf": lo["sf"], "total_s": lo["value"], "loadavg": lo["loadavg"]},
        "hi": {"sf": hi["sf"], "total_s": hi["value"], "loadavg": hi["loadavg"]},
        "data_ratio": args.data_ratio,
        "queries": rows,
        "flagged_superlinear": flagged,
        "summary": {
            "n_queries": len(rows),
            "median_ratio": ratios[len(ratios) // 2] if ratios else None,
            "total_ratio": round(hi["value"] / lo["value"], 2),
        },
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps(report["summary"]))
    print("flagged:", flagged or "none")
    return 0


if __name__ == "__main__":
    sys.exit(main())
