"""Hudi copy-on-write snapshot reader — the third open-table-format
source.

The reference reads exactly one table format beyond plain files: Delta,
via the deltalake crate's own ``_delta_log`` replay (glue.rs:214-240).
sources/delta.py and sources/iceberg.py extend that self-reading
approach to Delta and Iceberg; this module completes the trio with
Apache Hudi (spec: https://hudi.apache.org/tech-specs/), again without
requiring the hudi-spark runtime JAR:

    .hoodie/<instant>.commit          completed-instant timeline
      →  commit metadata JSON          (partitionToWriteStats: fileId,
                                        path per written base file)
      →  latest file slice per file group ≤ the target instant
      →  parquet scan over exactly those base files

Copy-on-write semantics: every commit that touches a file group
rewrites its whole base file under a NEW instant timestamp, so a
snapshot at instant T is simply "for each file group, the base file
with the largest commit ts ≤ T".  ``as_of`` pins T to an earlier
completed instant (Hudi's point-in-time query).  Scope mirrors the
Delta/Iceberg readers' scoping: CoW only (no MOR log-file merging),
unpartitioned tables, file sets taken from the commit metadata the
way Hudi's own file-system view builds file slices.

Scale shape is identical to the other two: the timeline is a
driver-side read of KB-sized JSON (Hudi keeps it small via archival),
and the selected base files fan out to executors as an ordinary
multi-file parquet scan — filter pushdown and column pruning apply
untouched.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from datafusion_catalogprovider_glue_spark.errors import SparkError


def hudi_completed_instants(location: str) -> list[str]:
    """Sorted completed commit instants (the ``<ts>.commit`` files in
    ``.hoodie/``; requested/inflight markers are not completed)."""
    tl = os.path.join(location, ".hoodie")
    if not os.path.isdir(tl):
        raise SparkError(f"no .hoodie timeline under {location}")
    return sorted(
        f[: -len(".commit")]
        for f in os.listdir(tl)
        if f.endswith(".commit")
    )


def _commit_files(location: str, instant: str) -> dict[str, str]:
    """fileId → relative base-file path written by one commit."""
    with open(os.path.join(location, ".hoodie", f"{instant}.commit")) as fh:
        meta = json.load(fh)
    out: dict[str, str] = {}
    for stats in meta.get("partitionToWriteStats", {}).values():
        for st in stats:
            out[st["fileId"]] = st["path"]
    return out


def read_hudi(
    spark: SparkSession, location: str, as_of: Optional[str] = None
) -> DataFrame:
    """Snapshot (or point-in-time, via ``as_of``) read of a CoW table.

    Replays the completed timeline in instant order, keeping the last
    base file written per file group — the file-slice resolution rule
    of the spec — then scans the surviving parquet files.
    """
    instants = hudi_completed_instants(location)
    if as_of is not None:
        instants = [t for t in instants if t <= as_of]
        if not instants:
            raise SparkError(
                f"no completed instant <= {as_of} at {location}"
            )
    latest: dict[str, str] = {}
    for t in instants:  # ascending: later commits overwrite the slice
        latest.update(_commit_files(location, t))
    paths = [os.path.join(location, rel) for rel in sorted(latest.values())]
    if not paths:
        raise SparkError(f"hudi table at {location} has no base files")
    return spark.read.parquet(*paths)
