"""Minimal Apache Hudi copy-on-write WRITER: parquet base files +
timeline commits — the third leg of the write-path trio
(sources/delta_writer.py, sources/iceberg_writer.py), closing the
round trip for every table format the engine reads.

Scope: CoW tables, unpartitioned, two operations —

* ``append_hudi``  — INSERT: new file group(s) under a new instant.
* ``upsert_hudi``  — UPSERT by record key: rewrites the file groups
  holding matched keys (whole-file rewrite, the CoW contract) and
  routes unmatched keys to a new file group, all under ONE instant.

Format notes (Hudi spec, https://hudi.apache.org/tech-specs/):
* the timeline is ``.hoodie/<instant>.commit`` JSON whose
  ``partitionToWriteStats`` lists (fileId, path) per written base
  file; an ``<instant>.commit.inflight`` marker precedes the commit
  (readers ignore it), and publishing the ``.commit`` file IS the
  atomic commit point (put-if-absent here, like the Delta writer).
* instants are monotonically increasing timestamps; this writer uses
  a deterministic 14-digit sequence (20240101000000 + k) rather than
  wall clock, per the repo's determinism convention.
* every base file carries the spec's per-row ``_hoodie_commit_time``
  meta column, which is what makes ROW-LEVEL incremental queries
  possible (rows carried unchanged through a rewrite keep their
  original commit time — sources/hudi.py filters on exactly this).

Scale shape: data writes are ordinary distributed parquet sinks; only
file listings and KB-sized timeline JSON touch the driver.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.errors import SparkError

_BASE_INSTANT = 20240101000000


def _timeline_dir(location: str) -> str:
    d = os.path.join(location, ".hoodie")
    os.makedirs(d, exist_ok=True)
    return d


def _next_instant(location: str) -> str:
    tl = _timeline_dir(location)
    done = [
        int(f[:-7])
        for f in os.listdir(tl)
        if f.endswith(".commit") and f[:-7].isdigit()
    ]
    return str(max(done) + 1 if done else _BASE_INSTANT)


def _publish(location: str, instant: str, stats: list[dict]) -> None:
    tl = _timeline_dir(location)
    open(os.path.join(tl, f"{instant}.commit.inflight"), "w").close()
    props = os.path.join(tl, "hoodie.properties")
    if not os.path.exists(props):
        with open(props, "w") as fh:
            fh.write("hoodie.table.name=%s\n" % os.path.basename(location))
            fh.write("hoodie.table.type=COPY_ON_WRITE\n")
    path = os.path.join(tl, f"{instant}.commit")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"partitionToWriteStats": {"": stats}}, fh, sort_keys=True)
    try:
        os.link(tmp, path)  # put-if-absent: one writer wins the instant
    except FileExistsError:
        raise SparkError(f"instant {instant} already committed") from None
    finally:
        os.unlink(tmp)


def _write_file_group(
    df: DataFrame, location: str, instant: str, file_id: str
) -> dict:
    """One file group = one base file per instant (CoW).  The write is
    the ordinary parquet sink; the part file is renamed to the spec's
    ``<fileId>_<writeToken>_<instant>.parquet`` layout."""
    staging = os.path.join(location, f"_staging_{file_id}_{instant}")
    (
        df.withColumn("_hoodie_commit_time", F.lit(instant))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(staging)
    )
    part = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(staging)
        for f in fs
        if f.endswith(".parquet")
    )
    name = f"{file_id}_0-0-0_{instant}.parquet"
    os.replace(part, os.path.join(location, name))
    shutil.rmtree(staging)
    return {"fileId": file_id, "path": name}


def append_hudi(
    df: DataFrame, location: str, n_groups: int = 2
) -> str:
    """INSERT ``df`` as ``n_groups`` new file groups under a new
    instant.  Returns the committed instant."""
    instant = _next_instant(location)
    splits = df.withColumn(
        "_g", F.pmod(F.xxhash64(*df.columns[:1]), F.lit(n_groups))
    )
    stats = []
    for g in range(n_groups):
        part = splits.filter(F.col("_g") == g).drop("_g")
        stats.append(
            _write_file_group(part, location, instant, f"fg-{instant}-{g}")
        )
    _publish(location, instant, stats)
    return instant


def upsert_hudi(
    spark: SparkSession, df: DataFrame, location: str, key: str
) -> str:
    """UPSERT by ``key``: matched keys update in place (their file
    groups rewrite wholesale — the CoW contract), unmatched keys insert
    into one new file group, all under ONE instant.  Only the touched
    file groups rewrite; untouched groups keep their base files and
    their rows keep their original ``_hoodie_commit_time`` (the
    row-level incremental contract)."""
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        _commit_files,
        hudi_completed_instants,
    )

    instants = hudi_completed_instants(location)
    latest: dict[str, str] = {}
    for t in instants:
        latest.update(_commit_files(location, t))
    instant = _next_instant(location)
    src = df.persist()
    if src.groupBy(key).count().filter(F.col("count") > 1).limit(1).count():
        raise SparkError("upsert source has duplicate record keys")
    # Hudi invariant: a record key lives in exactly ONE file group.
    # Two appends of the same key violate it (append never tags keys);
    # an upsert of such a key would rewrite it into EVERY holding
    # group, duplicating the row — refuse loudly instead.  The check
    # scans only the key column (parquet column pruning) of files the
    # rewrite loop reads anyway.
    key_frames = [
        spark.read.parquet(os.path.join(location, rel)).select(
            F.col(key), F.lit(file_id).alias("_fg")
        )
        for file_id, rel in sorted(latest.items())
    ]
    if key_frames:
        all_keys = key_frames[0]
        for kf in key_frames[1:]:
            all_keys = all_keys.unionByName(kf)
        multi = (
            all_keys.join(src.select(key), key, "left_semi")
            .groupBy(key)
            .agg(F.countDistinct("_fg").alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .count()
        )
        if multi:
            raise SparkError(
                "upsert matches a record key present in more than one "
                "file group — the table violates Hudi's one-key-one-"
                "file-group invariant (duplicate inserts?); compact or "
                "dedupe before upserting"
            )
    stats = []
    remaining = src
    for file_id, rel in sorted(latest.items()):
        base = spark.read.parquet(os.path.join(location, rel))
        hit = base.join(
            src.select(F.col(key).alias("__k")),
            base[key] == F.col("__k"),
            "left_semi",
        )
        if hit.limit(1).count() == 0:
            continue  # untouched file group: no rewrite, no commit entry
        updates = src.join(base.select(key), key, "left_semi")
        # carried-over rows keep their ORIGINAL commit time; updated
        # rows get the new instant (row-level incremental semantics)
        carried = base.join(src.select(key), key, "left_anti")
        rewritten = carried.unionByName(
            updates.withColumn("_hoodie_commit_time", F.lit(instant))
        )
        staging = os.path.join(location, f"_staging_{file_id}_{instant}")
        rewritten.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        name = f"{file_id}_0-0-0_{instant}.parquet"
        os.replace(part, os.path.join(location, name))
        shutil.rmtree(staging)
        stats.append({"fileId": file_id, "path": name})
        remaining = remaining.join(updates.select(key), key, "left_anti")
    inserts = remaining
    if inserts.limit(1).count():
        stats.append(
            _write_file_group(
                inserts, location, instant, f"fg-{instant}-new"
            )
        )
    if not stats:
        raise SparkError("upsert source is empty — nothing to commit")
    _publish(location, instant, stats)
    src.unpersist(blocking=False)
    return instant
