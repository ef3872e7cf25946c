"""Round-7 regression pins.

Covers the round-6 judge/advisor findings:
* Hudi MoR: a key inserted via a log-only group and upserted again
  BEFORE compaction must route back to ITS group (the r6 advisor's
  high-severity silent-duplication scenario).
* Hudi MoR: the upsert's write phase is ONE distributed job no matter
  how many file groups are touched (was one sequential job per group).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.errors import SparkError


# ---------------------------------------------------------------- Hudi MoR


def _snap(spark, table):
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
    )

    return {
        (r["k"], r["v"])
        for r in read_hudi_mor(spark, table, key_col="k")
        .select("k", "v")
        .collect()
    }


def test_mor_log_only_group_reupsert_routes_back(spark, tmp_path):
    """Insert-then-update-between-compactions: the second upsert of a
    log-only key must land in the SAME file group, so compaction
    yields exactly one row per key (pre-fix: a second log-only group
    materialized a stale duplicate)."""
    import os

    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        compact_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "logonly")
    append_hudi(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        table,
        n_groups=1,
    )
    # key 10 is unmatched → lands in a log-only group fg-<t>-new
    upsert_hudi_log(
        spark,
        spark.createDataFrame([(10, "x")], "k int, v string"),
        table,
        key="k",
    )
    # upsert 10 again pre-compaction (plus a base-group update)
    upsert_hudi_log(
        spark,
        spark.createDataFrame([(10, "y"), (1, "a2")], "k int, v string"),
        table,
        key="k",
    )
    want = {(1, "a2"), (2, "b"), (10, "y")}
    assert _snap(spark, table) == want
    # only ONE log-only group may exist: both key-10 logs share a fileId
    logs = [f for f in os.listdir(table) if ".log." in f]
    new_groups = {
        f.lstrip(".").split("-new_")[0]
        for f in logs
        if "-new_" in f
    }
    assert len(new_groups) == 1, logs
    compact_hudi(spark, table, key="k")
    assert _snap(spark, table) == want  # no stale duplicate for key 10
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
    )

    ro = {
        (r["k"], r["v"])
        for r in read_hudi_mor(
            spark, table, key_col="k", read_optimized=True
        )
        .select("k", "v")
        .collect()
    }
    assert ro == want


def test_mor_upsert_write_phase_is_one_job(spark, tmp_path):
    """_write_log_files_grouped writes N group logs in ONE Spark job
    (exact partitioner, one container per partition) — pinned via the
    status tracker so a regression to per-group jobs fails loudly."""
    import os

    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        _write_log_files_grouped,
    )

    groups = [f"g{i}" for i in range(5)]
    routed = spark.createDataFrame(
        [(i, f"v{i}", groups[i % 5]) for i in range(25)],
        "k int, v string, _fg string",
    )
    table = str(tmp_path / "onejob")
    os.makedirs(table, exist_ok=True)
    sc = spark.sparkContext
    sc.setJobGroup("r7-grouped-write", "pin")
    try:
        stats = _write_log_files_grouped(routed, table, groups, "20240101000099")
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("r7-grouped-write")
    assert len(jobs) <= 2, f"write phase ran {len(jobs)} jobs for 5 groups"
    assert {s["fileId"] for s in stats} == set(groups)
    # every log landed and holds exactly its group's rows
    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        read_avro_fallback,
        schema_from_avro_file,
    )

    for s in stats:
        path = os.path.join(table, s["path"])
        rows = read_avro_fallback(
            spark, path, schema_from_avro_file(path)
        ).collect()
        assert len(rows) == 5
        assert all(groups[r["k"] % 5] == s["fileId"] for r in rows)


# ---------------------------------------------------------- Delta DV merge


def test_dv_merge_never_decodes_dvs_driver_side(spark, tmp_path, monkeypatch):
    """A merge over a table with pre-existing DVs must decode them
    EXECUTOR-side only (the r6 judge's scale finding: a driver-side
    decode is ∝ the table's total accumulated deletes).  read_dv is
    wrapped to raise IN THE DRIVER PROCESS while passing through on
    executors; the chained merge and the read-back must both
    succeed."""
    import os

    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources import dv as dv_mod
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        read_delta,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        merge_delta_dv,
    )

    table = str(tmp_path / "dvpin")
    df = spark.createDataFrame(
        [(i, f"v{i}", 10 * i) for i in range(20)], "k int, s string, n int"
    )
    append_delta(df, table)
    # merge 1 creates the first DVs (table has none yet)
    src1 = spark.createDataFrame(
        [(2, "u2", 777), (5, "u5", 888)], "k int, s string, n int"
    )
    merge_delta_dv(spark, table, src1, on=["k"])

    driver_pid = os.getpid()
    real_read_dv = dv_mod.read_dv

    def guarded_read_dv(table_path, descriptor):
        if os.getpid() == driver_pid:
            raise AssertionError(
                "read_dv called in the DRIVER process during a DV merge"
            )
        return real_read_dv(table_path, descriptor)

    monkeypatch.setattr(dv_mod, "read_dv", guarded_read_dv)
    # merge 2 must union the EXISTING DVs without driver-side decode
    src2 = spark.createDataFrame(
        [(2, "w2", 999), (7, "w7", 111)], "k int, s string, n int"
    )
    merge_delta_dv(spark, table, src2, on=["k"], matched_delete=F.lit(False))
    got = {(r["k"], r["s"], r["n"]) for r in read_delta(spark, table).collect()}
    want = {(i, f"v{i}", 10 * i) for i in range(20) if i not in (2, 5, 7)}
    want |= {(2, "w2", 999), (5, "u5", 888), (7, "w7", 111)}
    assert got == want


def test_mor_compaction_write_phase_is_one_job(spark, tmp_path):
    """compact_hudi runs ONE distributed merge+write over all
    log-bearing groups (r7; was ≥2 sequential driver-orchestrated
    jobs PER group).  AQE still materializes each union leaf's map
    stage as a small concurrent job, so the pin is the sublinear
    budget groups+4 — the old per-group loop sat at ~2×groups and
    would fail this immediately."""
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        compact_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "compactjobs")
    append_hudi(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(16)], "k int, v string"
        ),
        table,
        n_groups=4,
    )
    upsert_hudi_log(
        spark,
        spark.createDataFrame(
            [(i, f"u{i}") for i in range(16)], "k int, v string"
        ),
        table,
        key="k",
    )
    sc = spark.sparkContext
    sc.setJobGroup("r7-compact", "pin")
    try:
        compact_hudi(spark, table, key="k")
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("r7-compact")
    assert len(jobs) <= 8, f"compaction ran {len(jobs)} jobs for 4 groups"
    got = {
        (r["k"], r["v"])
        for r in read_hudi_mor(spark, table, key_col="k", read_optimized=True)
        .select("k", "v")
        .collect()
    }
    assert got == {(i, f"u{i}") for i in range(16)}


# ------------------------------------------------------------- Iceberg spec


def test_iceberg_merge_preserves_partition_layout(spark, tmp_path):
    """A REPLACE commit (merge/compact) re-lays the rewritten state
    under the table's DEFAULT partition spec (r7; previously degraded
    to unpartitioned files that could never prune again): post-merge
    manifests carry partition tuples and a filtered read still prunes
    at the manifest level."""
    import datetime

    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        IcebergSnapshot,
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_transforms import (
        apply_transform,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        compact_iceberg,
        merge_iceberg,
    )

    table = str(tmp_path / "mergepart")
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, base + datetime.timedelta(hours=6 * i), f"v{i}")
         for i in range(16)],
        "k int, ts timestamp, v string",
    )
    append_iceberg(df, table, partition_by="ts", transform="day")
    src = spark.createDataFrame(
        [(2, base + datetime.timedelta(hours=12), "UPD"),
         (99, base + datetime.timedelta(days=9), "NEW")],
        "k int, ts timestamp, v string",
    )
    merge_iceberg(spark, table, src, on=["k"])
    snap = IcebergSnapshot(table)
    assert snap.partitions, "post-merge manifests lost partition tuples"
    probe = base + datetime.timedelta(days=9)
    want_day = apply_transform("day", probe)
    cell = [
        f for f in snap.files
        if snap.partitions.get(f, {}).get("ts_day") == want_day
    ]
    out = read_iceberg(spark, table, partition_filter={"ts": probe})
    assert 0 < len(cell) < len(snap.files)
    assert len(out.inputFiles()) == len(cell)
    assert {(r["k"], r["v"]) for r in out.collect()} == {(99, "NEW")}
    # compaction keeps the layout too
    compact_iceberg(spark, table)
    snap2 = IcebergSnapshot(table)
    assert snap2.partitions
    out2 = read_iceberg(spark, table, partition_filter={"ts": probe})
    assert {(r["k"], r["v"]) for r in out2.collect()} == {(99, "NEW")}
    assert len(out2.inputFiles()) < len(snap2.files)


def test_checkpoint_preserves_dvs_and_partitions(spark, tmp_path):
    """r7 (was a refusal): a checkpoint over a DV-bearing,
    hive-partitioned table reconstructs the EXACT masked state — the
    log files before the checkpoint can be dropped and the snapshot
    (incl. partition pruning and DV masking) survives."""
    import os

    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.delta import (
        DeltaSnapshot,
        read_delta,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        checkpoint_delta,
        merge_delta_dv,
    )

    table = str(tmp_path / "ckptdv")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], 10 * i) for i in range(12)],
        "k int, g string, n int",
    )
    append_delta(df, table, partition_by="g")
    src = spark.createDataFrame(
        [(3, "b", 999), (4, "a", 888)], "k int, g string, n int"
    )
    merge_delta_dv(spark, table, src, on=["k"])
    want = {(r["k"], r["g"], r["n"]) for r in read_delta(spark, table).collect()}
    v = checkpoint_delta(spark, table)
    # drop every commit <= checkpoint version: the reader must rebuild
    # the full state (schema, partitions, DVs) from the parquet alone
    log_dir = os.path.join(table, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[:-5].isdigit() and int(f[:-5]) <= v:
            os.remove(os.path.join(log_dir, f))
    snap = DeltaSnapshot(table)
    assert snap._dvs, "checkpoint dropped the deletion vectors"
    assert snap.partition_columns == ["g"]
    got = {(r["k"], r["g"], r["n"]) for r in read_delta(spark, table).collect()}
    assert got == want
    a_only = read_delta(spark, table, partition_filter={"g": "a"})
    assert {r["k"] for r in a_only.collect()} == {0, 2, 4, 6, 8, 10}


def test_cdf_partitioned_reattaches_partition_values(spark, tmp_path):
    """CDF over a hive-partitioned table must re-attach partition
    columns from the log's partitionValues (r7 fix; the raw
    snap_schema scan silently NULLed them), including through DV
    deletes and NULL partitions."""
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        read_delta_cdf,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        merge_delta_dv,
    )

    table = str(tmp_path / "cdfpart")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)], "k int, g string, n int"
    )
    append_delta(df, table, partition_by="g")
    src = spark.createDataFrame([(2, "b", 99)], "k int, g string, n int")
    merge_delta_dv(spark, table, src, on=["k"])
    got = {
        (r["_commit_version"], r["_change_type"], r["k"], r["g"], r["n"])
        for r in read_delta_cdf(spark, table).collect()
    }
    assert got == {
        (0, "insert", 1, "a", 10),
        (0, "insert", 2, "b", 20),
        (0, "insert", 3, None, 30),
        (1, "delete", 2, "b", 20),
        (1, "insert", 2, "b", 99),
    }


def test_incremental_read_partitioned_and_dv_refusal(spark, tmp_path):
    """read_delta_incremental (r7 fixes): partition values re-attach
    from the log, and a DV-masking re-add in range REFUSES (it is a
    delete, not an insert — previously the whole re-added file
    re-emitted as new rows)."""
    import pytest

    from datafusion_catalogprovider_glue_spark.errors import DeltaError
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        read_delta_incremental,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        merge_delta_dv,
    )

    table = str(tmp_path / "incpart")
    append_delta(
        spark.createDataFrame([(1, "a", 10)], "k int, g string, n int"),
        table,
        partition_by="g",
    )
    append_delta(
        spark.createDataFrame([(2, "b", 20)], "k int, g string, n int"),
        table,
        partition_by="g",
    )
    got = {
        (r["k"], r["g"], r["n"], r["_commit_version"])
        for r in read_delta_incremental(spark, table, begin=0).collect()
    }
    assert got == {(2, "b", 20, 1)}  # partition value attached, not NULL
    merge_delta_dv(
        spark,
        table,
        spark.createDataFrame([(1, "a", 99)], "k int, g string, n int"),
        on=["k"],
    )
    with pytest.raises(DeltaError, match="re-adds"):
        read_delta_incremental(spark, table, begin=1)
    # pre-DV ranges still read fine
    assert {
        r["k"] for r in read_delta_incremental(spark, table, begin=0, end=1).collect()
    } == {2}


def test_iceberg_compaction_folds_row_level_deletes(spark, tmp_path):
    """rewrite_data_files over a table carrying position deletes (r7;
    was a refusal): the rewrite applies the deletes, the new snapshot
    carries NO delete files, and the logical state is unchanged."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        IcebergSnapshot,
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        compact_iceberg,
        merge_iceberg_pos_delete,
    )

    table = str(tmp_path / "foldpd")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k int, v string"
    )
    append_iceberg(df, table)
    src = spark.createDataFrame([(3, "U3"), (7, "U7")], "k int, v string")
    merge_iceberg_pos_delete(spark, table, src, on=["k"])
    before = {
        (r["k"], r["v"]) for r in read_iceberg(spark, table).collect()
    }
    assert (3, "U3") in before and (7, "U7") in before
    assert IcebergSnapshot(table).delete_files
    compact_iceberg(spark, table)
    snap = IcebergSnapshot(table)
    assert not snap.delete_files and not snap.eq_deletes
    after = {(r["k"], r["v"]) for r in read_iceberg(spark, table).collect()}
    assert after == before


def test_iceberg_cow_merge_over_pos_deletes(spark, tmp_path):
    """merge_iceberg over a table carrying position deletes (r7; was a
    refusal): the CoW rewrite starts from the TRUE logical table — an
    already-deleted row can never resurrect or rematch — and the
    REPLACE retires the delete files."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        IcebergSnapshot,
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        merge_iceberg,
        merge_iceberg_pos_delete,
    )

    table = str(tmp_path / "cowpd")
    append_iceberg(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "k int, v string"
        ),
        table,
    )
    # pos-delete merge DELETES key 2 (matched_delete always true)
    merge_iceberg_pos_delete(
        spark,
        table,
        spark.createDataFrame([(2, "dead")], "k int, v string"),
        on=["k"],
        matched_delete=F.lit(True),
    )
    assert IcebergSnapshot(table).delete_files
    # CoW merge: key 2 must come back as an INSERT (it is logically
    # absent), key 3 updates
    merge_iceberg(
        spark,
        table,
        spark.createDataFrame([(2, "back"), (3, "U3")], "k int, v string"),
        on=["k"],
    )
    snap = IcebergSnapshot(table)
    assert not snap.delete_files and not snap.eq_deletes
    got = {(r["k"], r["v"]) for r in read_iceberg(spark, table).collect()}
    want = {(i, f"v{i}") for i in range(8) if i not in (2, 3)}
    want |= {(2, "back"), (3, "U3")}
    assert got == want


def test_mor_partitioned_log_upsert_and_compaction(spark, tmp_path):
    """Partitioned MoR (r7; log ops previously refused partitioned
    tables): routed logs land NEXT TO their group's base file in its
    partition directory, log-only inserts group per partition value,
    and compaction materializes every group's new base inside its
    partition dir — snapshot == read-optimized afterwards."""
    import os

    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        compact_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "morpart")
    append_hudi(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "a", 30)],
            "k int, g string, n int",
        ),
        table,
        partition_by="g",
    )
    # updates (keys 1, 3 in g=a; 2 in g=b) + an insert in a NEW partition
    upsert_hudi_log(
        spark,
        spark.createDataFrame(
            [(1, "a", 11), (2, "b", 21), (9, "c", 90)],
            "k int, g string, n int",
        ),
        table,
        key="k",
    )
    # logs live inside partition dirs, never the table root
    root_logs = [f for f in os.listdir(table) if ".log." in f]
    assert not root_logs, root_logs
    assert any(
        ".log." in f for f in os.listdir(os.path.join(table, "g=a"))
    )
    assert any(
        ".log." in f for f in os.listdir(os.path.join(table, "g=c"))
    )
    want = {(1, "a", 11), (2, "b", 21), (3, "a", 30), (9, "c", 90)}
    snap = {
        (r["k"], r["g"], r["n"])
        for r in read_hudi_mor(spark, table, key_col="k")
        .select("k", "g", "n")
        .collect()
    }
    assert snap == want
    compact_hudi(spark, table, key="k")
    ro = {
        (r["k"], r["g"], r["n"])
        for r in read_hudi_mor(spark, table, key_col="k", read_optimized=True)
        .select("k", "g", "n")
        .collect()
    }
    assert ro == want
    # compacted bases landed inside their partition dirs
    assert any(
        f.endswith(".parquet") and ".log." not in f
        for f in os.listdir(os.path.join(table, "g=c"))
    )
    # a second upsert of the log-only key routes back to its group
    upsert_hudi_log(
        spark,
        spark.createDataFrame([(9, "c", 91)], "k int, g string, n int"),
        table,
        key="k",
    )
    compact_hudi(spark, table, key="k")
    snap2 = {
        (r["k"], r["g"], r["n"])
        for r in read_hudi_mor(spark, table, key_col="k")
        .select("k", "g", "n")
        .collect()
    }
    assert snap2 == (want - {(9, "c", 90)}) | {(9, "c", 91)}
