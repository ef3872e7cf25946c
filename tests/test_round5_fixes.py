"""Pins for the round-5 advice fixes: Iceberg incremental commit
ordering (random snapshot IDs), Hudi row-level incremental semantics,
and RegexSerDe full-line matching."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from tests.conftest import SF_CORRECTNESS


def test_iceberg_incremental_commit_order_not_id_order(spark):
    """The gate fixture's snapshot IDs are deliberately NON-monotonic
    (6781534021, 331, 944273): commit order disagrees with ID-sorted
    order, so a reader that sorts IDs either mis-tags rows or refuses
    a valid append chain.  appendsBetween(first, mid] must return
    exactly chunk 1 tagged with the MIDDLE commit's random ID."""
    from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
    from datafusion_catalogprovider_glue_spark.fixtures.iceberg_incremental import (
        SNAP_IDS,
        build_iceberg_append_chain,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        read_iceberg_incremental,
    )

    table = build_iceberg_append_chain(spark, SF_CORRECTNESS)
    df = read_iceberg_incremental(
        spark, table, from_snapshot=SNAP_IDS[0], to_snapshot=SNAP_IDS[1]
    )
    rows = df.collect()
    assert rows, "middle append must surface"
    assert {r["_snapshot_id"] for r in rows} == {SNAP_IDS[1]}
    assert all(r["s_suppkey"] % 3 == 1 for r in rows)

    # a range running AGAINST commit order is refused, even though the
    # ID values happen to be ascending (944273 -> 6781534021)
    with pytest.raises(NotImplementedYet, match="committed before"):
        read_iceberg_incremental(
            spark, table, from_snapshot=SNAP_IDS[2], to_snapshot=SNAP_IDS[0]
        )


def test_iceberg_incremental_snapshot_log_fallback(spark, tmp_path):
    """Metadata without per-snapshot sequence-numbers falls back to the
    snapshot-log (timestamp-ordered history), never to ID sorting."""
    from datafusion_catalogprovider_glue_spark.fixtures.iceberg_incremental import (
        SNAP_IDS,
        build_iceberg_append_chain,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        read_iceberg_incremental,
    )

    src = build_iceberg_append_chain(spark, SF_CORRECTNESS)
    table = str(tmp_path / "no_seq")
    shutil.copytree(src, table)
    meta_path = os.path.join(table, "metadata", "v1.metadata.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    for s in meta["snapshots"]:
        del s["sequence-number"]
    meta["location"] = table
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)

    df = read_iceberg_incremental(
        spark, table, from_snapshot=SNAP_IDS[0], to_snapshot=SNAP_IDS[2]
    )
    got = {(r["s_suppkey"] % 3, r["_snapshot_id"]) for r in df.collect()}
    assert got == {(1, SNAP_IDS[1]), (2, SNAP_IDS[2])}


def test_hudi_incremental_row_level_when_meta_column_present(spark, tmp_path):
    """When data files carry the spec's per-row _hoodie_commit_time,
    the incremental pull filters on IT: a row carried unchanged through
    a CoW rewrite keeps its original commit time and must NOT be
    re-reported as a change (ADVICE r4, hudi.py:256)."""
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_incremental,
    )

    t1, t2 = "20240101000000", "20240102000000"
    loc = str(tmp_path / "hudi_rowlevel")
    tl = os.path.join(loc, ".hoodie")
    os.makedirs(tl)

    def _stage(name, rows):
        df = spark.createDataFrame(
            rows, "id long, val string, _hoodie_commit_time string"
        )
        staging = os.path.join(loc, "_stage")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        shutil.move(part, os.path.join(loc, name))
        shutil.rmtree(staging)

    _stage("g0_t1.parquet", [(1, "a", t1), (2, "b", t1)])
    # t2 rewrites g0: row 1 carried unchanged (keeps t1), row 2 updated,
    # row 3 inserted
    _stage("g0_t2.parquet", [(1, "a", t1), (2, "B", t2), (3, "c", t2)])
    for inst, files in ((t1, {"g0": "g0_t1.parquet"}),
                        (t2, {"g0": "g0_t2.parquet"})):
        with open(os.path.join(tl, f"{inst}.commit"), "w") as fh:
            json.dump(
                {
                    "partitionToWriteStats": {
                        "": [
                            {"fileId": fid, "path": p}
                            for fid, p in files.items()
                        ]
                    }
                },
                fh,
            )

    got = {
        (r["id"], r["val"], r["_hoodie_commit_time"])
        for r in read_hudi_incremental(spark, loc, begin=t1).collect()
    }
    assert got == {(2, "B", t2), (3, "c", t2)}  # row 1 NOT re-reported


def test_hudi_incremental_file_slice_fallback_documented(spark):
    """Without the meta column (the gate fixture's stripped parquet),
    the reader degrades to file-slice granularity — every row of an
    in-range slice tagged with the slice's instant."""
    from datafusion_catalogprovider_glue_spark.fixtures.hudi_tables import (
        build_hudi_cow,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        hudi_completed_instants,
        read_hudi_incremental,
    )

    loc = build_hudi_cow(spark, SF_CORRECTNESS)
    t1, t2 = hudi_completed_instants(loc)[:2]
    df = read_hudi_incremental(spark, loc, begin=t1, end=t2)
    assert {r["_hoodie_commit_time"] for r in df.collect()} == {t2}


def test_regex_serde_full_line_match(spark, tmp_path):
    """Hive RegexSerDe uses Pattern.matches (FULL line): an unanchored
    input.regex must not substring-parse a longer line — Hive renders
    it all-NULL (ADVICE r4, catalog.py:421)."""
    from datafusion_catalogprovider_glue_spark.catalog.catalog import (
        GlueCatalog,
    )
    from datafusion_catalogprovider_glue_spark.catalog.fake_glue import (
        FakeGlueClient,
    )
    from datafusion_catalogprovider_glue_spark.sources.formats import (
        REGEX_SERDE,
        TEXT_IN,
        TEXT_OUT,
    )

    loc = str(tmp_path / "log")
    os.makedirs(loc)
    with open(os.path.join(loc, "part-0.txt"), "w") as fh:
        fh.write("42|ok\n")          # exact full-line match
        fh.write("42|ok|TRAILING\n")  # substring-matches, Hive NULLs it

    sd = {
        "Location": loc,
        "InputFormat": TEXT_IN,
        "OutputFormat": TEXT_OUT,
        "SerdeInfo": {
            "SerializationLibrary": REGEX_SERDE,
            # deliberately UNanchored
            "Parameters": {"input.regex": r"(\d+)\|(\w+)"},
        },
        "Columns": [
            {"Name": "k", "Type": "bigint"},
            {"Name": "v", "Type": "string"},
        ],
    }
    table = {
        "DatabaseName": "logdb", "Name": "lines",
        "Parameters": {}, "StorageDescriptor": sd,
    }
    catalog = GlueCatalog(spark, FakeGlueClient({"logdb": {"lines": table}}))
    entry = catalog.register_table("logdb", "lines")
    rows = sorted(
        spark.table(entry.view).collect(),
        key=lambda r: (r["k"] is None, r["k"]),
    )
    assert (rows[0]["k"], rows[0]["v"]) == (42, "ok")
    assert rows[1]["k"] is None and rows[1]["v"] is None


def test_iceberg_writer_time_travel_and_incremental(spark, tmp_path):
    """The written append chain supports time travel (first snapshot =
    first half only) and the incremental appendsBetween scan (second
    snapshot's rows tagged with ITS random ID), and refuses appends
    with a different schema."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        read_iceberg,
        read_iceberg_incremental,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.tables import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    table = str(tmp_path / "iceberg_tt")
    s1 = append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), table)
    s2 = append_iceberg(docs.filter(F.col("doc_id") % 2 == 1), table)

    n_even = docs.filter(F.col("doc_id") % 2 == 0).count()
    n_all = docs.count()
    assert read_iceberg(spark, table, snapshot_id=s1).count() == n_even
    assert read_iceberg(spark, table).count() == n_all

    inc = read_iceberg_incremental(spark, table, s1, s2)
    rows = inc.collect()
    assert len(rows) == n_all - n_even
    assert {r["_snapshot_id"] for r in rows} == {s2}
    assert all(r["doc_id"] % 2 == 1 for r in rows)

    with pytest.raises(NotImplementedYet, match="schema must match"):
        append_iceberg(docs.select("doc_id", "lang"), table)


def test_iceberg_writer_deterministic_metadata(spark, tmp_path):
    """Two writes of the same input produce byte-identical metadata
    (manifests, manifest lists, metadata.json) — the repo's determinism
    convention, required for reproducible pipelines."""
    import os

    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.tables import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents").select(
        "doc_id", "lang"
    )
    metas = []
    for name in ("a", "b"):
        # same logical table path suffix so path-derived ids match
        base = str(tmp_path / name / "t")
        append_iceberg(docs, base, n_files=1)
        meta_dir = os.path.join(base, "metadata")
        blobs = {}
        for f in sorted(os.listdir(meta_dir)):
            with open(os.path.join(meta_dir, f), "rb") as fh:
                blobs[f] = fh.read()
        metas.append(blobs)
    assert sorted(metas[0]) == sorted(metas[1])
    # avro manifests byte-identical; metadata.json differs only in the
    # path-derived uuid/location fields
    for f in metas[0]:
        if f.endswith(".avro"):
            assert metas[0][f] == metas[1][f], f


def test_delta_merge_conflict_and_dup_refusals(spark, tmp_path):
    """merge_delta's optimistic-concurrency contract: a merge validated
    against a stale version refuses (ConcurrentWriteError), a racing
    commit of the same version loses the put-if-absent publish, and a
    duplicate-key source is refused per the MERGE ambiguity rule."""
    import os

    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        ConcurrentWriteError,
        _commit,
        _log_dir,
        append_delta,
        merge_delta,
    )

    table = str(tmp_path / "merge_tbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, val string"
    )
    v0 = append_delta(df, table)
    assert v0 == 0

    src = spark.createDataFrame([(2, "B"), (3, "c")], "id long, val string")
    # stale read version -> refusal BEFORE any write
    append_delta(spark.createDataFrame([(9, "z")], "id long, val string"), table)
    with pytest.raises(ConcurrentWriteError, match="re-read and retry"):
        merge_delta(spark, table, src, on=["id"], expected_version=v0)

    # racing writer at the COMMIT point: the version file is published
    # put-if-absent, so the second writer of the same version loses
    # loudly instead of overwriting the winner's log
    _commit(_log_dir(table), 2, [{"commitInfo": {"winner": True}}])
    with pytest.raises(ConcurrentWriteError, match="already committed"):
        _commit(_log_dir(table), 2, [{"commitInfo": {"loser": True}}])
    with open(os.path.join(_log_dir(table), f"{2:020d}.json")) as fh:
        assert "winner" in fh.read()  # the first commit survived intact

    # duplicate source keys -> ambiguity refusal
    os.remove(os.path.join(_log_dir(table), f"{2:020d}.json"))
    dup = spark.createDataFrame(
        [(2, "B"), (2, "BB")], "id long, val string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_delta(spark, table, dup, on=["id"])

    # and a clean merge applies all three clauses
    v = merge_delta(
        spark, table, src, on=["id"],
        matched_delete=F.col("t.val") == "b",
    )
    from datafusion_catalogprovider_glue_spark.sources.delta import read_delta

    got = {(r["id"], r["val"]) for r in read_delta(spark, table).collect()}
    assert got == {(1, "a"), (3, "c"), (9, "z")}  # 2 deleted (val='b')
    assert v == 2


def test_hudi_writer_incremental_and_group_preservation(spark, tmp_path):
    """The Hudi writer's upsert rewrites ONLY touched file groups;
    carried-over rows keep their original per-row commit time, so a
    row-level incremental pull over the written table returns exactly
    the upserted rows — and untouched groups' base files survive
    byte-identical."""
    import os

    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi,
        read_hudi_incremental,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi,
    )

    loc = str(tmp_path / "hudi_w")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, val string"
    )
    t1 = append_hudi(df, loc, n_groups=4)
    files_before = {
        f: os.path.getsize(os.path.join(loc, f))
        for f in os.listdir(loc)
        if f.endswith(".parquet")
    }
    assert len(files_before) == 4

    # upsert: update ids 0..2 (hits some groups), insert ids 100..101
    src = spark.createDataFrame(
        [(0, "V0"), (1, "V1"), (2, "V2"), (100, "n100"), (101, "n101")],
        "id long, val string",
    )
    t2 = upsert_hudi(spark, src, loc, key="id")
    snap = {
        (r["id"], r["val"]) for r in read_hudi(spark, loc).select("id", "val").collect()
    }
    want = {(i, f"v{i}") for i in range(3, 20)} | {
        (0, "V0"), (1, "V1"), (2, "V2"), (100, "n100"), (101, "n101")
    }
    assert snap == want

    # untouched file groups' base files survive byte-identical
    touched_groups = set()
    for f in os.listdir(loc):
        if f.endswith(".parquet") and f"_{t2}.parquet" in f:
            touched_groups.add(f.split("_")[0] + "_" + f.split("_")[1])
    survivors = {
        f: sz
        for f, sz in files_before.items()
        if os.path.exists(os.path.join(loc, f))
    }
    assert survivors  # at least one group untouched by ids {0,1,2}
    for f, sz in survivors.items():
        assert os.path.getsize(os.path.join(loc, f)) == sz

    # row-level incremental: (t1, t2] returns EXACTLY the upserted rows
    inc = {
        (r["id"], r["val"], r["_hoodie_commit_time"])
        for r in read_hudi_incremental(spark, loc, begin=t1).collect()
    }
    assert inc == {
        (0, "V0", t2), (1, "V1", t2), (2, "V2", t2),
        (100, "n100", t2), (101, "n101", t2),
    }

    # duplicate record keys refuse
    dup = spark.createDataFrame([(5, "a"), (5, "b")], "id long, val string")
    with pytest.raises(SparkError, match="duplicate record keys"):
        upsert_hudi(spark, dup, loc, key="id")


def test_delta_checkpoint_write_roundtrip(spark, tmp_path):
    """checkpoint_delta writes the spec's parquet checkpoint +
    _last_checkpoint pointer; the engine's own reader serves the
    snapshot FROM the checkpoint (pre-checkpoint JSON commits deleted
    to prove it), later commits still replay on top, and DV-bearing
    tables refuse."""
    import os

    from datafusion_catalogprovider_glue_spark.sources.delta import read_delta
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        checkpoint_delta,
        _log_dir,
    )

    table = str(tmp_path / "ckpt_tbl")
    for lo in (0, 10, 20):
        append_delta(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(lo, lo + 10)],
                "id long, val string",
            ),
            table,
        )
    v = checkpoint_delta(spark, table)
    assert v == 2
    log = _log_dir(table)
    assert os.path.exists(os.path.join(log, f"{v:020d}.checkpoint.parquet"))

    # a post-checkpoint commit replays on top of the checkpoint base
    append_delta(
        spark.createDataFrame([(100, "x")], "id long, val string"), table
    )
    # delete the pre-checkpoint JSON commits: latest-snapshot reads must
    # survive on checkpoint + commit 3 alone (the spec's log cleanup)
    for n in range(3):
        os.remove(os.path.join(log, f"{n:020d}.json"))
    got = {(r["id"], r["val"]) for r in read_delta(spark, table).collect()}
    assert got == {(i, f"v{i}") for i in range(30)} | {(100, "x")}


def test_iceberg_merge_time_travel_and_refusals(spark, tmp_path):
    """merge_iceberg commits a REPLACE snapshot: the post-merge state
    is current, the pre-merge snapshot stays time-travelable across
    the rewrite, duplicate-key sources refuse, and the incremental
    appendsBetween scan refuses ranges spanning the rewrite (the
    append-only contract)."""
    from pyspark.sql import functions as F

    from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        read_iceberg,
        read_iceberg_incremental,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        merge_iceberg,
    )

    table = str(tmp_path / "ice_merge")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    s1 = append_iceberg(df, table)
    src = spark.createDataFrame([(2, "B"), (9, "z")], "id long, val string")
    s2 = merge_iceberg(
        spark, table, src, on=["id"], matched_delete=F.col("t.val") == "b"
    )
    got = {(r["id"], r["val"]) for r in read_iceberg(spark, table).collect()}
    # id=2 is MATCHED and its pre-image val='b' -> deleted (the delete
    # clause never touches unmatched rows like id=3); id=9 inserted
    assert got == {(1, "a"), (3, "c"), (9, "z")}
    # time travel to the pre-merge snapshot survives the rewrite
    old = {
        (r["id"], r["val"])
        for r in read_iceberg(spark, table, snapshot_id=s1).collect()
    }
    assert old == {(1, "a"), (2, "b"), (3, "c")}
    # incremental across a REPLACE refuses
    with pytest.raises(NotImplementedYet, match="removes files"):
        read_iceberg_incremental(spark, table, s1, s2)
    # duplicate keys refuse
    dup = spark.createDataFrame([(2, "x"), (2, "y")], "id long, val string")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_iceberg(spark, table, dup, on=["id"])
