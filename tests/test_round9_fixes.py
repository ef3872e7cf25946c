"""Round-9 pins (advisor findings from round 8):

* Delta checkpoints must carry the table's REAL protocol, not a
  hardcoded (1,2) — after the spec-legal deletion of pre-checkpoint
  commits the checkpoint is the only protocol record, so a hardcoded
  write silently downgrades (2,5) column-mapped and (3,7)
  table-features tables and disarms the reader's refusal gate
  (delta-io PROTOCOL.md §Checkpoints: "exactly one protocol action").
* Hudi MoR log decode must refuse on divergent log-block writer
  schemas rather than silently nulling/dropping columns.
* Binary-Ion decode must handle annotation wrappers NESTED inside
  structs/lists (legal Ion foreign writers emit).
* dedup_substring_spans must not force a broadcast of the unbounded
  survivor-span set.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.errors import DeltaError
from datafusion_catalogprovider_glue_spark.sources.delta import (
    DeltaSnapshot,
    read_delta,
)
from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
    append_delta,
    checkpoint_delta,
    checkpoint_delta_multipart,
    checkpoint_delta_v2,
)
from datafusion_catalogprovider_glue_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _delete_commits(table, upto):
    log_dir = os.path.join(table, "_delta_log")
    for v in range(upto + 1):
        p = os.path.join(log_dir, f"{v:020d}.json")
        if os.path.exists(p):
            os.remove(p)


@pytest.mark.parametrize(
    "ckpt_fn",
    [checkpoint_delta, checkpoint_delta_multipart, checkpoint_delta_v2],
)
def test_checkpoint_carries_column_mapping_protocol(spark, tmp_path, ckpt_fn):
    """A (2,5) column-mapped table checkpointed + log-cleaned must
    still replay as (2,5) — and the column-mapped read must still
    resolve physical names (which requires the protocol AND the
    mapped metaData to survive the checkpoint)."""
    table = str(tmp_path / "cm")
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table,
                 column_mapping=True)
    before = {(r.doc_id, r.lang) for r in read_delta(spark, table).collect()}
    v = ckpt_fn(spark, table)
    _delete_commits(table, v)
    snap = DeltaSnapshot(table)
    assert snap.protocol is not None
    assert snap.protocol["minReaderVersion"] == 2
    assert snap.protocol["minWriterVersion"] == 5
    after = {(r.doc_id, r.lang) for r in read_delta(spark, table).collect()}
    assert after == before


def test_checkpoint_carries_table_features_protocol(spark, tmp_path):
    """A (3,7) table whose readerFeatures this engine supports must
    keep the feature list through a checkpoint; a foreign reader that
    lacks one of those features then still refuses correctly."""
    table = str(tmp_path / "tf")
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    append_delta(docs.filter(F.col("doc_id") % 3 == 0), table)
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors", "timestampNtz"],
        "writerFeatures": ["deletionVectors", "appendOnly"],
    }
    log_dir = os.path.join(table, "_delta_log")
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": proto}) + "\n")
    v = checkpoint_delta(spark, table)
    assert v == 1
    _delete_commits(table, v)
    snap = DeltaSnapshot(table)
    assert snap.protocol["minReaderVersion"] == 3
    assert sorted(snap.protocol["readerFeatures"]) == [
        "deletionVectors", "timestampNtz",
    ]
    assert sorted(snap.protocol["writerFeatures"]) == [
        "appendOnly", "deletionVectors",
    ]


def test_checkpoint_refuses_without_protocol_record(spark, tmp_path):
    """A log whose commits never carried a protocol action (corrupt
    by spec) must refuse to checkpoint rather than invent one."""
    table = str(tmp_path / "np")
    docs = load_table(spark, SF, "documents").select("doc_id")
    append_delta(docs.limit(10), table)
    log_dir = os.path.join(table, "_delta_log")
    p = os.path.join(log_dir, f"{0:020d}.json")
    kept = [
        json.loads(line)
        for line in open(p)
        if line.strip() and "protocol" not in json.loads(line)
    ]
    with open(p, "w") as fh:
        for action in kept:
            fh.write(json.dumps(action) + "\n")
    with pytest.raises(DeltaError, match="protocol"):
        checkpoint_delta(spark, table)


# ---------------------------------------------------------------------------
# Hudi MoR: refuse divergent log-block writer schemas
# ---------------------------------------------------------------------------


def test_mor_refuses_divergent_log_schemas(spark, tmp_path):
    """A MoR table whose deltacommit log blocks were written under
    evolved (divergent) schemas must refuse loudly — the single-pass
    decode projects onto the first log's schema, and silently nulling
    a missing column or dropping an extra one is data corruption."""
    from py4j.protocol import Py4JJavaError

    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "mor_evolve")
    append_hudi(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k int, v string, n int"
        ),
        table,
        n_groups=1,
    )
    upsert_hudi_log(
        spark,
        spark.createDataFrame([(1, 11)], "k int, n int"),
        table,
        key="k",
    )
    # second log under an EVOLVED schema (v instead of n)
    upsert_hudi_log(
        spark,
        spark.createDataFrame([(2, "b2")], "k int, v string"),
        table,
        key="k",
    )
    with pytest.raises(Py4JJavaError, match="schema divergence"):
        read_hudi_mor(spark, table, key_col="k").collect()


def test_mor_consistent_log_schemas_still_merge(spark, tmp_path):
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "mor_ok")
    append_hudi(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k int, v string, n int"
        ),
        table,
        n_groups=1,
    )
    upsert_hudi_log(
        spark, spark.createDataFrame([(1, 11)], "k int, n int"),
        table, key="k",
    )
    upsert_hudi_log(
        spark, spark.createDataFrame([(2, 22)], "k int, n int"),
        table, key="k",
    )
    snap = {
        (r.k, r.v, r.n)
        for r in read_hudi_mor(spark, table, key_col="k")
        .select("k", "v", "n").collect()
    }
    assert snap == {(1, "a", 11), (2, "b", 22)}


# ---------------------------------------------------------------------------
# Streaming restart / exactly-once recovery (Delta txn identifiers)
# ---------------------------------------------------------------------------


def test_stream_upsert_delta_restart_exactly_once(spark, tmp_path):
    """Kill an availableNow drain AFTER a micro-batch's Delta commit
    but BEFORE the streaming checkpoint records it, restart from the
    same checkpointLocation, and prove exactly-once convergence: the
    re-delivered batch is SKIPPED via the spec's txn action (one Delta
    version per EFFECTIVE batch, no double-apply) and the final state
    is the keep-latest oracle."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        merge_delta,
    )

    base = str(tmp_path)
    stream_dir = os.path.join(base, "in")
    table_dir = os.path.join(base, "delta")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(stream_dir)
    for i in range(3):
        staging = os.path.join(base, f"_c{i}")
        spark.createDataFrame(
            [(k, i, 10 * i + k) for k in range(5)], "k int, seq int, v int"
        ).coalesce(1).write.parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs if f.endswith(".parquet")
        )
        os.replace(part, os.path.join(stream_dir, f"chunk-{i}.parquet"))

    app_id = "restart_pin"
    newer = F.col("s.seq") > F.col("t.seq")

    def make_merge(fail_on):
        def _merge(bdf, bid):
            if os.path.exists(os.path.join(table_dir, "_delta_log")):
                if bid <= DeltaSnapshot(table_dir).txns.get(app_id, -1):
                    return  # re-delivered after restart: skip
            from pyspark.sql.window import Window as W

            latest = (
                bdf.withColumn(
                    "_rn",
                    F.row_number().over(
                        W.partitionBy("k").orderBy(F.col("seq").desc())
                    ),
                )
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            if not os.path.exists(os.path.join(table_dir, "_delta_log")):
                append_delta(latest, table_dir, n_files=1,
                             txn=(app_id, bid))
            else:
                merge_delta(spark, table_dir, latest, on=["k"],
                            matched_update=newer, txn=(app_id, bid))
            if fail_on is not None and bid == fail_on:
                raise RuntimeError(
                    "injected crash AFTER the delta commit, BEFORE the "
                    "streaming checkpoint"
                )
        return _merge

    def run(fail_on):
        q = (
            spark.readStream.schema("k int, seq int, v int")
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
            .writeStream.foreachBatch(make_merge(fail_on))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises(StreamingQueryException, match="injected crash"):
        run(fail_on=1)
    # batch 0 (create) and batch 1 (merge) are committed to Delta;
    # the streaming checkpoint does NOT have batch 1
    snap = DeltaSnapshot(table_dir)
    assert snap.version == 1
    assert snap.txns == {app_id: 1}
    run(fail_on=None)  # restart: re-delivers batch 1, then batch 2
    snap = DeltaSnapshot(table_dir)
    # exactly one Delta version per EFFECTIVE batch: the re-delivered
    # batch 1 must NOT have committed again
    assert snap.version == 2
    assert snap.txns == {app_id: 2}
    got = {
        (r.k, r.seq, r.v) for r in read_delta(spark, table_dir).collect()
    }
    assert got == {(k, 2, 20 + k) for k in range(5)}


def _chunked_source(spark, base):
    stream_dir = os.path.join(base, "in")
    os.makedirs(stream_dir)
    for i in range(3):
        staging = os.path.join(base, f"_c{i}")
        spark.createDataFrame(
            [(k, i, 10 * i + k) for k in range(5)], "k int, seq int, v int"
        ).coalesce(1).write.parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs if f.endswith(".parquet")
        )
        os.replace(part, os.path.join(stream_dir, f"chunk-{i}.parquet"))
    return stream_dir


def _drain(spark, stream_dir, ckpt, merge_fn):
    q = (
        spark.readStream.schema("k int, seq int, v int")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
        .writeStream.foreachBatch(merge_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_upsert_iceberg_restart_exactly_once(spark, tmp_path):
    """Same kill-and-restart contract as the Delta pin, for the
    Iceberg sink: the batch id rides in the snapshot summary; the
    re-delivered batch commits NO second snapshot."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        iceberg_max_summary_int,
        merge_iceberg,
    )

    base = str(tmp_path)
    table_dir = os.path.join(base, "ice")
    stream_dir = _chunked_source(spark, base)
    hint = os.path.join(table_dir, "metadata", "version-hint.text")

    def make_merge(fail_on):
        def _merge(bdf, bid):
            exists = os.path.exists(hint)
            if exists:
                last = iceberg_max_summary_int(
                    table_dir, "streaming-batch-id"
                )
                if last is not None and bid <= last:
                    return
            extra = {"streaming-batch-id": str(bid)}
            if not exists:
                append_iceberg(bdf, table_dir, n_files=1,
                               summary_extra=extra)
            else:
                merge_iceberg(
                    spark, table_dir, bdf, on=["k"],
                    matched_update=F.col("s.seq") > F.col("t.seq"),
                    summary_extra=extra,
                )
            if fail_on is not None and bid == fail_on:
                raise RuntimeError("injected crash after iceberg commit")
        return _merge

    ckpt = os.path.join(base, "ckpt")
    with pytest.raises(StreamingQueryException, match="injected crash"):
        _drain(spark, stream_dir, ckpt, make_merge(1))
    assert iceberg_max_summary_int(table_dir, "streaming-batch-id") == 1
    _drain(spark, stream_dir, ckpt, make_merge(None))
    assert iceberg_max_summary_int(table_dir, "streaming-batch-id") == 2
    meta_dir = os.path.join(table_dir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        meta = json.load(fh)
    # one snapshot per EFFECTIVE batch — no double-apply
    assert len(meta["snapshots"]) == 3
    got = {(r.k, r.seq, r.v) for r in read_iceberg(spark, table_dir)
           .select("k", "seq", "v").collect()}
    assert got == {(k, 2, 20 + k) for k in range(5)}


def test_stream_upsert_hudi_restart_exactly_once(spark, tmp_path):
    """Same kill-and-restart contract for the Hudi MoR sink: the
    batch id rides in the commit's extraMetadata; the re-delivered
    batch commits NO second deltacommit."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        hudi_max_extra_int,
        hudi_mor_instants,
        read_hudi_mor,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi_log,
    )

    base = str(tmp_path)
    table_dir = os.path.join(base, "hudi")
    stream_dir = _chunked_source(spark, base)

    def make_merge(fail_on):
        def _merge(bdf, bid):
            exists = os.path.exists(os.path.join(table_dir, ".hoodie"))
            if exists:
                last = hudi_max_extra_int(table_dir, "streamingBatchId")
                if last is not None and bid <= last:
                    return
            extra = {"streamingBatchId": str(bid)}
            if not exists:
                append_hudi(bdf, table_dir, n_groups=1,
                            extra_metadata=extra)
            else:
                upsert_hudi_log(spark, bdf, table_dir, key="k",
                                extra_metadata=extra)
            if fail_on is not None and bid == fail_on:
                raise RuntimeError("injected crash after hudi commit")
        return _merge

    ckpt = os.path.join(base, "ckpt")
    with pytest.raises(StreamingQueryException, match="injected crash"):
        _drain(spark, stream_dir, ckpt, make_merge(1))
    assert hudi_max_extra_int(table_dir, "streamingBatchId") == 1
    _drain(spark, stream_dir, ckpt, make_merge(None))
    assert hudi_max_extra_int(table_dir, "streamingBatchId") == 2
    instants = hudi_mor_instants(table_dir)
    # one instant per EFFECTIVE batch: 1 commit + 2 deltacommits
    assert [a for _t, a in instants] == [
        "commit", "deltacommit", "deltacommit",
    ]
    got = {
        (r.k, r.seq, r.v)
        for r in read_hudi_mor(spark, table_dir, key_col="k")
        .select("k", "seq", "v").collect()
    }
    assert got == {(k, 2, 20 + k) for k in range(5)}


def test_txn_survives_checkpoint_and_log_cleanup(spark, tmp_path):
    """PROTOCOL.md: checkpoints preserve transaction identifiers —
    after checkpoint + commit deletion the streaming writer must still
    see its last committed batch id (all three checkpoint layouts)."""
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        merge_delta,
    )

    for name, ckpt_fn in (
        ("c1", checkpoint_delta),
        ("c2", checkpoint_delta_multipart),
        ("c3", checkpoint_delta_v2),
    ):
        table = str(tmp_path / name)
        df = spark.createDataFrame(
            [(k, 0) for k in range(4)], "k int, v int"
        )
        append_delta(df, table, txn=("app", 0))
        merge_delta(
            spark, table,
            spark.createDataFrame([(1, 99)], "k int, v int"),
            on=["k"], txn=("app", 1),
        )
        v = ckpt_fn(spark, table)
        _delete_commits(table, v)
        snap = DeltaSnapshot(table)
        assert snap.txns == {"app": 1}, (name, snap.txns)
        got = {(r.k, r.v) for r in read_delta(spark, table).collect()}
        assert got == {(0, 0), (1, 99), (2, 0), (3, 0)}


# ---------------------------------------------------------------------------
# Delta log compaction
# ---------------------------------------------------------------------------


def test_log_compaction_carries_dvs_and_starts_at_zero(spark, tmp_path):
    """A compacted range that starts at version 0 must fully replace
    the log prefix, and an in-range DV merge's deletionVector
    descriptor must survive reconciliation (dropping it resurrects
    deleted rows)."""
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        compact_delta_log,
        merge_delta_dv,
    )

    table = str(tmp_path / "dvlc")
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table)  # v0
    merge_delta_dv(
        spark, table, docs.filter(F.col("doc_id") % 6 == 0),
        on=["doc_id"], matched_delete=F.lit(True),
    )  # v1: DV masks the %6 rows
    want = {
        (r.doc_id, r.n_chars) for r in read_delta(spark, table).collect()
    }
    before = DeltaSnapshot(table)
    assert before._dvs
    compact_delta_log(spark, table, 0, 1)
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    snap = DeltaSnapshot(table)
    assert snap._dvs == before._dvs
    assert snap.protocol == before.protocol
    got = {
        (r.doc_id, r.n_chars) for r in read_delta(spark, table).collect()
    }
    assert got == want


def test_log_compaction_refuses_missing_commit_and_holes(spark, tmp_path):
    """Compacting over a missing commit refuses (it cannot invent
    history), and a reader facing a hole with no covering compaction
    file refuses instead of silently serving a stale snapshot."""
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        compact_delta_log,
    )

    table = str(tmp_path / "holes")
    docs = load_table(spark, SF, "documents").select("doc_id")
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table)  # v0
    append_delta(docs.filter(F.col("doc_id") % 2 == 1), table)  # v1
    append_delta(docs.filter(F.col("doc_id") % 7 == 3), table)  # v2
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(DeltaError, match="commit 1 is missing"):
        compact_delta_log(spark, table, 0, 2)
    with pytest.raises(DeltaError, match="hole"):
        DeltaSnapshot(table)


def test_log_compaction_composes_with_checkpoint(spark, tmp_path):
    """Replay order: checkpoint base -> compacted range -> live
    commits, all three artifact classes in one log."""
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        compact_delta_log,
    )

    table = str(tmp_path / "mix")
    docs = load_table(spark, SF, "documents").select("doc_id")
    append_delta(docs.filter(F.col("doc_id") % 4 == 0), table)  # v0
    v = checkpoint_delta(spark, table)
    assert v == 0
    append_delta(docs.filter(F.col("doc_id") % 4 == 1), table)  # v1
    append_delta(docs.filter(F.col("doc_id") % 4 == 2), table)  # v2
    append_delta(docs.filter(F.col("doc_id") % 4 == 3), table)  # v3
    want = read_delta(spark, table).count()
    compact_delta_log(spark, table, 1, 2)
    log_dir = os.path.join(table, "_delta_log")
    for x in (0, 1, 2):
        os.remove(os.path.join(log_dir, f"{x:020d}.json"))
    snap = DeltaSnapshot(table)
    assert snap.version == 3
    assert read_delta(spark, table).count() == want


# ---------------------------------------------------------------------------
# Hudi archived timeline
# ---------------------------------------------------------------------------


def test_mor_archival_preserves_snapshot_and_incremental(spark, tmp_path):
    """Archiving deltacommit instants must leave the MoR snapshot
    identical (log files stay; their timeline metadata resolves via
    the archive) and keep serving incremental pulls whose range
    reaches archived instants."""
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
        read_hudi_mor_incremental,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        archive_hudi_timeline,
        upsert_hudi_log,
    )

    table = str(tmp_path / "mor_arch")
    t1 = append_hudi(
        spark.createDataFrame(
            [(i, f"v{i}", 100 + i) for i in range(6)],
            "k int, v string, n int",
        ),
        table,
        n_groups=2,
    )
    t2 = upsert_hudi_log(
        spark, spark.createDataFrame([(0, 1000), (3, 1003)], "k int, n int"),
        table, key="k",
    )
    t3 = upsert_hudi_log(
        spark, spark.createDataFrame([(1, 2001)], "k int, n int"),
        table, key="k",
    )

    def _snap():
        return {
            (r.k, r.v, r.n)
            for r in read_hudi_mor(spark, table, key_col="k")
            .select("k", "v", "n").collect()
        }

    before = _snap()
    archived = archive_hudi_timeline(table, keep_last_n=1)
    assert archived == [t1, t2]
    assert not os.path.exists(
        os.path.join(table, ".hoodie", f"{t2}.deltacommit")
    )
    assert _snap() == before
    inc = {
        (r.k, r.n)
        for r in read_hudi_mor_incremental(spark, table, "k", begin="0")
        .select("k", "n").collect()
    }
    assert inc == {(0, 1000), (3, 1003), (1, 2001)} | {
        (i, 100 + i) for i in (2, 4, 5)
    }
    # archiving everything would orphan _next_instant's anchor: refuse
    with pytest.raises(Exception, match="keep_last_n"):
        archive_hudi_timeline(table, keep_last_n=0)
    assert t3  # silence unused warning


def test_archival_is_incremental_and_cached(spark, tmp_path):
    """A second archival appends a NEW archive file (append-only
    contract) and the merged timeline stays complete."""
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        hudi_completed_instants,
        read_hudi,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        archive_hudi_timeline,
        upsert_hudi,
    )

    table = str(tmp_path / "cow_arch")
    base = spark.createDataFrame(
        [(i, 10 * i) for i in range(8)], "k int, n int"
    )
    t1 = append_hudi(base, table)
    t2 = upsert_hudi(
        spark, spark.createDataFrame([(0, 999)], "k int, n int"),
        table, key="k",
    )
    assert archive_hudi_timeline(table, keep_last_n=1) == [t1]
    t3 = upsert_hudi(
        spark, spark.createDataFrame([(1, 888)], "k int, n int"),
        table, key="k",
    )
    assert archive_hudi_timeline(table, keep_last_n=1) == [t2]
    adir = os.path.join(table, ".hoodie", "archived")
    assert len([f for f in os.listdir(adir) if f.endswith(".avro")]) == 2
    assert hudi_completed_instants(table) == [t1, t2, t3]
    got = {(r.k, r.n) for r in read_hudi(spark, table).collect()}
    assert got == {(0, 999), (1, 888)} | {(i, 10 * i) for i in range(2, 8)}
    # time travel to the twice-removed archived instant
    old = {(r.k, r.n) for r in read_hudi(spark, table, as_of=t1).collect()}
    assert old == {(i, 10 * i) for i in range(8)}


# ---------------------------------------------------------------------------
# Binary Ion: nested annotation wrappers
# ---------------------------------------------------------------------------


def test_ion_nested_annotations_unwrap():
    """Annotated values nested inside struct fields and list elements
    (legal Ion foreign writers emit — e.g. type annotations on leaf
    values) must decode to the wrapped value, not leak the internal
    _Annotated object (amazon-ion spec: $ion_symbol_table is special
    only at the stream's top level)."""
    from datafusion_catalogprovider_glue_spark.sources.ion_binary import (
        _SYSTEM_SYMBOLS,
        _enc_annotated,
        _enc_struct,
        _enc_td,
        _enc_value,
        decode_ion_binary,
        encode_ion_binary,
    )

    stream = encode_ion_binary([{"k": 1, "xs": None}], ["k", "xs"])
    sid_k = len(_SYSTEM_SYMBOLS) + 1
    sid_xs = sid_k + 1
    # struct field value wrapped in an annotation (sid 4 = "name")
    ann_int = _enc_annotated([4], _enc_value(7))
    # list whose single element is annotated
    ann_list = _enc_td(11, len(ann_int)) + ann_int
    row = _enc_struct([(sid_k, ann_int), (sid_xs, ann_list)])
    rows = decode_ion_binary(stream + row)
    assert rows == [{"k": 1}, {"k": 7, "xs": [7]}]
