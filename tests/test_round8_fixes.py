"""Round-8 pins: foreign Delta checkpoint layouts (multi-part classic
and V2 with sidecars, delta-io PROTOCOL.md §Checkpoints / §V2
Checkpoints) must replay to the exact same snapshot the JSON log
yields, refuse incomplete part/sidecar sets loudly, and carry DVs +
hive partitioning through — a checkpoint that silently drops any of
those is data corruption after log cleanup."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.errors import DeltaError
from datafusion_catalogprovider_glue_spark.sources.delta import (
    DeltaSnapshot,
    read_delta,
)
from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
    append_delta,
    checkpoint_delta_multipart,
    checkpoint_delta_v2,
    merge_delta_dv,
)
from datafusion_catalogprovider_glue_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _fixture(spark, tmp_path, ckpt_fn):
    """DV-bearing partitioned table, checkpointed via ckpt_fn, with
    pre-checkpoint commits deleted and a post-checkpoint append."""
    table = str(tmp_path / "t")
    shutil.rmtree(table, ignore_errors=True)
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table,
                 partition_by="lang")
    merge_delta_dv(
        spark, table,
        docs.filter(F.col("doc_id") % 3 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)),
        on=["doc_id"], matched_delete=F.col("t.lang") == "de",
    )
    baseline = {
        (r.doc_id, r.n_chars) for r in read_delta(spark, table).collect()
    }
    v = ckpt_fn(table)
    log_dir = os.path.join(table, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[:-5].isdigit() and int(f[:-5]) <= v:
            os.remove(os.path.join(log_dir, f))
    appended = docs.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 7 == 0)
    )
    append_delta(appended, table, partition_by="lang")
    expected = baseline | {
        (r.doc_id, r.n_chars) for r in appended.collect()
    }
    return table, v, expected


def test_multipart_checkpoint_replays_exact_snapshot(spark, tmp_path):
    table, v, expected = _fixture(
        spark, tmp_path, lambda t: checkpoint_delta_multipart(spark, t, 3)
    )
    snap = DeltaSnapshot(table)
    assert snap._dvs, "DVs must survive the multi-part checkpoint"
    assert snap.partition_columns == ["lang"]
    got = {(r.doc_id, r.n_chars) for r in read_delta(spark, table).collect()}
    assert got == expected


def test_multipart_checkpoint_refuses_missing_part(spark, tmp_path):
    table, v, _ = _fixture(
        spark, tmp_path, lambda t: checkpoint_delta_multipart(spark, t, 3)
    )
    log_dir = os.path.join(table, "_delta_log")
    part = os.path.join(
        log_dir, f"{v:020d}.checkpoint.0000000002.0000000003.parquet"
    )
    os.rename(part, part + ".gone")
    with pytest.raises(DeltaError, match="incomplete multi-part"):
        DeltaSnapshot(table)


def test_v2_checkpoint_replays_exact_snapshot(spark, tmp_path):
    table, v, expected = _fixture(
        spark, tmp_path, lambda t: checkpoint_delta_v2(spark, t, 2)
    )
    snap = DeltaSnapshot(table)
    assert snap._dvs, "DVs must survive the V2 checkpoint"
    assert snap.partition_columns == ["lang"]
    got = {(r.doc_id, r.n_chars) for r in read_delta(spark, table).collect()}
    assert got == expected


def test_v2_checkpoint_refuses_missing_sidecar(spark, tmp_path):
    table, v, _ = _fixture(
        spark, tmp_path, lambda t: checkpoint_delta_v2(spark, t, 2)
    )
    sc_dir = os.path.join(table, "_delta_log", "_sidecars")
    victim = os.path.join(sc_dir, sorted(os.listdir(sc_dir))[0])
    os.rename(victim, victim + ".gone")
    with pytest.raises(DeltaError, match="sidecar missing"):
        DeltaSnapshot(table)


def test_v2_top_level_json_actions_supported(spark, tmp_path):
    """The V2 spec allows a JSON top-level checkpoint; the reader's
    action-file loader must accept json-lines as well as parquet."""
    import json

    table, v, expected = _fixture(
        spark, tmp_path, lambda t: checkpoint_delta_v2(spark, t, 2)
    )
    log_dir = os.path.join(table, "_delta_log")
    top = [
        f for f in os.listdir(log_dir)
        if f.startswith(f"{v:020d}.checkpoint.") and f.endswith(".parquet")
    ][0]
    rows = DeltaSnapshot._read_action_file(os.path.join(log_dir, top))
    json_top = os.path.join(
        log_dir, top[: -len(".parquet")] + ".json"
    )
    with open(json_top, "w") as fh:
        for row in rows:
            fh.write(json.dumps(
                {k: v2 for k, v2 in row.items() if v2 is not None}
            ) + "\n")
    os.remove(os.path.join(log_dir, top))
    got = {(r.doc_id, r.n_chars) for r in read_delta(spark, table).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# Iceberg `partitions` + `history` metadata tables, rollback primitive
# ---------------------------------------------------------------------------


def test_iceberg_rollback_and_history_lineage(spark, tmp_path):
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        iceberg_history_df,
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        rollback_iceberg,
    )

    table = str(tmp_path / "ice")
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    append_iceberg(a, table)
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0), table)
    rollback_iceberg(table, seq=1)
    # the rolled-back table serves exactly snapshot A again
    assert read_iceberg(spark, table).count() == a.count()
    append_iceberg(docs.filter(F.col("doc_id") % 7 == 0), table)
    hist = {
        (r.ordinal, r.seq): r.is_current_ancestor
        for r in iceberg_history_df(spark, table).collect()
    }
    assert hist == {(1, 1): True, (2, 2): False, (3, 1): True, (4, 3): True}
    # a non-ancestor rollback target must refuse
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_iceberg(table, seq=2)
    # history timestamps strictly increase (rollback entries included)
    ts = [
        r.made_current_at_ms
        for r in iceberg_history_df(spark, table)
        .orderBy("ordinal")
        .collect()
    ]
    assert ts == sorted(ts) and len(set(ts)) == len(ts)


def test_iceberg_partitions_table_unifies_specs(spark, tmp_path):
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        iceberg_partitions_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )

    table = str(tmp_path / "ice")
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0).repartition(1), table)
    append_iceberg(
        docs.filter(F.col("doc_id") % 3 != 0).repartition("lang"),
        table,
        partition_by="lang",
    )
    rows = iceberg_partitions_df(spark, table).collect()
    null_rows = [r for r in rows if r.partition is None]
    lang_rows = [r for r in rows if r.partition is not None]
    assert len(null_rows) == 1 and null_rows[0].file_count == 1
    assert null_rows[0].record_count == docs.filter(
        F.col("doc_id") % 3 == 0
    ).count()
    assert {r.spec_id for r in null_rows} != {r.spec_id for r in lang_rows}
    assert sum(r.record_count for r in lang_rows) == docs.filter(
        F.col("doc_id") % 3 != 0
    ).count()


# ---------------------------------------------------------------------------
# Hudi files index (metadata-table `files` analog)
# ---------------------------------------------------------------------------


def test_hudi_files_index_equals_full_replay(spark, tmp_path):
    """The index-seeded file-slice view must equal the full timeline
    replay exactly, including replacecommit retirements captured in
    the index and commits landing after it."""
    from datafusion_catalogprovider_glue_spark.sources import hudi as hudi_mod
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        hudi_live_slices,
        index_hudi_files,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        cluster_hudi,
        upsert_hudi,
    )

    table = str(tmp_path / "hudi")
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    append_hudi(docs.filter(F.col("doc_id") % 2 == 0), table)
    upsert_hudi(spark, docs.filter(F.col("doc_id") % 3 == 0), table,
                key="doc_id")
    cluster_hudi(spark, table, "doc_id", n_groups=2)
    index_hudi_files(table)
    upsert_hudi(spark, docs.filter(F.col("doc_id") % 5 == 0), table,
                key="doc_id")
    with_index = hudi_live_slices(table)
    # force the full replay by hiding the index dir
    idx_dir = os.path.join(table, hudi_mod._FILES_INDEX_DIR)
    os.rename(idx_dir, idx_dir + ".hidden")
    try:
        full = hudi_live_slices(table)
    finally:
        os.rename(idx_dir + ".hidden", idx_dir)
    assert with_index == full


# ---------------------------------------------------------------------------
# ADVICE fixes: stats conservatism, merge-gate placement, ref safety
# ---------------------------------------------------------------------------


def test_file_stats_drop_columns_with_partial_row_group_stats(tmp_path):
    """A column whose min/max can't be folded over EVERY row group
    must record no range at all: a partial fold understates the true
    range and stats pruning would wrongly skip the file.  Fixture: a
    two-row-group file whose string column decodes in rg1 but is
    invalid utf-8 in rg2 (the decode-failure arm of the fold)."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        _file_stats,
    )

    path = str(tmp_path / "two_rg.parquet")
    tbl = pa.table(
        {
            "a": pa.array([1, 2, 3, 4], pa.int64()),
            "b": pa.array(
                [b"aa", b"ab", b"\xff\xfe", b"\xff\xff"], pa.binary()
            ),
        }
    )
    pq.write_table(tbl, path, row_group_size=2)
    assert pq.ParquetFile(path).metadata.num_row_groups == 2
    stats = _json.loads(_file_stats(path))
    assert stats["minValues"].get("a") == 1 and stats["maxValues"]["a"] == 4
    # before the fix, b carried rg1's ["aa","ab"] range — understated
    assert "b" not in stats["minValues"] and "b" not in stats["maxValues"]


def test_merge_constraint_exempts_delete_only_tombstones(spark, tmp_path):
    """CDC tombstones whose only effect is a matched DELETE may carry
    constraint-violating placeholder payloads — constraints gate the
    rows actually written, not the raw source (both merge paths)."""
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        add_delta_constraint,
        merge_delta,
        merge_delta_dv,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    for merge_fn in (merge_delta, merge_delta_dv):
        t = str(tmp_path / merge_fn.__name__)
        append_delta(docs.filter(F.col("doc_id") % 2 == 0), t)
        add_delta_constraint(spark, t, "chars_pos", "n_chars >= 0")
        # tombstone batch: matched keys, poisoned payload, all deleted
        tomb = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "n_chars", F.lit(-1).cast(docs.schema["n_chars"].dataType)
        )
        n_before = read_delta(spark, t).count()
        n_tomb = tomb.count()
        merge_fn(spark, t, tomb, on=["doc_id"], matched_delete=F.lit(True))
        assert read_delta(spark, t).count() == n_before - n_tomb
        # a poisoned row that would actually LAND still refuses
        with pytest.raises(ValueError, match="violated"):
            merge_fn(
                spark, t,
                docs.filter(F.col("doc_id") % 7 == 3).withColumn(
                    "n_chars",
                    F.lit(-1).cast(docs.schema["n_chars"].dataType),
                ),
                on=["doc_id"],
            )


def test_dv_merge_validates_generated_columns(spark, tmp_path):
    """merge_delta_dv must enforce delta.generationExpression on the
    rows it writes, exactly like merge_delta (previously unchecked)."""
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        merge_delta_dv,
    )

    t = str(tmp_path / "gen")
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    base = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "n2", (F.col("n_chars") * 2).cast("long")
    )
    append_delta(base, t, generated={"n2": "n_chars * 2"})
    bad = docs.filter(F.col("doc_id") % 5 == 1).withColumn(
        "n2", F.lit(0).cast("long")
    )
    with pytest.raises(ValueError, match="generated column"):
        merge_delta_dv(spark, t, bad, on=["doc_id"])
    good = docs.filter(F.col("doc_id") % 5 == 1).withColumn(
        "n2", (F.col("n_chars") * 2).cast("long")
    )
    merge_delta_dv(spark, t, good, on=["doc_id"])


def test_dv_merge_carries_stats_through_readd(spark, tmp_path):
    """A DV re-add must keep the prior add's stats JSON — dropping it
    would permanently disable stats skipping for every touched file."""
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        merge_delta_dv,
    )

    t = str(tmp_path / "dvstats")
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), t)
    snap0 = DeltaSnapshot(t)
    assert snap0._stats, "fixture: appends must record stats"
    merge_delta_dv(
        spark, t,
        docs.filter(F.col("doc_id") % 6 == 0),
        on=["doc_id"], matched_delete=F.lit(True),
    )
    snap1 = DeltaSnapshot(t)
    assert snap1._dvs, "fixture: merge must have produced DVs"
    for rel in snap1._dvs:
        assert rel in snap1._stats, f"DV re-add dropped stats for {rel}"
        assert snap1._stats[rel]["numRecords"] == snap0._stats[rel][
            "numRecords"
        ]


def test_tag_refuses_to_clobber_branch_ref(spark, tmp_path):
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        branch_iceberg,
        tag_iceberg,
    )

    t = str(tmp_path / "ice")
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), t)
    branch_iceberg(t, "staging")
    with pytest.raises(ValueError, match="exists as a branch"):
        tag_iceberg(t, "staging")
    # resetting the branch stays allowed
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0), t)
    branch_iceberg(t, "staging")


# ---------------------------------------------------------------------------
# Binary Amazon Ion codec (sources/ion_binary.py)
# ---------------------------------------------------------------------------


def test_ion_binary_byte_level_spec_pins():
    """Spec vectors (amazon-ion.github.io/ion-docs/docs/binary.html):
    BVM, type descriptors, VarUInt framing, typed encodings."""
    from datafusion_catalogprovider_glue_spark.sources.ion_binary import (
        _enc_value,
        _enc_varuint,
        decode_ion_binary,
        encode_ion_binary,
    )

    assert _enc_varuint(0) == b"\x80"
    assert _enc_varuint(127) == b"\xff"
    assert _enc_varuint(128) == b"\x01\x80"  # 7-bit groups, end flag
    assert _enc_value(True) == b"\x11" and _enc_value(False) == b"\x10"
    assert _enc_value(None) == b"\x0f"  # null.null
    assert _enc_value(0) == b"\x20"  # int zero: L = 0, no magnitude
    assert _enc_value(255) == b"\x21\xff"
    assert _enc_value(-1) == b"\x31\x01"  # negative: type 3, magnitude
    assert _enc_value(0.0) == b"\x40"  # float zero: L = 0
    assert _enc_value(1.0) == b"\x48\x3f\xf0" + b"\x00" * 6
    assert _enc_value("ab") == b"\x82ab"
    long_s = "x" * 20  # L >= 14 -> VarUInt length
    assert _enc_value(long_s) == b"\x8e\x94" + long_s.encode()
    stream = encode_ion_binary([{"k": 1}], ["k"])
    assert stream[:4] == b"\xe0\x01\x00\xea"
    assert decode_ion_binary(stream) == [{"k": 1}]


def test_ion_binary_rejects_non_tabular_and_unknown_types():
    from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet
    from datafusion_catalogprovider_glue_spark.sources.ion_binary import (
        decode_ion_binary,
    )

    with pytest.raises(NotImplementedYet, match="version marker"):
        decode_ion_binary(b"{not ion}")
    # a top-level scalar is not a table row
    with pytest.raises(NotImplementedYet, match="struct"):
        decode_ion_binary(b"\xe0\x01\x00\xea\x21\x05")
    # decimal (type 5) is outside the tabular subset -> loud refusal
    with pytest.raises(NotImplementedYet, match="type code 5"):
        decode_ion_binary(b"\xe0\x01\x00\xea\x51\x81")


def test_ion_binary_catalog_autodetect(spark, tmp_path):
    """An IonHiveSerDe table whose files are BINARY Ion routes to the
    binary decoder; text (JSON-shaped) Ion keeps the JSON path."""
    import json as _json

    from datafusion_catalogprovider_glue_spark.catalog.catalog import (
        GlueCatalog,
    )
    from datafusion_catalogprovider_glue_spark.catalog.fake_glue import (
        FakeGlueClient,
    )
    from datafusion_catalogprovider_glue_spark.sources.ion_binary import (
        encode_ion_binary,
    )

    rows = [{"a": i, "b": f"s{i}"} for i in range(10)]
    bin_dir, txt_dir = str(tmp_path / "bin"), str(tmp_path / "txt")
    os.makedirs(bin_dir), os.makedirs(txt_dir)
    with open(os.path.join(bin_dir, "data.10n"), "wb") as fh:
        fh.write(encode_ion_binary(rows, ["a", "b"]))
    with open(os.path.join(txt_dir, "data.json"), "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")

    def _table(name, loc):
        return {
            "DatabaseName": "db", "Name": name, "Parameters": {},
            "PartitionKeys": [],
            "StorageDescriptor": {
                "InputFormat": "org.apache.hadoop.mapred.TextInputFormat",
                "OutputFormat":
                    "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
                "SerdeInfo": {
                    "SerializationLibrary":
                        "com.amazon.ionhiveserde.IonHiveSerDe",
                    "Parameters": {},
                },
                "Parameters": {},
                "Columns": [
                    {"Name": "a", "Type": "bigint"},
                    {"Name": "b", "Type": "string"},
                ],
                "Location": loc,
            },
        }

    cat = GlueCatalog(
        spark,
        FakeGlueClient(
            {"db": {"t_bin": _table("t_bin", bin_dir),
                    "t_txt": _table("t_txt", txt_dir)}}
        ),
    )
    for name, fmt in (("t_bin", "ion-binary"), ("t_txt", "json")):
        entry = cat.register_table("db", name)
        assert entry.format == fmt
        got = {
            (r.a, r.b) for r in spark.table(entry.view).collect()
        }
        assert got == {(i, f"s{i}") for i in range(10)}


# ---------------------------------------------------------------------------
# Delta protocol gating (minReaderVersion / readerFeatures)
# ---------------------------------------------------------------------------


def _write_protocol(table, version, protocol):
    import json as _json

    p = os.path.join(table, "_delta_log", f"{version:020d}.json")
    with open(p, "w") as fh:
        fh.write(_json.dumps({"protocol": protocol}) + "\n")


def test_delta_reader_gates_on_protocol(spark, tmp_path):
    table = str(tmp_path / "t")
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table)
    n = read_delta(spark, table).count()
    # supported feature set under (3, 7): replay unchanged
    _write_protocol(table, 1, {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors", "columnMapping",
                           "v2Checkpoint", "timestampNtz"],
    })
    assert read_delta(spark, table).count() == n
    # unknown feature refuses
    _write_protocol(table, 2, {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["someFutureFeature"],
    })
    with pytest.raises(DeltaError, match="someFutureFeature"):
        DeltaSnapshot(table)
    # reader version past the ceiling refuses
    _write_protocol(table, 2, {"minReaderVersion": 9,
                               "minWriterVersion": 9})
    with pytest.raises(DeltaError, match="minReaderVersion 9"):
        DeltaSnapshot(table)
    # time travel BEFORE the poisoned commit still reads
    assert DeltaSnapshot(table, version=1).version == 1


def test_delta_protocol_gates_through_checkpoint(spark, tmp_path):
    """Protocol actions inside a checkpoint must gate too — a V3
    checkpointed table read only through its parquet state."""
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        checkpoint_delta,
    )

    table = str(tmp_path / "t")
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table)
    checkpoint_delta(spark, table)
    log_dir = os.path.join(table, "_delta_log")
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    # the engine's own checkpoint carries (1, 2): replay fine
    assert DeltaSnapshot(table).version == 0


# ---------------------------------------------------------------------------
# OPTIMIZE ZORDER
# ---------------------------------------------------------------------------


def test_zorder_rewrite_is_logical_identity_and_folds_dvs(spark, tmp_path):
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        merge_delta_dv,
        optimize_delta_zorder,
    )

    table = str(tmp_path / "z")
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table, n_files=4)
    merge_delta_dv(
        spark, table, docs.filter(F.col("doc_id") % 6 == 0),
        on=["doc_id"], matched_delete=F.lit(True),
    )
    before = {
        (r.doc_id, r.n_chars) for r in read_delta(spark, table).collect()
    }
    optimize_delta_zorder(spark, table, ["doc_id", "n_chars"], n_files=4)
    snap = DeltaSnapshot(table)
    assert not snap._dvs, "z-order rewrite must fold deletion vectors away"
    after = {
        (r.doc_id, r.n_chars) for r in read_delta(spark, table).collect()
    }
    assert after == before


def test_zorder_refuses_nulls_and_partitioned(spark, tmp_path):
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        optimize_delta_zorder,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    t1 = str(tmp_path / "n")
    append_delta(
        docs.withColumn(
            "n_chars",
            F.when(F.col("doc_id") % 17 == 0, None).otherwise(
                F.col("n_chars")
            ),
        ),
        t1,
    )
    with pytest.raises(ValueError, match="NULL"):
        optimize_delta_zorder(spark, t1, ["doc_id", "n_chars"])
    t2 = str(tmp_path / "p")
    append_delta(docs, t2, partition_by="lang")
    with pytest.raises(ValueError, match="unpartitioned"):
        optimize_delta_zorder(spark, t2, ["doc_id", "n_chars"])


# ---------------------------------------------------------------------------
# functions.let — interpreted-HOF capture binding
# ---------------------------------------------------------------------------


def test_let_binding_is_value_identical(spark):
    """let(bound, body) must produce exactly the values of the naive
    captured form — it exists purely to stop interpreted HOF lambdas
    re-evaluating captured expressions per element."""
    from datafusion_catalogprovider_glue_spark.functions import let

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    t = F.split(F.col("text"), " ")
    k = 5
    captured = F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (k - 1)),
            lambda i: F.xxhash64(F.slice(t, i, k)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))

    def _body(tt):
        return F.when(
            F.size(tt) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(tt) - (k - 1)),
                lambda i: F.xxhash64(F.slice(tt, i, k)),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    bound = let(t, _body)
    a = d.select("doc_id", captured.alias("g")).collect()
    b = d.select("doc_id", bound.alias("g")).collect()
    assert {(r.doc_id, tuple(r.g)) for r in a} == {
        (r.doc_id, tuple(r.g)) for r in b
    }


def test_let_binding_matches_naive_on_nulls(spark):
    """A NULL bound value must flow through let exactly like the
    naive expression (size(NULL) is NULL under ANSI semantics)."""
    from datafusion_catalogprovider_glue_spark.functions import let

    df = spark.createDataFrame([(None,), ([1, 2],)], "v array<int>")
    bound = [
        r.n for r in df.select(
            let(F.col("v"), lambda x: F.size(x)).alias("n")
        ).collect()
    ]
    naive = [r.n for r in df.select(F.size("v").alias("n")).collect()]
    assert bound == naive == [None, 2]


# ---------------------------------------------------------------------------
# Binary Ion codec: property-based roundtrip (hypothesis)
# ---------------------------------------------------------------------------

import hypothesis.strategies as st
from hypothesis import given, settings

_ion_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2 ** 70), max_value=2 ** 70),  # > 64-bit
    st.floats(allow_nan=False, width=64),
    st.text(max_size=40),
    st.lists(st.integers(min_value=-1000, max_value=1000), max_size=5),
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "weird name", "$x", ""]),
            _ion_scalar,
            max_size=5,
        ),
        max_size=12,
    )
)
def test_ion_binary_roundtrip_property(rows):
    """encode→decode is identity for any tabular row set: arbitrary
    field subsets per row, ints beyond 64 bits (Ion ints are
    arbitrary-magnitude), ±0.0 and subnormal floats, empty and
    non-identifier field names, empty docs."""
    from datafusion_catalogprovider_glue_spark.sources.ion_binary import (
        decode_ion_binary,
        encode_ion_binary,
    )

    fields = ["a", "b", "c", "weird name", "$x", ""]
    data = encode_ion_binary(rows, fields)
    out = decode_ion_binary(data)
    expect = [
        {k: v for k, v in row.items() if v is not None} for row in rows
    ]
    assert len(out) == len(expect)
    for got, want in zip(out, expect):
        assert set(got) == set(want)
        for k, v in want.items():
            g = got[k]
            if isinstance(v, float):
                import math
                assert math.copysign(1, g) == math.copysign(1, v)
                assert g == v or (math.isnan(g) and math.isnan(v))
            else:
                assert g == v and type(g) is type(v)
