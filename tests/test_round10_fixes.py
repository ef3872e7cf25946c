"""Round-10 ADVICE regression pins.

* Delta: partial cleanup inside a compacted range recovers via the
  compaction file; CDF's to_version past the latest commit raises the
  version error, not the cleanup error.
* Glue: the BOOLEAN statistics arm derives NDV from the counts real
  Glue actually sends (NumberOfTrues/NumberOfFalses).
* Hudi: the archived-timeline cache invalidates when an archive file
  is rewritten in place (same name+size, new mtime).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.errors import DeltaError
from datafusion_catalogprovider_glue_spark.sources.delta import (
    DeltaSnapshot,
    read_delta,
    read_delta_cdf,
)
from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
    append_delta,
    compact_delta_log,
)
from datafusion_catalogprovider_glue_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partially_cleaned_compacted_range_recovers(spark, tmp_path):
    """Cleanup that deleted only SOME commits of a compacted range
    (the first ones survive) must still replay: the reader enters the
    range via the surviving commits, hits the hole, and restarts the
    range from the {start}.{end}.compacted.json reconciled state."""
    table = str(tmp_path / "partial")
    docs = load_table(spark, SF, "documents").select("doc_id")
    for m in range(4):  # v0..v3
        append_delta(docs.filter(F.col("doc_id") % 4 == m), table)
    want = read_delta(spark, table).count()
    compact_delta_log(spark, table, 1, 3)
    # delete v2 and v3 but KEEP v0, v1 — replay enters [1,3] via v1
    log_dir = os.path.join(table, "_delta_log")
    for v in (2, 3):
        os.remove(os.path.join(log_dir, f"{v:020d}.json"))
    snap = DeltaSnapshot(table)
    assert snap.version == 3
    assert read_delta(spark, table).count() == want
    # a snapshot pinned INSIDE the range still refuses (the compaction
    # end reaches past the pin — replaying it would leak v3)
    with pytest.raises(DeltaError, match="compacted into"):
        DeltaSnapshot(table, version=2)
    # pinning AT the surviving prefix still works
    assert DeltaSnapshot(table, version=1).version == 1


def test_cdf_to_version_beyond_latest_raises_version_error(spark, tmp_path):
    """read_delta_cdf(to_version=N) for an N the table never reached
    is a caller error: 'version not in log', never the misleading
    'commits were cleaned up' refusal."""
    table = str(tmp_path / "cdfver")
    docs = load_table(spark, SF, "documents").select("doc_id")
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table)  # v0
    append_delta(docs.filter(F.col("doc_id") % 2 == 1), table)  # v1
    with pytest.raises(DeltaError, match="not in log"):
        read_delta_cdf(spark, table, to_version=5)
    # the happy path is untouched
    assert read_delta_cdf(spark, table, to_version=1).count() > 0


def test_glue_boolean_stats_derive_ndv_from_true_false_counts():
    """Real Glue BooleanColumnStatisticsData carries NumberOfTrues /
    NumberOfFalses (no NumberOfDistinctValues field) — the ingest must
    derive NDV from which sides are populated, not read 0."""
    from datafusion_catalogprovider_glue_spark.catalog.fake_glue import (
        FakeGlueClient,
        glue_column_statistics,
        parquet_table,
    )

    stats_item = {
        "ColumnName": "flag",
        "ColumnType": "boolean",
        "StatisticsData": {
            "Type": "BOOLEAN",
            "BooleanColumnStatisticsData": {
                "NumberOfTrues": 7,
                "NumberOfFalses": 3,
                "NumberOfNulls": 2,
            },
        },
    }
    mono_item = {
        "ColumnName": "always_true",
        "ColumnType": "boolean",
        "StatisticsData": {
            "Type": "BOOLEAN",
            "BooleanColumnStatisticsData": {
                "NumberOfTrues": 12,
                "NumberOfFalses": 0,
                "NumberOfNulls": 0,
            },
        },
    }
    client = FakeGlueClient(
        {"db": {"t": parquet_table("db", "t", "/tmp/x", [("flag", "boolean")])}},
        column_stats={
            ("db", "t"): {"flag": stats_item, "always_true": mono_item}
        },
    )
    prof = glue_column_statistics(
        client, "db", "t", ["flag", "always_true"]
    )
    assert prof["flag"]["n_distinct"] == 2
    assert prof["flag"]["n_nulls"] == 2
    assert prof["always_true"]["n_distinct"] == 1


def test_archived_timeline_cache_invalidates_on_rewrite(spark, tmp_path):
    """Rebuilding a table at the same path (rmtree + rewrite, the
    fixture pattern) must not serve the OLD table's archived commit
    metadata: the cache signature includes mtime, so a same-name
    same-size rewrite re-decodes."""
    import datafusion_catalogprovider_glue_spark.sources.hudi as hudi_mod
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        _archived_timeline,
        hudi_completed_instants,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        archive_hudi_timeline,
        upsert_hudi,
    )

    table = str(tmp_path / "cache_inv")
    base = spark.createDataFrame([(i, i) for i in range(4)], "k int, n int")
    t1 = append_hudi(base, table)
    upsert_hudi(
        spark, spark.createDataFrame([(0, 9)], "k int, n int"),
        table, key="k",
    )
    archive_hudi_timeline(table, keep_last_n=1)
    first = _archived_timeline(table)
    assert any(inst == t1 for inst, _a in first)
    adir = os.path.join(table, ".hoodie", "archived")
    name = [f for f in os.listdir(adir) if f.endswith(".avro")][0]
    path = os.path.join(adir, name)
    # rewrite the SAME bytes (same name, same size, new mtime) and
    # count decodes: a (name,size)-only signature would serve the
    # cache; the mtime-aware signature must re-decode
    with open(path, "rb") as fh:
        payload = fh.read()
    os.remove(path)
    with open(path, "wb") as fh:
        fh.write(payload)
    os.utime(path, ns=(os.stat(path).st_atime_ns + 10**9,
                       os.stat(path).st_mtime_ns + 10**9))
    calls = {"n": 0}
    real_decode = hudi_mod.__dict__.get("_archived_timeline")
    from datafusion_catalogprovider_glue_spark.sources import avro_fallback

    orig = avro_fallback.decode_container_file

    def counting(p):
        calls["n"] += 1
        return orig(p)

    avro_fallback.decode_container_file = counting
    try:
        again = _archived_timeline(table)
    finally:
        avro_fallback.decode_container_file = orig
    assert again == first
    assert calls["n"] >= 1, "mtime change must invalidate the cache"
    assert real_decode is not None
    # and the public surface still resolves the archived instant
    assert t1 in hudi_completed_instants(table)


def test_shuffle_partitions_scale_adaptive(spark, monkeypatch):
    """r10 optimization: the shuffle-partition count must derive from
    the environment (explicit override > live parallelism > CPU seed),
    never a constant pinned to local[32] — the driver benches at lower
    core counts and a cluster needs thousands (guide §2.2)."""
    from datafusion_catalogprovider_glue_spark.session import (
        _shuffle_partitions,
        apply_engine_conf,
    )

    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    # live session: follows the context's defaultParallelism
    assert _shuffle_partitions(spark) == str(
        spark.sparkContext.defaultParallelism
    )
    # production override wins
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4096")
    assert _shuffle_partitions(spark) == "4096"
    apply_engine_conf(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "4096"
    # restore the session's adaptive value for later tests
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    apply_engine_conf(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == str(
        spark.sparkContext.defaultParallelism
    )
    # AQE coalescing must size partitions by bytes, not core count
    # (guide §2.2; A/B recorded in session.py)
    assert (
        spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        )
        == "false"
    )
