"""Hudi CoW reader semantics: timeline filtering, file-slice
resolution (later instant wins per file group), and point-in-time
reads (sources/hudi.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.errors import SparkError
from datafusion_catalogprovider_glue_spark.operators.catalog_ops import (
    _HUDI_T1,
    _HUDI_T2,
    _hudi_fixture,
)
from datafusion_catalogprovider_glue_spark.sources.hudi import (
    hudi_completed_instants,
    read_hudi,
)
from datafusion_catalogprovider_glue_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def hudi_dir(spark):
    return _hudi_fixture(spark, SF_SMOKE)


def test_timeline_excludes_inflight(hudi_dir):
    """The t2 inflight marker sits next to the completed commits and
    must not surface as an instant."""
    assert hudi_completed_instants(hudi_dir) == [_HUDI_T1, _HUDI_T2]


def test_snapshot_resolves_latest_file_slice(spark, hudi_dir):
    """Snapshot = odd rows at t1 + even rows rewritten (price doubled)
    at t2, row for row."""
    orders = load_table(spark, SF_SMOKE, "orders")
    want = {
        (r.o_orderkey, round(r.o_totalprice * (2 if r.o_orderkey % 2 == 0 else 1), 2))
        for r in orders.select("o_orderkey", "o_totalprice").collect()
    }
    got = {
        (r.o_orderkey, round(r.o_totalprice, 2))
        for r in read_hudi(spark, hudi_dir).select("o_orderkey", "o_totalprice").collect()
    }
    assert got == want


def test_point_in_time_sees_first_commit(spark, hudi_dir):
    """as_of=t1 excludes the t2 rewrite: the read reconstructs the
    original orders exactly."""
    orders = load_table(spark, SF_SMOKE, "orders")
    want = {(r.o_orderkey, r.o_totalprice) for r in orders.select("o_orderkey", "o_totalprice").collect()}
    got = {
        (r.o_orderkey, r.o_totalprice)
        for r in read_hudi(spark, hudi_dir, as_of=_HUDI_T1)
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    assert got == want
    assert read_hudi(spark, hudi_dir, as_of=_HUDI_T1).count() == orders.count()


def test_as_of_before_first_instant_refuses(spark, hudi_dir):
    with pytest.raises(SparkError):
        read_hudi(spark, hudi_dir, as_of="19990101000000")


def test_missing_timeline_refuses(spark, tmp_path):
    with pytest.raises(SparkError):
        read_hudi(spark, str(tmp_path))


# ---------------------------------------------------------------------------
# merge-on-read
# ---------------------------------------------------------------------------

from datafusion_catalogprovider_glue_spark.operators.catalog_ops import (  # noqa: E402
    _HUDI_MOR_T1,
    _hudi_mor_fixture,
)
from datafusion_catalogprovider_glue_spark.sources.hudi import (  # noqa: E402
    hudi_mor_instants,
    read_hudi_mor,
)


@pytest.fixture(scope="module")
def mor_dir(spark):
    return _hudi_mor_fixture(spark, SF_SMOKE)


def test_mor_timeline_has_both_actions(mor_dir):
    acts = [a for _t, a in hudi_mor_instants(mor_dir)]
    assert acts == ["commit", "deltacommit"]  # inflight marker excluded


def test_mor_snapshot_merges_log_over_base(spark, mor_dir):
    orders = load_table(spark, SF_SMOKE, "orders")
    want = {
        (r.o_orderkey,
         round(r.o_totalprice * (3 if r.o_orderkey % 10 == 0 else 1), 2))
        for r in orders.select("o_orderkey", "o_totalprice").collect()
    }
    got = {
        (r.o_orderkey, round(r.o_totalprice, 2))
        for r in read_hudi_mor(spark, mor_dir, key_col="o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    assert got == want


def test_mor_merge_touches_only_price(spark, mor_dir):
    """Partial-payload merge must leave every non-updated column
    byte-identical to the base row."""
    orders = load_table(spark, SF_SMOKE, "orders")
    base = {r.o_orderkey: (r.o_orderstatus, r.o_custkey) for r in orders.collect()}
    for r in read_hudi_mor(spark, mor_dir, key_col="o_orderkey").collect():
        assert (r.o_orderstatus, r.o_custkey) == base[r.o_orderkey]


def test_mor_read_optimized_ignores_log(spark, mor_dir):
    orders = load_table(spark, SF_SMOKE, "orders")
    ro = read_hudi_mor(spark, mor_dir, key_col="o_orderkey", read_optimized=True)
    assert {
        (r.o_orderkey, r.o_totalprice)
        for r in ro.select("o_orderkey", "o_totalprice").collect()
    } == {
        (r.o_orderkey, r.o_totalprice)
        for r in orders.select("o_orderkey", "o_totalprice").collect()
    }


def test_mor_as_of_before_deltacommit_equals_read_optimized(spark, mor_dir):
    pinned = read_hudi_mor(spark, mor_dir, key_col="o_orderkey", as_of=_HUDI_MOR_T1)
    ro = read_hudi_mor(spark, mor_dir, key_col="o_orderkey", read_optimized=True)
    assert sorted(map(tuple, pinned.collect())) == sorted(map(tuple, ro.collect()))


# ---------------------------------------------------------------------------
# file-slice rule: logs attach to their base instant, not to any base
# ---------------------------------------------------------------------------


def _mini_mor_table(spark, root, *, with_compaction):
    """Hand-built MOR table: t1 commit writes fg-1 = {(1,'a',10.0),
    (2,'b',20.0)}; t2 deltacommit logs an update for k=1 (v→'A') and a
    LOG-ONLY INSERT k=99; optional t3 commit compacts fg-1 to
    {(1,'a3',30.0),(2,'b3',40.0)} which must supersede the t2 log."""
    import json
    import os

    from pyspark.sql import types as T

    from datafusion_catalogprovider_glue_spark.sources.avro_fallback import (
        write_avro_container,
    )

    root = str(root)
    tl = os.path.join(root, ".hoodie")
    os.makedirs(tl, exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("amt", T.DoubleType()),
        ]
    )

    def _base(name, rows):
        import shutil

        staging = os.path.join(root, f"_stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        shutil.move(part, os.path.join(root, name))
        shutil.rmtree(staging)

    def _instant(ts, action, file_id, path):
        with open(os.path.join(tl, f"{ts}.{action}"), "w") as fh:
            json.dump(
                {"partitionToWriteStats": {"": [{"fileId": file_id, "path": path}]}},
                fh,
            )

    _base("fg1_t1.parquet", [(1, "a", 10.0), (2, "b", 20.0)])
    _instant("t1", "commit", "fg-1", "fg1_t1.parquet")
    write_avro_container(
        os.path.join(root, "log_t2.avro"),
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        ),
        [(1, "A"), (99, "new")],
    )
    _instant("t2", "deltacommit", "fg-1", "log_t2.avro")
    if with_compaction:
        _base("fg1_t3.parquet", [(1, "a3", 30.0), (2, "b3", 40.0)])
        _instant("t3", "commit", "fg-1", "fg1_t3.parquet")
    return root


def test_mor_log_only_insert_surfaces(spark, tmp_path):
    """A log record whose key is absent from every base file is an
    insert: it must appear in the snapshot (base-only columns null),
    not be silently dropped."""
    root = _mini_mor_table(spark, tmp_path / "t", with_compaction=False)
    rows = {r.k: r for r in read_hudi_mor(spark, root, key_col="k").collect()}
    assert set(rows) == {1, 2, 99}
    assert rows[1].v == "A" and rows[1].amt == 10.0  # partial update
    assert rows[2].v == "b" and rows[2].amt == 20.0  # untouched
    assert rows[99].v == "new" and rows[99].amt is None  # log-only insert


def test_mor_compaction_supersedes_earlier_log(spark, tmp_path):
    """After the t3 compaction rewrites fg-1's base file, the t2 log
    (written against the t1 base) must NOT be re-applied over the
    fresher base — the spec's file-slice rule."""
    root = _mini_mor_table(spark, tmp_path / "t", with_compaction=True)
    rows = {r.k: r for r in read_hudi_mor(spark, root, key_col="k").collect()}
    assert set(rows) == {1, 2}, "stale log insert must not resurface"
    assert rows[1].v == "a3" and rows[1].amt == 30.0
    assert rows[2].v == "b3" and rows[2].amt == 40.0
    # pinned before the compaction, the log applies again
    pinned = {
        r.k: r
        for r in read_hudi_mor(spark, root, key_col="k", as_of="t2").collect()
    }
    assert pinned[1].v == "A" and 99 in pinned


# ---------------------------------------------------------------------------
# round 6: MoR WRITE path (append_hudi_log / upsert_hudi_log / compact_hudi)
# ---------------------------------------------------------------------------


def _mor_fixture(spark, tmp_path):
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "mor")
    base = spark.createDataFrame(
        [(i, f"v{i}", 100 + i) for i in range(8)], "k int, v string, n int"
    )
    t1 = append_hudi(base, table, n_groups=2)
    # updates for half the keys (partial payload: no v column) + one
    # log-only insert
    log = spark.createDataFrame(
        [(i, 1000 + i) for i in range(0, 8, 2)] + [(99, 1099)],
        "k int, n int",
    )
    t2 = upsert_hudi_log(spark, log, table, key="k")
    return table, t1, t2


def test_mor_write_snapshot_vs_read_optimized(spark, tmp_path):
    """Pre-compaction: snapshot merges the engine-written log (updates
    overwrite non-null columns, log-only keys insert with base-only
    columns NULL) while read-optimized serves stale base rows — the
    documented divergence that makes MoR cheap to write."""
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
    )

    table, _t1, _t2 = _mor_fixture(spark, tmp_path)
    snap = {
        (r["k"], r["v"], r["n"])
        for r in read_hudi_mor(spark, table, key_col="k")
        .select("k", "v", "n")
        .collect()
    }
    expect = {
        (i, f"v{i}", 1000 + i if i % 2 == 0 else 100 + i) for i in range(8)
    } | {(99, None, 1099)}
    assert snap == expect
    ro = {
        (r["k"], r["v"], r["n"])
        for r in read_hudi_mor(
            spark, table, key_col="k", read_optimized=True
        )
        .select("k", "v", "n")
        .collect()
    }
    assert ro == {(i, f"v{i}", 100 + i) for i in range(8)}


def test_mor_compaction_supersede_and_preservation(spark, tmp_path):
    """Compaction rewrites ONLY log-bearing groups (the untouched
    group's base file stays byte-identical), supersedes the logs (its
    own earlier log never re-applies), and afterwards read-optimized
    == snapshot == the pre-compaction snapshot."""
    import os

    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        compact_hudi,
    )

    table, t1, _t2 = _mor_fixture(spark, tmp_path)
    before = {
        (r["k"], r["v"], r["n"])
        for r in read_hudi_mor(spark, table, key_col="k")
        .select("k", "v", "n")
        .collect()
    }
    base_files = {
        f: os.path.getsize(os.path.join(table, f))
        for f in os.listdir(table)
        if f.endswith(".parquet")
    }
    t3 = compact_hudi(spark, table, key="k")
    assert int(t3) > int(t1)
    after = {
        (r["k"], r["v"], r["n"])
        for r in read_hudi_mor(spark, table, key_col="k")
        .select("k", "v", "n")
        .collect()
    }
    ro_after = {
        (r["k"], r["v"], r["n"])
        for r in read_hudi_mor(spark, table, key_col="k", read_optimized=True)
        .select("k", "v", "n")
        .collect()
    }
    assert before == after == ro_after
    # any group without matched keys kept its base file untouched
    survivors = [
        f
        for f in base_files
        if os.path.exists(os.path.join(table, f))
        and os.path.getsize(os.path.join(table, f)) == base_files[f]
    ]
    assert survivors, "at least the original base files still exist"
    # time travel to t1 still serves the pre-log state
    ro_t1 = {
        (r["k"], r["n"])
        for r in read_hudi_mor(spark, table, key_col="k", as_of=t1)
        .select("k", "n")
        .collect()
    }
    assert ro_t1 == {(i, 100 + i) for i in range(8)}


def test_mor_upsert_routing_refusals(spark, tmp_path):
    """upsert_hudi_log refuses duplicate source keys and multi-group
    keys; append_hudi_log leaves routing to the caller (documented)."""
    import pytest

    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "refuse")
    append_hudi(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        table,
        n_groups=1,
    )
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "k int, v string")
    with pytest.raises(SparkError, match="duplicate"):
        upsert_hudi_log(spark, dup, table, key="k")
    append_hudi(
        spark.createDataFrame([(1, "dup")], "k int, v string"),
        table,
        n_groups=1,
    )
    with pytest.raises(SparkError, match="more than one"):
        upsert_hudi_log(
            spark,
            spark.createDataFrame([(1, "z")], "k int, v string"),
            table,
            key="k",
        )


def test_mor_incremental_multi_change_and_bounds(spark, tmp_path):
    """Two in-range logs for one key merge newest-non-null per column;
    the (begin, end] bound excludes later instants; untouched base
    rows never surface."""
    from pyspark.sql import functions as F  # noqa: F401

    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi_mor_incremental,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        upsert_hudi_log,
    )

    table = str(tmp_path / "morinc")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, n int"
    )
    t1 = append_hudi(base, table, n_groups=1)
    # t2 updates n for k=1; t3 updates v for k=1 and n for k=2
    t2 = upsert_hudi_log(
        spark, spark.createDataFrame([(1, 100)], "k int, n int"), table, "k"
    )
    t3 = upsert_hudi_log(
        spark,
        spark.createDataFrame([(1, "a3")], "k int, v string").join(
            spark.createDataFrame([(1,)], "k int"), "k"
        ).select("k", "v"),
        table,
        "k",
    )
    # full range (t1, t3]: k=1 merges v from t3 with n from t2
    got = {
        (r["k"], r["v"], r["n"], r["_hoodie_commit_time"])
        for r in read_hudi_mor_incremental(
            spark, table, key_col="k", begin=t1
        ).collect()
    }
    assert got == {(1, "a3", 100, t3)}
    # bounded range (t1, t2]: only the t2 change, no v column merge
    got2 = {
        (r["k"], r["n"], r["_hoodie_commit_time"])
        for r in read_hudi_mor_incremental(
            spark, table, key_col="k", begin=t1, end=t2
        )
        .select("k", "n", "_hoodie_commit_time")
        .collect()
    }
    assert got2 == {(1, 100, t2)}
    # empty range
    assert (
        read_hudi_mor_incremental(
            spark, table, key_col="k", begin=t3
        ).count()
        == 0
    )
