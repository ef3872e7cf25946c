"""Property pins for the round-9 log artifacts: ANY commit history
compacted over ANY in-range window (Delta log compaction) and ANY
timeline archived at ANY keep-depth (Hudi archival) must replay to the
exact same state as the full log — the invariant both features exist
to preserve, checked over generated op sequences rather than one
hand-picked fixture."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# an op is ("append", salt) or ("merge", salt); salts vary the touched
# key subsets so generated histories overlap adds/removes differently
_OPS = st.lists(
    st.tuples(
        st.sampled_from(["append", "merge"]),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=2,
    max_size=5,
)


def _apply_delta_ops(spark, table, ops):
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        merge_delta,
    )

    next_key = [0]
    for i, (kind, salt) in enumerate(ops):
        if kind == "append" or i == 0:
            lo = next_key[0]
            rows = [(lo + j, 100 * i + salt) for j in range(4)]
            next_key[0] = lo + 4
            append_delta(
                spark.createDataFrame(rows, "k int, v int"), table,
                n_files=1,
            )
        else:
            keys = [j for j in range(next_key[0]) if j % 3 == salt % 3]
            if not keys:
                keys = [0]
            merge_delta(
                spark, table,
                spark.createDataFrame(
                    [(j, 1000 * i + salt) for j in keys], "k int, v int"
                ),
                on=["k"],
            )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS, data=st.data())
def test_delta_log_compaction_replay_equivalence(spark, tmp_path_factory,
                                                 ops, data):
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        DeltaSnapshot,
        read_delta,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        compact_delta_log,
    )

    table = str(tmp_path_factory.mktemp("dlc") / "t")
    _apply_delta_ops(spark, table, ops)
    last = DeltaSnapshot(table).version
    start = data.draw(st.integers(min_value=0, max_value=last))
    end = data.draw(st.integers(min_value=start, max_value=last))
    before_rows = {
        (r.k, r.v) for r in read_delta(spark, table).collect()
    }
    before = DeltaSnapshot(table)
    compact_delta_log(spark, table, start, end)
    for v in range(start, end + 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    snap = DeltaSnapshot(table)
    assert snap.version == before.version
    assert snap._active == before._active
    assert snap.txns == before.txns
    after_rows = {
        (r.k, r.v) for r in read_delta(spark, table).collect()
    }
    assert after_rows == before_rows


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["append", "upsert"]),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=2,
        max_size=5,
    ),
    data=st.data(),
)
def test_hudi_archival_replay_equivalence(spark, tmp_path_factory, ops,
                                          data):
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        hudi_live_slices,
        read_hudi,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        archive_hudi_timeline,
        upsert_hudi,
    )

    table = str(tmp_path_factory.mktemp("harc") / "t")
    next_key = [0]
    n_instants = 0
    for i, (kind, salt) in enumerate(ops):
        if kind == "append" or i == 0:
            lo = next_key[0]
            rows = [(lo + j, 10 * i + salt) for j in range(3)]
            next_key[0] = lo + 3
            append_hudi(
                spark.createDataFrame(rows, "k int, v int"), table,
                n_groups=1,
            )
        else:
            keys = [j for j in range(next_key[0]) if j % 3 == salt % 3]
            if not keys:
                keys = [0]
            upsert_hudi(
                spark,
                spark.createDataFrame(
                    [(j, 1000 * i + salt) for j in keys], "k int, v int"
                ),
                table,
                key="k",
            )
        n_instants += 1
    keep = data.draw(st.integers(min_value=1, max_value=n_instants))
    before_rows = {(r.k, r.v) for r in read_hudi(spark, table).collect()}
    before_slices = hudi_live_slices(table)
    archived = archive_hudi_timeline(table, keep_last_n=keep)
    assert len(archived) == max(0, n_instants - keep)
    assert hudi_live_slices(table) == before_slices
    after_rows = {(r.k, r.v) for r in read_hudi(spark, table).collect()}
    assert after_rows == before_rows
