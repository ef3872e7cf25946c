"""E4 semantics: a real multi-batch Structured Streaming run where the
watermark actually drops late data (not reachable from the single-batch
oracle check).

Semantics verified (matches Spark's documented behavior):
- a late row is dropped only when the watermark has passed its WINDOW END
  (state evicted) — not merely when its event time is below the watermark;
- watermark computed from batch N's data takes effect in batch N+1;
- in append mode a closed window is emitted in the first batch whose
  effective watermark >= window end (including the final no-data batch).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F


def test_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()

    def write_file(name: str, rows, mtime: float):
        # the file stream source does not recurse into subdirectories, so
        # stage the parquet write and move the part file up to src/
        df = spark.createDataFrame(rows, "ts string, user_id bigint").select(
            F.to_timestamp("ts").alias("ts"), "user_id"
        )
        staging = tmp_path / ("staging_" + name)
        df.coalesce(1).write.parquet(str(staging))
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        dest = src / (name + ".parquet")
        shutil.move(part, str(dest))
        os.utime(dest, (mtime, mtime))

    base = time.time()
    # b1: three rows in the 12:00 window + 13:15 -> watermark 13:05 (effective b2)
    write_file(
        "b1",
        [
            ("2024-03-01 12:00:00", 1),
            ("2024-03-01 12:05:00", 2),
            ("2024-03-01 12:59:00", 3),
            ("2024-03-01 13:15:00", 4),
        ],
        base - 100,
    )
    # b2: on-time 13:45; the 12:00 window (end 13:00 <= wm 13:05) closes n=3
    write_file("b2", [("2024-03-01 13:45:00", 5)], base - 80)
    # b3: 12:30 is LATE (window end 13:00 <= wm 13:35, state evicted) -> dropped
    write_file("b3", [("2024-03-01 12:30:00", 6)], base - 60)
    # b4: 14:50 -> wm 14:40, closes the 13:00 window (n=2) in the final batch
    write_file("b4", [("2024-03-01 14:50:00", 7)], base - 40)

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint")
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r.start: r.n for r in spark.table("late_drop_sink").collect()}
    # 12:00 closes with n=3 (late 12:30 dropped — n=4 or a duplicate 12:00 row
    # would mean the watermark failed); 13:00 closes with n=2 (13:15 + 13:45);
    # the 14:00 window is still open and must NOT be emitted
    assert rows == {"12:00": 3, "13:00": 2}


def test_upsert_merger_multi_batch(spark, tmp_path):
    """The foreachBatch upsert must converge across batches: a later
    batch's newer row replaces state; an older row does not."""
    from datafusion_catalogprovider_glue_spark.streaming.windows import (
        make_upsert_merger,
    )

    state = str(tmp_path / "state")
    cols = ["user_id", "event_id", "ts", "event_type"]
    merge = make_upsert_merger(state, cols)
    schema = "user_id long, event_id long, ts timestamp_ntz, event_type string"
    import datetime as dt

    t = dt.datetime(2026, 1, 1, 12, 0, 0)

    b0 = spark.createDataFrame(
        [(1, 10, t, "view"), (2, 20, t, "view")], schema
    )
    merge(b0, 0)
    # batch 1: user 1 has a NEWER event; user 3 is new; user 2 gets an
    # OLDER event that must lose the merge
    b1 = spark.createDataFrame(
        [
            (1, 11, t + dt.timedelta(minutes=5), "purchase"),
            (3, 30, t, "view"),
            (2, 19, t - dt.timedelta(minutes=5), "click"),
        ],
        schema,
    )
    merge(b1, 1)
    got = {
        r.user_id: (r.event_id, r.event_type)
        for r in spark.read.parquet(f"{state}/current").collect()
    }
    assert got == {1: (11, "purchase"), 2: (20, "view"), 3: (30, "view")}


def test_stream_stream_join_pairs_across_batches(spark, tmp_path):
    """Stream-stream interval join state must carry across micro-batches:
    a view in batch 1 must still pair with a click arriving in batch 3
    (inside the 30-min bound), and out-of-bound clicks must not pair."""
    src = tmp_path / "ss_src"
    src.mkdir()

    def write_file(name: str, rows, mtime: float):
        df = spark.createDataFrame(
            rows, "ts string, user_id bigint, event_id bigint, event_type string"
        ).select(
            F.to_timestamp("ts").alias("ts"), "user_id", "event_id", "event_type"
        )
        staging = tmp_path / ("staging_" + name)
        df.coalesce(1).write.parquet(str(staging))
        part = next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(staging)
            for f in fs
            if f.endswith(".parquet")
        )
        dest = src / (name + ".parquet")
        shutil.move(part, str(dest))
        os.utime(dest, (mtime, mtime))

    base = time.time()
    # b1: two views for user 1, one view user 2
    write_file(
        "b1",
        [
            ("2024-03-01 12:00:00", 1, 10, "view"),
            ("2024-03-01 12:20:00", 1, 11, "view"),
            ("2024-03-01 12:00:00", 2, 12, "view"),
        ],
        base - 90,
    )
    # b2: click user 1 at 12:25 -> pairs with BOTH b1 views (25 and 5 min gaps)
    write_file("b2", [("2024-03-01 12:25:00", 1, 20, "click")], base - 60)
    # b3: click user 1 at 12:45 -> pairs ONLY with the 12:20 view (45 > 30 min
    # from the 12:00 view); click user 2 at 13:00 -> out of bound (60 min), no pair
    write_file(
        "b3",
        [
            ("2024-03-01 12:45:00", 1, 21, "click"),
            ("2024-03-01 13:00:00", 2, 22, "click"),
        ],
        base - 30,
    )

    views = (
        spark.readStream.schema(
            "ts timestamp, user_id bigint, event_id bigint, event_type string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "10 minutes")
    )
    clicks = (
        spark.readStream.schema(
            "ts timestamp, user_id bigint, event_id bigint, event_type string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    pairs = views.join(
        clicks,
        (F.col("v_user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("view_id", "click_id")
    q = (
        pairs.writeStream.format("memory")
        .queryName("ss_join_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.view_id, r.click_id) for r in spark.table("ss_join_sink").collect()}
    assert got == {(10, 20), (11, 20), (11, 21)}


def test_stateful_sessionize_rate_source_multibatch(spark):
    """Round-4 verdict item 8: the stateful sessionizer on a NON-FILE
    source — rate-micro-batch (the built-in deterministic streaming
    source; kafka is wire-identical from the operator's point of view:
    both feed unbounded micro-batches through the same watermark +
    applyInPandasWithState plumbing).  Each micro-batch advances event
    time by 40 min (> the 30-min session gap), so every batch closes
    the previous batch's per-user session — state must SURVIVE across
    micro-batches and flush on the event-time timeout, which a
    single-batch file drain cannot prove."""
    from datetime import datetime

    from pyspark.sql.streaming.state import GroupStateTimeout

    def _dt(s):
        return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")

    from datafusion_catalogprovider_glue_spark.streaming.stateful import (
        _OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        SESSION_GAP_MIN,
        _sessionize,
    )

    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 20)
        .option("numPartitions", 2)
        .option("startTimestamp", 1700000000000)
        .option("advanceMillisPerBatch", 40 * 60 * 1000)
        .load()
        .select(
            (F.col("value") % 2).alias("user_id"),
            F.col("timestamp").alias("ts"),
        )
    )
    sessions = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    sink = "rate_sessionize_sink"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.table(sink).collect()
            # two users x (>=2 closed sessions each) proves multi-batch
            # state survival + timeout flushing
            if len(rows) >= 4:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(rows) >= 4, f"only {len(rows)} sessions closed"
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == {0, 1}
    for user_rows in by_user.values():
        # every closed session saw exactly its batch's 10 rows for the
        # user, all at one event time (rate-micro-batch semantics), so
        # the emitted end is start + the session gap
        assert all(r["n_events"] == 10 for r in user_rows)
        assert all(
            (_dt(r["session_end"]) - _dt(r["session_start"])).total_seconds()
            == SESSION_GAP_MIN * 60
            for r in user_rows
        )
    # sessions close in event-time order, 40 min apart
    starts = sorted(_dt(r["session_start"]) for r in by_user[0])
    deltas = {
        int((b - a).total_seconds()) for a, b in zip(starts, starts[1:])
    }
    assert deltas <= {2400}, deltas
