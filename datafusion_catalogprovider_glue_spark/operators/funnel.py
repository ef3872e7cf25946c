"""Event-sequence analytics: ordered funnel + cohort retention.

The reference exposes no event analytics (it is a catalog provider,
SURVEY.md §0); these extend the delegated SQL surface (§2-C scoping
note) with the two queries every product-analytics workload runs over
an append-only event stream, each built Spark-first:

* ordered funnel — "view, then click, then purchase" with strict time
  ordering.  The naive relational form is K cascaded
  min-timestamp-after-previous-step aggregations, i.e. K passes over
  the fact table (that IS the oracle).  The Spark plan does it in ONE
  pass: group events by user, sort each user's event list, and run a
  sequential fold (``F.aggregate`` higher-order function, executed in
  codegen — no Python) that advances a (depth, last_ts) state machine
  on each matching step.  One shuffle on user_id, fact scanned once.
  State per user is that user's event list — bounded by per-user
  activity; for power-law users (bots) the swap is the K-pass
  cascaded form or a per-user event cap, noted not needed here.
* cohort retention — users bucketed by first-activity day, counted on
  each later active day.  Join-free plan: distinct (user, day) →
  window MIN(day) per user carries the cohort day onto every activity
  row → one final aggregation.  No broadcast dependency (a cohort
  dimension join would need |users| rows broadcast — fine at 150
  users, wrong at 10⁹), and every stage shrinks the data:
  events → user-days → (cohort, offset) cells.

Strict-inequality step matching makes the funnel independent of how
same-timestamp events are ordered: an event at exactly the previous
step's timestamp never advances the state machine, in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return load_table(spark, sf_dir, "events")


_STEPS = ["view", "click", "purchase"]


@query(
    "events_funnel",
    oracle="""
    WITH u1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), u2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        JOIN u1 ON e.user_id = u1.user_id
        WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY e.user_id
    ), u3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        JOIN u2 ON e.user_id = u2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY e.user_id
    )
    SELECT 1 AS step_no, 'view' AS step, (SELECT COUNT(*) FROM u1) AS users
    UNION ALL
    SELECT 2 AS step_no, 'click' AS step, (SELECT COUNT(*) FROM u2) AS users
    UNION ALL
    SELECT 3 AS step_no, 'purchase' AS step, (SELECT COUNT(*) FROM u3) AS users
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase with strict time order:
    a user reaches step k+1 only with an event strictly after their
    step-k match (greedy earliest-match, which equals the oracle's
    cascaded MIN-after-previous form).

    Plan: ONE shuffle (groupBy user_id), each user's (ts, event_id,
    event_type) list sorted and folded by a codegen'd higher-order
    ``aggregate`` — the oracle's three fact-table passes collapse into
    one.  The per-user depth rows then reduce to three conditional
    counts (map-side combined) and unfold to (step_no, step, users)."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs")
    )
    init = F.struct(
        F.lit(0).alias("depth"),
        F.lit("1900-01-01 00:00:00").cast("timestamp").alias("last_ts"),
    )

    def _advance(acc, e):
        nxt = (
            F.when(acc["depth"] == 0, F.lit(_STEPS[0]))
            .when(acc["depth"] == 1, F.lit(_STEPS[1]))
            .otherwise(F.lit(_STEPS[2]))
        )
        hit = (
            (acc["depth"] < 3)
            & (e["event_type"] == nxt)
            & (e["ts"] > acc["last_ts"])
        )
        return F.when(
            hit,
            F.struct(
                (acc["depth"] + 1).alias("depth"), e["ts"].alias("last_ts")
            ),
        ).otherwise(acc)

    depths = per_user.select(
        F.aggregate(F.col("evs"), init, _advance)["depth"].alias("depth")
    )
    totals = depths.agg(
        F.sum((F.col("depth") >= 1).cast("bigint")).alias("u1"),
        F.sum((F.col("depth") >= 2).cast("bigint")).alias("u2"),
        F.sum((F.col("depth") >= 3).cast("bigint")).alias("u3"),
    )
    return totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_no"),
                        F.lit(step).alias("step"),
                        F.col(f"u{i + 1}").alias("users"),
                    )
                    for i, step in enumerate(_STEPS)
                ]
            )
        ).alias("s")
    ).select("s.*")


@query(
    "events_retention",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ), coh AS (
        SELECT user_id, day,
               MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        FROM daily
    )
    SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
           COUNT(*) AS active_users
    FROM coh GROUP BY cohort_day, day_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: for each cohort (day of a user's
    first activity) and day offset, how many of that cohort's users
    were active.  ``active_users`` is COUNT(*) over unique (user, day)
    rows, i.e. distinct users without a distinct aggregate.

    Join-free plan: distinct user-days (shuffle 1, map-side combined
    straight off the scan), window MIN(day) per user carries the
    cohort day (shuffle 2 — no |users|-sized dimension to broadcast or
    join), final (cohort, offset) rollup (shuffle 3, output is
    O(days²) cells).  Data volume shrinks at every stage, the shape
    that survives 100 TB of events."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("user_id")
    return (
        daily.withColumn("cohort_day", F.min("day").over(w))
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "events_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_event
        FROM events
    )
    SELECT COALESCE(prev_event, '^start') AS prev_event,
           event_type AS next_event,
           COUNT(*) AS n_transitions
    FROM seq GROUP BY 1, 2
    """,
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the event-type transition matrix (Markov counts)
    over each user's time-ordered stream, with '^start' marking
    first events.  The order key is (ts, event_id) — unique, so
    same-timestamp events sequence identically on any engine.

    Plan: one shuffle on user_id for the lag window, then a
    (prev, next) rollup whose output is O(|event types|²) — the fact
    table never materializes a second copy.  The window state is one
    row lookback (lag-1), the cheapest window there is; at 100 TB the
    same shape holds because transitions aggregate before leaving the
    window stage's partitioning."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.coalesce(F.lag("event_type").over(w), F.lit("^start")).alias(
                "prev_event"
            ),
            F.col("event_type").alias("next_event"),
        )
        .groupBy("prev_event", "next_event")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS cnt,
               CAST(CAST(SUM(n_events) AS VARCHAR) AS DOUBLE) AS sn,
               CAST(CAST(SUM(n_events * n_events) AS VARCHAR) AS DOUBLE) AS snn
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n_events,
           ROUND((d.n_events - sn / cnt)
                 / sqrt((snn - sn * sn / cnt) / (cnt - 1)), 6) AS z_score
    FROM daily d JOIN stats s ON d.event_type = s.event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly scoring: each (event_type, day)'s count as a
    z-score against that type's daily distribution — the monitoring
    query behind every "traffic spike" alert.  Variance comes from
    exact INTEGER power sums (Σn, Σn²) so the per-type statistics are
    bit-identical on any engine or partitioning (the agg_moment_stats
    trick); the remaining float work is a fixed-order expression per
    row (sqrt is IEEE-correctly-rounded, so it's as deterministic as
    +/-).  Plan: two shrinking aggregations off one scan — daily
    cells, then per-type sums over ~|days| rows — and a broadcast
    join back onto the cells.  Nothing scales with raw event count
    past the first map-side-combined rollup."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("n_events").cast("double").alias("sn"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("double").alias("snn"),
    )
    sn, cnt, snn = F.col("sn"), F.col("cnt"), F.col("snn")
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n_events",
        F.round(
            (F.col("n_events") - sn / cnt)
            / F.sqrt((snn - sn * sn / cnt) / (cnt - 1)),
            6,
        ).alias("z_score"),
    )


@query(
    "events_rolling_dau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS n_dau FROM ud GROUP BY day),
    c AS (
      SELECT user_id, day + to_days(CAST(x AS INTEGER)) AS wday
      FROM ud, unnest(generate_series(0, 6)) t(x)
    ),
    wau AS (SELECT wday AS day, COUNT(DISTINCT user_id) AS n_wau FROM c GROUP BY wday)
    SELECT dau.day AS day, n_dau, n_wau
    FROM dau JOIN wau USING (day)
    """,
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-user curves: exact DAU and exact 7-day rolling distinct
    users (WAU) per day — the standard growth dashboard, and the thing
    a naive SUM over daily counts gets WRONG (rolling distinct is not
    a sum of dailies; returning users must not double-count).

    Plan: events collapse to distinct (user, day) in ONE shuffle that
    shrinks the data by the per-day event rate; the WAU forward-scatter
    (each user-day feeds days d..d+6 — a 7× explode of the SHRUNKEN
    table, never raw events) lands in a countDistinct keyed by day.
    Nothing after the first aggregation scales with event volume.  At
    100 TB/day the exact form's distinct state is the cost ceiling;
    the sketch swap is `agg_hll_partitioned_merge` (per-day HLL union
    over the window — same curve, bounded memory, documented error).
    The inner join back to DAU keeps only days that exist in the data
    (no ghost trailing days from the scatter).
    """
    ud = (
        _events(spark, sf_dir)
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("n_dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x"),
            "day",
        )
        .select(
            "user_id",
            F.expr("day + make_interval(0, 0, 0, x, 0, 0, 0)").alias("day"),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_wau"))
    )
    return dau.join(wau, "day").select("day", "n_dau", "n_wau")


@query(
    "window_merge_intervals",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + 300000000 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS island_start, MAX(e) AS island_end
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(SUM(island_end - island_start) AS BIGINT) AS covered_us,
           CAST(MAX(island_end - island_start) AS BIGINT) AS longest_us
    FROM merged GROUP BY user_id
    """,
)
def window_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merging: each event opens a 5-minute
    activity interval; overlapping/contained intervals per user merge
    into islands (the classic uptime/coverage computation — distinct
    from `window_session`, which uses the session-window AGGREGATE;
    this is the analytic-window formulation that also handles
    variable-length, fully-contained intervals).

    A new island starts where an interval's start exceeds the running
    MAX of all preceding interval ends (a plain lag(end) misses
    containment); the island id is the running sum of those flags.
    One user_id shuffle carries both windows and the two rollups —
    per-user state is O(1) (running max + counter), all arithmetic on
    integer epoch-µs with a unique (ts, event_id) order key, so both
    engines compute identical islands.  At 100 TB/day the user_id
    key space is wide and unskewed; nothing downstream of the window
    scales with raw events (output is one row per user).
    """
    iv = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(300_000_000)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0).alias("new_island"),
    )
    # the SAME unique (s, event_id) order key as the flag window —
    # ordering by (s, e) would leave same-timestamp rows ambiguous and
    # island assignment engine-dependent
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered_us"),
        F.max(F.col("island_end") - F.col("island_start")).alias("longest_us"),
    )


@query(
    "events_cooccurrence_lift",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY event_type),
    u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ROUND(CAST(p.n_both * u.n_users AS DOUBLE) / (ta.n_t * tb.n_t), 6)
             AS lift
    FROM pairs p
    JOIN tot ta ON ta.event_type = p.type_a
    JOIN tot tb ON tb.event_type = p.type_b
    CROSS JOIN u
    """,
)
def events_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered co-occurrence association (basket analysis): for each
    unordered pair of event types, how many users exhibit BOTH, and the
    lift P(a∧b)/(P(a)·P(b)) — the joint-behavior complement of
    `events_transitions` (which counts ORDERED lag-1 sequences).

    Plan: events collapse to distinct (user, type) first — the self
    join runs on that shrunken table and each user fans out to at most
    |types|² pairs, so the pair stage is bounded by users × 10 here and
    never by raw events.  The lift is one integer-ratio divide
    (n_both·n_users / n_a·n_b), rounded once — bit-identical
    cross-engine, no float accumulation.  Type totals and the user
    count are O(|types|) / O(1) broadcasts back onto the pair table.
    At 100 TB/day only the first distinct touches event volume; skew
    is bounded because per-user output is capped by the type-pair
    count, not activity.
    """
    ev = _events(spark, sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    tot = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    n_users = ev.select(F.countDistinct("user_id").alias("n_users"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = tot.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    tb = tot.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.col("n_users")).cast("double")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "events_new_vs_returning",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      FROM events
    ),
    firsts AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id)
    SELECT ud.day AS day,
           CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning
    FROM ud JOIN firsts f ON ud.user_id = f.user_id
    GROUP BY ud.day
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily split: each active (user, day) is "new"
    iff the day is that user's first-ever day — the acquisition/
    retention decomposition of DAU that pairs with
    `events_rolling_dau` (volume) and `events_retention` (cohort
    triangles).

    Plan: ONE user_id shuffle serves both the first-day window MIN and
    the classification (the same carry-via-window trick as
    events_retention — no |users|-row dimension join), then the day
    rollup.  Integer counts only, nothing float.  At 100 TB the
    distinct (user, day) collapse is again the only stage that sees
    raw events.
    """
    ud = (
        _events(spark, sf_dir)
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id")
    classified = ud.select(
        "day",
        (F.col("day") == F.min("day").over(w)).alias("is_new"),
    )
    return classified.groupBy("day").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("bigint").alias("n_new"),
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).cast("bigint").alias(
            "n_returning"
        ),
    )


SESSION_GAP_US = 1_800_000_000  # 30 min, in microseconds


@query(
    "events_sessionize",
    # Gap arithmetic runs on exact integer microseconds (unix_micros /
    # epoch_us) — no truncation-rule mismatch, no float anywhere.
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_idx
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the batch twin of
    stream_stateful_sessionize: per user, a new session starts after a
    >30-minute silence; sessions get a per-user running index and roll
    up to (start, end, n_events).

    The lag/cumsum pair is the classic gap-and-island shape: both
    windows share one (user_id)-partitioned sort, so the whole op is
    ONE shuffle keyed by user — no skew beyond a single user's event
    volume (the same bound the streaming state store has).  Gap
    arithmetic is exact integer microseconds; (ts, event_id) makes
    the intra-user ordering unique, so session boundaries are
    engine-deterministic even with simultaneous events.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    brk = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = (
        F.sum(brk)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
    )
    return (
        ev.select("user_id", "ts", "event_id", sess.alias("session_idx"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "events_gapfill",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS lo,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS hi
      FROM events
    ),
    grid AS (
      SELECT et.event_type,
             unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hour
      FROM (SELECT DISTINCT event_type FROM events) et CROSS JOIN b
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.hour,
           COALESCE(h.n, 0) AS n_events,
           COALESCE(h.sv, 0.0) AS sum_value
    FROM grid g LEFT JOIN hourly h
      ON g.event_type = h.event_type AND g.hour = h.hour
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket densification with zero-fill (the
    time_bucket_gapfill shape): hourly counts/sums per event type over
    a COMPLETE hour grid — missing (type, hour) combinations surface
    as explicit zero rows instead of silently absent buckets, the
    property charting, anomaly baselines, and window functions over
    the series all assume.

    Plan: the real aggregation is one map-side-combined groupBy; the
    grid is (distinct types) × sequence(min_hour, max_hour) — bounds
    are a broadcast one-row aggregate, so grid construction is a
    row-local explode, and densification is a left join ON the grid
    (grid side is |types| × |hours|, independent of event volume).
    At 100 TB nothing but the first groupBy sees raw events; the
    grid stays metadata-sized unless cardinality × span explodes,
    which is the same cliff every gapfill implementation documents.
    """
    from datafusion_catalogprovider_glue_spark.functions import dsum

    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value"), 4, 8).alias("sv"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    return grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sv"), F.lit(0.0)).alias("sum_value"),
    )


EWMA_LOOKBACK = 8  # window length; alpha = 0.5 (exact binary weights)


@query(
    "events_ewma",
    oracle=f"""
    WITH b AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS lo,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS hi
      FROM events
    ),
    grid AS (
      SELECT et.event_type,
             unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hour
      FROM (SELECT DISTINCT event_type FROM events) et CROSS JOIN b
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    dense AS (
      SELECT g.event_type, g.hour,
             CAST(COALESCE(h.n, 0) AS DOUBLE) AS x
      FROM grid g LEFT JOIN hourly h
        ON g.event_type = h.event_type AND g.hour = h.hour
    ),
    framed AS (
      SELECT event_type, hour,
             list(x) OVER (PARTITION BY event_type ORDER BY hour
                           ROWS BETWEEN {EWMA_LOOKBACK - 1} PRECEDING
                                    AND CURRENT ROW) AS xs
      FROM dense
    )
    SELECT event_type, hour,
           ROUND(list_reduce(list_prepend(0.0, xs),
                             (acc, x) -> acc * 0.5 + x)
                 / (2.0 - power(0.5, len(xs) - 1)), 6) AS ewma
    FROM framed
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average (alpha=0.5,
    {L}-bucket lookback) of hourly event counts per type, over the
    GAP-FILLED series — the smoothing baseline behind alerting and
    trend panels, and the op that is WRONG without densification
    (missing buckets would silently skip decay steps).

    The recurrence is evaluated as a left fold over the frame,
    oldest→newest: acc·0.5 + x accumulates exactly the
    sum_k x_(t-k)·2^-k numerator — no per-element weight table, no
    index arithmetic.  With alpha=1/2 every product is an exponent
    shift (EXACT in IEEE754) and count magnitudes keep each addition
    inside the 53-bit mantissa, so both engines compute bit-identical
    values before the single normalize-divide.  Plan: one grouped agg
    over raw events, the metadata-sized grid join (see
    events_gapfill), then a per-type window — the frame list is at
    most {L} doubles, state O(types x lookback), never event-volume.
    """
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    dense = grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("x"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-(EWMA_LOOKBACK - 1), 0)
    )
    xs = F.collect_list("x").over(w)
    num = F.aggregate(xs, F.lit(0.0), lambda acc, x: acc * 0.5 + x)
    denom = F.lit(2.0) - F.pow(F.lit(0.5), F.size(xs) - 1)
    return dense.select(
        "event_type", "hour", F.round(num / denom, 6).alias("ewma")
    )


ATTRIB_WINDOW_DAYS = 7
_TOUCH_TYPES = ("view", "click")


@query(
    "events_attribution",
    oracle=f"""
    WITH conv AS (
      SELECT c.event_id, c.ts, c.value,
             (SELECT t.event_type FROM events t
              WHERE t.user_id = c.user_id
                AND t.event_type IN ('view', 'click')
                AND (t.ts < c.ts OR (t.ts = c.ts AND t.event_id < c.event_id))
                AND t.ts >= c.ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAY
              ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
      FROM events c WHERE c.event_type = 'purchase'
    )
    SELECT COALESCE(channel, 'unattributed') AS channel,
           COUNT(*) AS n_conversions,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS attributed_revenue
    FROM conv GROUP BY COALESCE(channel, 'unattributed')
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent view/click within a 7-day (ATTRIB_WINDOW_DAYS)
    lookback; purchases with no prior touch in the window are
    'unattributed'.

    The oracle is the K-correlated-subquery relational form (one
    indexed lookup per conversion).  The Spark plan is the single-pass
    event-stream shape: touches and conversions flow through ONE
    window over (user_id, ts) where ``last(touch, ignorenulls=True)``
    carries the latest preceding touch's (type, ts) onto every
    conversion row — one shuffle on user_id, no self-join, no
    per-conversion probe.  At 100 TB the self-join form re-shuffles
    the fact table against itself; the carry-forward window touches
    each event exactly once (the events_sessionize argument, applied
    to attribution)."""
    from datafusion_catalogprovider_glue_spark.functions import dsum

    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    touch = F.when(
        F.col("event_type").isin(*_TOUCH_TYPES),
        F.struct("ts", "event_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = (
        ev.withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "value",
            F.when(
                F.col("last_touch").isNotNull()
                & (
                    F.col("last_touch.ts")
                    >= F.col("ts") - F.expr(
                        f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS"
                    )
                ),
                F.col("last_touch.event_type"),
            )
            .otherwise(F.lit("unattributed"))
            .alias("channel"),
        )
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        dsum(F.col("value"), 2).alias("attributed_revenue"),
    )


_EVENT_INITIALS = {"view": "v", "click": "c", "purchase": "p",
                   "signup": "s", "error": "e"}
_PATTERN = "vc*p"  # view, any clicks, purchase — the conversion motif


@query(
    "events_pattern_match",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(strlen(seq) AS INT) AS n_events,
           CAST(len(regexp_extract_all(seq, '{_PATTERN}')) AS INT)
             AS n_conversions
    FROM seqs
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection (the SQL:2016
    feature Flink CEP implements; Spark has no native operator): each
    user's event history collapses to a compact symbol string — one
    char per event, (ts, event_id)-ordered — and pattern occurrences
    (`vc*p`: view, any clicks, then purchase) are counted with ONE
    regexp over that string.  Non-overlapping leftmost matching is
    identical in Java regex and RE2 for this pattern class, so the
    count is engine-portable.

    Scale shape: one shuffle groups events per user; per-user state is
    the symbol string (1 byte/event — a 10k-event user is a 10 KB
    value), and the regexp runs JVM-side in whole-stage codegen.  The
    general-regex alternative — a cross join against a pattern
    automaton — never appears.  Power-law users are capped upstream
    in production (the events_funnel argument)."""
    ev = _events(spark, sf_dir)
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "ts", "event_id",
                        F.substring("event_type", 1, 1).alias("ini"),
                    )
                )
            ),
            lambda s: s["ini"],
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.length("seq").cast("int").alias("n_events"),
            F.regexp_count(F.col("seq"), F.lit(_PATTERN))
            .cast("int")
            .alias("n_conversions"),
        )
    )


@query(
    "events_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ),
    lat AS (
        SELECT CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS secs
        FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    )
    SELECT unnest([0.25, 0.5, 0.9]) AS q,
           unnest(quantile_cont(secs, [0.25, 0.5, 0.9])) AS latency_secs,
           COUNT(*) AS n_conversions
    FROM lat
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERSION LATENCY distribution: p25/p50/p90 of the seconds
    between each purchase and the latest prior view of the same user —
    the product metric behind "how long does the funnel take".

    Composition of two already-value-proven pieces: the as-of pairing
    runs as the union + carry-forward-window plan (join_asof — one
    user_id shuffle, no inequality-join explosion) and the quantiles
    as the exact interpolated percentile (agg_percentile — integer
    second latencies make the interpolation arithmetic exact in
    doubles, so values hash-match quantile_cont)."""
    ev = _events(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "ts")
        .distinct()
        .select("user_id", "ts", F.lit(0).alias("side"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lat = (
        views.unionByName(purchases)
        .withColumn(
            "v_ts",
            F.last(
                F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .filter((F.col("side") == 1) & F.col("v_ts").isNotNull())
        .select(
            (
                F.unix_timestamp("ts") - F.unix_timestamp("v_ts")
            ).alias("secs")
        )
    )
    qs = [0.25, 0.5, 0.9]
    agg = lat.agg(
        F.percentile(F.col("secs"), F.lit(qs)).alias("qarr"),
        F.count(F.lit(1)).alias("n_conversions"),
    )
    return agg.select(
        F.posexplode("qarr").alias("pos", "latency_secs"), "n_conversions"
    ).select(
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("pos") + 1).alias("q"),
        "latency_secs",
        "n_conversions",
    )


@query(
    "events_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(CAST(ts AS TIMESTAMP)))
               AS cohort_week
      FROM events GROUP BY user_id
    ), rev AS (
      SELECT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            date_trunc('week', CAST(e.ts AS TIMESTAMP)))
                  AS INT) AS week_offset,
             e.value
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           COUNT(*) AS n_purchases,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM rev GROUP BY 1, 2
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LIFETIME-VALUE curves: purchase count and revenue per
    (signup-week cohort, weeks-since-signup offset) — the revenue twin
    of events_retention's activity triangle, and the table every LTV
    model fits from.

    Join-light plan: the cohort table is one groupBy over user ids
    (never a broadcast dependency — events_retention's argument), the
    fact side joins it on user_id once, and revenue sums on the exact
    decimal grid.  Week arithmetic happens identically both engines
    (date_trunc to Monday + week difference)."""
    from datafusion_catalogprovider_glue_spark.functions import dsum

    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "value",
        )
    )
    return rev.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum(F.col("value"), 2).alias("revenue"),
    )


@query(
    "events_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    mau AS (
        SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
        FROM days d JOIN ud u
          ON u.day <= d.day AND u.day > d.day - INTERVAL 30 DAY
        GROUP BY d.day
    ),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day)
    SELECT d.day, d.dau, m.mau,
           ROUND(CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE), 6)
               AS stickiness
    FROM dau d JOIN mau m USING (day)
    """,
)
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS per day — the engagement ratio product
    analytics teams track daily (how much of the monthly audience
    shows up on a given day).

    Same forward-scatter shape as events_rolling_dau, widened to 30
    days: events collapse once to distinct (user, day), then each
    user-day FEEDS the 30 target days it belongs to (a 30× explode of
    the SHRUNKEN table, never raw events) and a per-day countDistinct
    absorbs the scatter.  This beats a day-dimension range join, whose
    nested-loop side tests every user-day against every calendar day;
    the scatter does exactly 30 row-emits per user-day and lands in an
    equi-keyed aggregation AQE can split on a hot day.  The inner join
    back to DAU drops the ghost trailing days the scatter invents past
    the end of data.  All counts are exact BIGINTs; the ratio is one
    identical IEEE division rounded at 6 dp."""
    ev = _events(spark, sf_dir)
    ud = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    mau = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(29))).alias("x"),
            "day",
        )
        .select(
            "user_id",
            F.expr("day + make_interval(0, 0, 0, x, 0, 0, 0)").alias("day"),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return dau.join(mau, "day").select(
        "day",
        "dau",
        "mau",
        F.round(
            F.col("dau").cast("double") / F.col("mau").cast("double"), 6
        ).alias("stickiness"),
    )


@query(
    "events_path_topk",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                            > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM ordered
    ),
    stepped AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
                                     ORDER BY ts, event_id) AS rn
        FROM sessioned
    ),
    paths AS (
        SELECT user_id, session_idx,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM stepped WHERE rn <= 8
        GROUP BY user_id, session_idx
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP SESSION PATHS — the entry-path ("sankey") report: each
    session's first 8 event types joined into a '>'-delimited path
    string, counted across sessions, top 20.

    Sessionization reuses the 30-minute-gap rule (one shuffle keyed by
    user, same as events_sessionize); the path is then built by
    collecting each session's (ts, event_id, type) triples, sorting
    INSIDE the aggregation (sort_array on the collected structs — no
    second window pass), slicing to 8, and joining — all JVM
    higher-order functions.  The 8-step cap bounds both the collected
    state per (user, session) and the path-string cardinality, which
    is what keeps the final path groupBy skew-safe at 100 TB: the
    distinct-path table is tiny (≤ |event_types|^8 but in practice a
    few thousand), so the top-20 is a cheap partial-agg + single
    reducer.  (ts, event_id) makes intra-session order unique, so the
    path string is engine-deterministic under ties.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    brk = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = (
        F.sum(brk)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
    )
    paths = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            sess.alias("session_idx"),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.slice(
                        F.sort_array(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        1,
                        8,
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@query(
    "window_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    )
    SELECT user_id, ts, event_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS distinct_types_so_far
    FROM flagged
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT COUNT per user — "how many distinct event
    types has this user touched as of each event", the breadth-of-
    engagement curve.  SQL has no COUNT(DISTINCT) OVER a running
    frame; the standard rewrite (used identically in both engines) is
    the first-occurrence flag: ROW_NUMBER over (user, type) marks each
    type's first event, and a running SUM of the flag over (user)
    yields the exact distinct count.

    Two window passes, each a keyed shuffle — (user_id, event_type)
    then (user_id) — with no joins and no state beyond one sort run
    per partition; at 100 TB both shuffles are the same cardinality as
    the fact table and spill linearly.  (ts, event_id) uniquifies the
    order so the flag assignment (hence every prefix sum) is
    engine-deterministic under timestamp ties.
    """
    ev = _events(spark, sf_dir)
    first_w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_new = F.when(F.row_number().over(first_w) == 1, 1).otherwise(0)
    return (
        ev.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.sum("is_new").over(run_w).cast("long").alias(
                "distinct_types_so_far"
            ),
        )
    )


@query(
    "events_user_overlap",
    oracle="""
    WITH ud AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM ud GROUP BY event_type
    ),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ud a JOIN ud b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, sa.n_users AS n_a, sb.n_users AS n_b,
           i.n_both,
           ROUND(CAST(i.n_both AS DOUBLE)
                 / CAST(sa.n_users + sb.n_users - i.n_both AS DOUBLE), 6)
               AS jaccard
    FROM inter i
    JOIN sz sa ON sa.event_type = i.type_a
    JOIN sz sb ON sb.event_type = i.type_b
    """,
)
def events_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE OVERLAP — Jaccard similarity between the user sets of
    every event-type pair ("how much does the purchase audience
    overlap the search audience"), the set-algebra report behind
    segment planning.

    The corpus collapses once to distinct (type, user) pairs; the
    intersection is a SELF-JOIN ON user_id — an equi-join whose
    per-user fan-out is bounded by |event_types|², a constant, so it
    is NOT an all-pairs blow-up: at 100 TB the plan is one distinct
    shuffle plus one co-partitioned join on the same key.  Set sizes
    join back via broadcast (the size table has |event_types| rows).
    All set counts are exact BIGINTs; the ratio is one identical IEEE
    division rounded at 6 dp.
    """
    ev = _events(spark, sf_dir)
    ud = ev.select("event_type", "user_id").distinct()
    sz = ud.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    a = ud.select(
        F.col("event_type").alias("type_a"), F.col("user_id").alias("u")
    )
    b = ud.select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("u")
    )
    inter = (
        a.join(b, (a.u == b.u) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = F.broadcast(sz.select(F.col("event_type").alias("type_a"),
                               F.col("n_users").alias("n_a")))
    sb = F.broadcast(sz.select(F.col("event_type").alias("type_b"),
                               F.col("n_users").alias("n_b")))
    return (
        inter.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "events_lorenz_curve",
    oracle="""
    WITH uc AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev
        FROM events GROUP BY user_id
    ),
    dist AS (
        SELECT n_ev, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM uc GROUP BY n_ev
    )
    SELECT n_ev, n_users,
           ROUND(CAST(SUM(n_users) OVER w AS DOUBLE)
                 / CAST(SUM(n_users) OVER t AS DOUBLE), 6) AS cum_user_frac,
           ROUND(CAST(SUM(n_ev * n_users) OVER w AS DOUBLE)
                 / CAST(SUM(n_ev * n_users) OVER t AS DOUBLE), 6)
               AS cum_event_frac
    FROM dist
    WINDOW w AS (ORDER BY n_ev DESC ROWS UNBOUNDED PRECEDING),
           t AS (ORDER BY n_ev DESC ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
    """,
)
def events_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTIVITY CONCENTRATION (Lorenz curve) — "the top X% of users
    produce Y% of events", the power-law report behind bot screening
    and capacity planning.

    Heaviest users first: for each distinct per-user event count, the
    cumulative fraction of users and of events at or above it.  The
    corpus reduces twice before any ordering happens — events →
    per-user counts (one keyed shuffle) → count-value histogram
    (second keyed shuffle, output bounded by max-events-per-user) —
    so the single-partition running-sum window at the end runs over
    the TINY histogram table, never the corpus; same post-aggregate
    pattern as pipeline_curriculum_order's source index.  The grand
    totals come from a FULL-FRAME window over that same tiny table —
    not a separate aggregate-plus-crossJoin, which Catalyst would
    plan as a SECOND SCAN of the corpus (CTEs aren't materialized;
    the plan pin test_lorenz_window_runs_post_aggregate guards the
    single-scan shape).  All cumulative sums are exact BIGINT
    arithmetic; the two fractions are identical IEEE divisions
    rounded at 6 dp.
    """
    ev = _events(spark, sf_dir)
    uc = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev")
    )
    dist = uc.groupBy("n_ev").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    w = Window.orderBy(F.desc("n_ev")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = Window.orderBy(F.desc("n_ev")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ev_weight = F.col("n_ev") * F.col("n_users")
    return dist.select(
        "n_ev",
        "n_users",
        F.round(
            F.sum("n_users").over(w).cast("double")
            / F.sum("n_users").over(t).cast("double"),
            6,
        ).alias("cum_user_frac"),
        F.round(
            F.sum(ev_weight).over(w).cast("double")
            / F.sum(ev_weight).over(t).cast("double"),
            6,
        ).alias("cum_event_frac"),
    )


@query(
    "events_markov_chain",
    # Laplace-smoothed over the FULL K×K grid (unseen transitions get
    # probability mass — the thing raw counts can't give you);
    # probabilities are ratios of exact integers rounded at 9 dp, the
    # per-state entropy sums its K rounded terms on an exact decimal
    # grid (order-free), and the final cast is a clean small-scale
    # decimal -> double.
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_event
        FROM events
    ),
    cnt AS (
        SELECT prev_event, event_type AS next_event, COUNT(*) AS c
        FROM seq WHERE prev_event IS NOT NULL
        GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type AS t FROM events),
    grid AS (
        SELECT a.t AS prev_event, b.t AS next_event,
               COALESCE(c.c, 0) AS c
        FROM types a CROSS JOIN types b
        LEFT JOIN cnt c
          ON c.prev_event = a.t AND c.next_event = b.t
    ),
    k AS (SELECT COUNT(*) AS k FROM types),
    probs AS (
        SELECT g.prev_event, g.next_event, g.c,
               ROUND(CAST(g.c + 1 AS DOUBLE)
                     / (SUM(g.c) OVER (PARTITION BY g.prev_event) + k.k), 9)
                 AS prob
        FROM grid g CROSS JOIN k
    ),
    ent AS (
        SELECT prev_event,
               CAST(-SUM(CAST(ROUND(prob * ln(prob), 9)
                              AS DECIMAL(18,9))) AS DOUBLE) AS entropy
        FROM probs GROUP BY prev_event
    )
    SELECT p.prev_event, p.next_event, CAST(p.c AS BIGINT) AS n_trans,
           p.prob, ROUND(e.entropy, 9) AS prev_entropy
    FROM probs p JOIN ent e ON p.prev_event = e.prev_event
    """,
)
def events_markov_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKOV-CHAIN model over user journeys: Laplace-smoothed
    transition probabilities on the full K×K event-type grid plus the
    per-state transition ENTROPY — the "how predictable is behavior
    after X" statistic behind journey-simulation and next-event
    models.  events_transitions gives raw counts; this is the
    normalized, smoothed model built on the same one-shuffle lag
    window.

    Scale shape: the corpus collapses to the (prev, next) count table
    (≤ K² rows) inside the window stage's partitioning; the grid
    completion, smoothing, and entropy all run on K²-sized data with
    the type list broadcast.  At 100 TB only the lag window touches
    fact rows."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_event"),
            F.col("event_type").alias("next_event"),
        )
        .filter(F.col("prev_event").isNotNull())
        .groupBy("prev_event", "next_event")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    types = ev.select(F.col("event_type").alias("t")).distinct()
    grid = (
        types.select(F.col("t").alias("prev_event"))
        .crossJoin(types.select(F.col("t").alias("next_event")))
        .join(cnt, ["prev_event", "next_event"], "left")
        .select(
            "prev_event", "next_event", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    k = types.agg(F.count(F.lit(1)).alias("k"))
    row_tot = Window.partitionBy("prev_event")
    probs = grid.crossJoin(F.broadcast(k)).select(
        "prev_event",
        "next_event",
        "c",
        F.round(
            (F.col("c") + 1).cast("double")
            / (F.sum("c").over(row_tot) + F.col("k")),
            9,
        ).alias("prob"),
    )
    ent = probs.groupBy("prev_event").agg(
        (
            -F.sum(
                F.round(F.col("prob") * F.log("prob"), 9).cast("decimal(18,9)")
            )
        )
        .cast("double")
        .alias("entropy")
    )
    return probs.join(ent, "prev_event").select(
        "prev_event",
        "next_event",
        F.col("c").cast("bigint").alias("n_trans"),
        "prob",
        F.round("entropy", 9).alias("prev_entropy"),
    )


@query(
    "events_seasonality",
    # Exact integer cell counts; the chi-square contribution is one
    # identical double expression per cell (expected = total/24.0).
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, SUM(n_events) AS total FROM cells GROUP BY 1
    )
    SELECT c.event_type, c.hour, CAST(c.n_events AS BIGINT) AS n_events,
           ROUND((c.n_events - t.total / 24.0)
                 * (c.n_events - t.total / 24.0)
                 / (t.total / 24.0), 6) AS chi2_term
    FROM cells c JOIN tot t ON c.event_type = t.event_type
    """,
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONALITY profile: hour-of-day activity per event type with
    each cell's chi-square contribution against a uniform profile —
    sum the terms for the classic GoF statistic, read single cells
    for "which hours drive it".  Bot traffic shows flat profiles
    (tiny chi²), organic traffic shows diurnal ridges; pipelines use
    this to stratify or flag sources.

    Plan: one groupBy to the 24×K cell table (map-side combined),
    a per-type rollup of that tiny table, broadcast join back —
    fact rows shuffle once, everything after is cell-sized."""
    ev = _events(spark, sf_dir)
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = cells.groupBy("event_type").agg(F.sum("n_events").alias("total"))
    exp = F.col("total") / F.lit(24.0)
    dev = F.col("n_events") - exp
    return cells.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hour",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(dev * dev / exp, 6).alias("chi2_term"),
    )


@query(
    "events_ab_test",
    # Deterministic 50/50 split on md5(user_id) (the sample_hash
    # discipline).  The metric is per-user PURCHASE VALUE (a binary
    # conversion flag saturates at this event density); arm means and
    # variances come from exact 2-dp decimal power sums, the Welch z
    # is one identical double expression (sqrt is correctly-rounded
    # IEEE), rounded at 6 dp, NULL-guarded for the degenerate
    # zero-variance case on both engines.
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS x
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT
            SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_a,
            CAST(CAST(SUM(CASE WHEN arm = 'A' THEN x END) AS VARCHAR) AS DOUBLE) AS sx_a,
            CAST(CAST(SUM(CASE WHEN arm = 'A' THEN x * x END) AS VARCHAR) AS DOUBLE) AS sxx_a,
            SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_b,
            CAST(CAST(SUM(CASE WHEN arm = 'B' THEN x END) AS VARCHAR) AS DOUBLE) AS sx_b,
            CAST(CAST(SUM(CASE WHEN arm = 'B' THEN x * x END) AS VARCHAR) AS DOUBLE) AS sxx_b
        FROM per_user
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(sx_a / n_a, 6) AS mean_a,
           ROUND(sx_b / n_b, 6) AS mean_b,
           CASE WHEN ((sxx_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
                     + ((sxx_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b > 0
                THEN ROUND((sx_a / n_a - sx_b / n_b)
                     / sqrt(((sxx_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
                            + ((sxx_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b), 6)
           END AS z_score
    FROM s
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-TEST evaluation: users hash deterministically into two
    arms and the arms' per-user purchase value is compared with a
    Welch z statistic — the experimentation readout every product
    analytics stack runs hourly, and the hash split is exactly how
    real holdout groups are carved (reproducible on any engine, no
    assignment table to store).

    Plan: one groupBy(user_id) collapses events to a per-user metric
    (map-side combined), then a single global 6-counter aggregation
    of exact decimal power sums; the z arithmetic runs on one row.
    At 100 TB: one user-key shuffle, constant-size everything
    after."""
    ev = _events(spark, sf_dir)
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3", "4", "5", "6", "7"
        ),
        "A",
    ).otherwise("B")
    zero = F.lit(0).cast("decimal(18,2)")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(zero)
        ).alias("x")
    ).select(arm.alias("arm"), F.col("x").cast("decimal(18,2)").alias("x"))
    x = F.col("x")
    s = per_user.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", x)).cast("double").alias("sx_a"),
        F.sum(F.when(F.col("arm") == "A", x * x)).cast("double").alias("sxx_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", x)).cast("double").alias("sx_b"),
        F.sum(F.when(F.col("arm") == "B", x * x)).cast("double").alias("sxx_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    sx_a, sxx_a = F.col("sx_a"), F.col("sxx_a")
    sx_b, sxx_b = F.col("sx_b"), F.col("sxx_b")
    var_term_a = ((sxx_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
    var_term_b = ((sxx_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b
    denom2 = var_term_a + var_term_b
    return s.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        F.round(sx_a / n_a, 6).alias("mean_a"),
        F.round(sx_b / n_b, 6).alias("mean_b"),
        F.when(
            denom2 > 0,
            F.round((sx_a / n_a - sx_b / n_b) / F.sqrt(denom2), 6),
        ).alias("z_score"),
    )


@query(
    "events_survival_km",
    # The KM product is a cumulative SUM of per-step ln factors on the
    # exact decimal grid (order-free), exponentiated once and rounded
    # at 6 dp; risk/event counts are exact integers.  A zero factor
    # (everyone at risk churns) would be ln(0): the zero_seen flag
    # short-circuits survival to 0 from that step on, on both engines.
    oracle="""
    WITH horizon AS (
        SELECT MAX(ts) - INTERVAL 7 DAY AS cutoff FROM events
    ),
    users AS (
        SELECT user_id,
               date_diff('day', MIN(ts), MAX(ts)) AS duration_days,
               MAX(ts) < (SELECT cutoff FROM horizon) AS churned
        FROM events GROUP BY user_id
    ),
    steps AS (
        SELECT duration_days,
               COUNT(*) AS leaving,
               SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS n_events
        FROM users GROUP BY duration_days
    ),
    risk AS (
        SELECT duration_days, n_events,
               (SELECT COUNT(*) FROM users)
                 - COALESCE(SUM(leaving) OVER (ORDER BY duration_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_risk
        FROM steps
    ),
    km AS (
        SELECT duration_days, n_risk, n_events,
               SUM(CASE WHEN n_events < n_risk
                        THEN CAST(ROUND(ln(CAST(n_risk - n_events AS DOUBLE)
                                           / n_risk), 9) AS DECIMAL(18,9))
                        ELSE CAST(0 AS DECIMAL(18,9)) END)
                   OVER (ORDER BY duration_days ROWS UNBOUNDED PRECEDING)
                 AS lsum,
               MAX(CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY duration_days ROWS UNBOUNDED PRECEDING)
                 AS zero_seen
        FROM risk
    )
    SELECT CAST(duration_days AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_events AS BIGINT) AS n_events,
           CASE WHEN zero_seen = 1 THEN 0.0
                ELSE ROUND(exp(CAST(lsum AS DOUBLE)), 6) END AS survival
    FROM km
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve for user retention: lifetime = days
    between a user's first and last event, churn observed when the
    user went quiet before the 7-day censoring horizon (users still
    active near the data edge are CENSORED — they leave the risk set
    without counting as churn, the thing a naive churn-rate query
    gets wrong).  Output: the classic (t, at-risk, events, S(t))
    life table.

    Scale shape: events collapse once per user (map-side combined);
    everything after runs on the distinct-duration table — bounded by
    the day span, not users.  The cumulative windows are
    single-partition over that bounded table (hierarchical prefix
    sums if a calendar ever needs it).  Determinism: the KM product
    becomes a cumulative decimal sum of 9-dp ln factors, one exp at
    the end rounded to 6 dp."""
    ev = _events(spark, sf_dir)
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
    )
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("last_ts", "first_ts").alias("duration_days"),
            (F.col("last_ts") < F.col("cutoff")).alias("churned"),
        )
    )
    steps = users.groupBy("duration_days").agg(
        F.count(F.lit(1)).alias("leaving"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("n_events"),
    )
    total = users.agg(F.count(F.lit(1)).alias("n_total"))
    prior = (
        Window.orderBy("duration_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = steps.crossJoin(F.broadcast(total)).select(
        "duration_days",
        "n_events",
        (
            F.col("n_total")
            - F.coalesce(F.sum("leaving").over(prior), F.lit(0))
        ).alias("n_risk"),
    )
    ln_factor = F.round(
        F.log(
            (F.col("n_risk") - F.col("n_events")).cast("double")
            / F.col("n_risk")
        ),
        9,
    ).cast("decimal(18,9)")
    km = risk.select(
        "duration_days",
        "n_risk",
        "n_events",
        F.sum(
            F.when(F.col("n_events") < F.col("n_risk"), ln_factor).otherwise(
                F.lit(0).cast("decimal(18,9)")
            )
        )
        .over(cum)
        .alias("lsum"),
        F.max(
            F.when(F.col("n_events") >= F.col("n_risk"), 1).otherwise(0)
        )
        .over(cum)
        .alias("zero_seen"),
    )
    return km.select(
        F.col("duration_days").cast("bigint").alias("duration_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.when(F.col("zero_seen") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("lsum").cast("double")), 6))
        .alias("survival"),
    )


@query(
    "events_active_streaks",
    # Gaps-and-islands: within a user's DISTINCT active days, an
    # unbroken run keeps day - row_number() constant; grouping on that
    # anchor yields the streaks.  Everything is exact integer/date
    # arithmetic — no float anywhere.
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    islands AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        FROM user_days
    ),
    streaks AS (
        SELECT user_id, anchor, COUNT(*) AS len
        FROM islands GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def events_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSECUTIVE-DAY activity streaks per user (gaps-and-islands) —
    the engagement metric behind "7-day streak" product mechanics and
    habit-formation cohort cuts.  A run of consecutive active days has
    a constant ``day − row_number()`` anchor; one groupBy over that
    anchor materializes every streak without a self-join (the naive
    form is an interval self-join that explodes quadratically in run
    length).

    Plan: distinct (user, day) collapses the fact table first (events
    per user-day never leave the map side), then ONE user_id shuffle
    serves the row_number window, the streak groupBy, and the per-user
    rollup — three stages, one partitioning, reused.  At 100 TB state
    is |user-days|, not |events|."""
    ev = _events(spark, sf_dir)
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = user_days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


@query(
    "events_ab_cuped",
    # CUPED with view count as the pre-experiment covariate and
    # purchase value as the metric.  theta and every arm statistic
    # derive from exact sufficient statistics (BIGINT counts, 2-dp
    # decimal power sums) cast to double at the SAME points in both
    # engines; the remaining float arithmetic is one fixed-shape
    # scalar expression per output cell, rounded at 6 dp.
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT
            CAST(COUNT(*) AS DOUBLE) AS n,
            CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
            CAST(CAST(SUM(CAST(y AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
            CAST(CAST(SUM(x * CAST(y AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy,
            CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
            SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_a,
            CAST(CAST(SUM(CASE WHEN arm = 'A' THEN x END) AS VARCHAR) AS DOUBLE) AS sx_a,
            CAST(CAST(SUM(CASE WHEN arm = 'A' THEN CAST(y AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sy_a,
            CAST(CAST(SUM(CASE WHEN arm = 'A'
                          THEN x * CAST(y AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sxy_a,
            CAST(CAST(SUM(CASE WHEN arm = 'A' THEN x * x END) AS VARCHAR) AS DOUBLE) AS sxx_a,
            CAST(CAST(SUM(CASE WHEN arm = 'A'
                          THEN CAST(y AS DECIMAL(18,2))
                               * CAST(y AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS syy_a,
            SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_b,
            CAST(CAST(SUM(CASE WHEN arm = 'B' THEN x END) AS VARCHAR) AS DOUBLE) AS sx_b,
            CAST(CAST(SUM(CASE WHEN arm = 'B' THEN CAST(y AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sy_b,
            CAST(CAST(SUM(CASE WHEN arm = 'B'
                          THEN x * CAST(y AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sxy_b,
            CAST(CAST(SUM(CASE WHEN arm = 'B' THEN x * x END) AS VARCHAR) AS DOUBLE) AS sxx_b,
            CAST(CAST(SUM(CASE WHEN arm = 'B'
                          THEN CAST(y AS DECIMAL(18,2))
                               * CAST(y AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS syy_b
        FROM per_user
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
           ROUND((sy_a - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                         * (sx_a - (sx / n) * n_a)) / n_a, 6) AS mean_adj_a,
           ROUND((sy_b - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                         * (sx_b - (sx / n) * n_b)) / n_b, 6) AS mean_adj_b,
           ROUND(((sy_a - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                          * (sx_a - (sx / n) * n_a)) / n_a
                  - (sy_b - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                            * (sx_b - (sx / n) * n_b)) / n_b)
                 / sqrt(
                   (((syy_a - 2 * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                                  * sxy_a
                       + ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                         * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                         * sxx_a)
                     - (sy_a - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                               * sx_a)
                       * (sy_a - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                                 * sx_a) / n_a) / (n_a - 1)) / n_a
                   + (((syy_b - 2 * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                                   * sxy_b
                        + ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                          * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                          * sxx_b)
                      - (sy_b - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                                * sx_b)
                        * (sy_b - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                                  * sx_b) / n_b) / (n_b - 1)) / n_b),
                 6) AS z_cuped
    FROM s
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013) —
    the adjustment every mature experimentation platform applies: the
    metric (per-user purchase value) is regressed on a pre-experiment
    covariate (per-user view count), and the Welch z is computed on
    the adjusted metric y − θ(x − x̄).  θ is the pooled OLS slope;
    adjusted arm means and variances expand into the same sufficient
    statistics, so nothing per-user survives the aggregation.

    Plan: one groupBy(user_id) to per-user (x, y), one global
    16-counter aggregation of exact power sums (map-side combined),
    and a single-row scalar epilogue.  One shuffle at any scale."""
    ev = _events(spark, sf_dir)
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3", "4", "5", "6", "7"
        ),
        "A",
    ).otherwise("B")
    zero = F.lit(0).cast("decimal(18,2)")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)"),
                ).otherwise(zero)
            ).alias("y"),
        )
        .select(
            arm.alias("arm"),
            F.col("x"),
            F.col("y").cast("decimal(18,2)").alias("y"),
        )
    )
    x, y = F.col("x"), F.col("y")
    is_a, is_b = F.col("arm") == "A", F.col("arm") == "B"
    s = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(is_a, x)).cast("double").alias("sx_a"),
        F.sum(F.when(is_a, y)).cast("double").alias("sy_a"),
        F.sum(F.when(is_a, x * y)).cast("double").alias("sxy_a"),
        F.sum(F.when(is_a, x * x)).cast("double").alias("sxx_a"),
        F.sum(F.when(is_a, y * y)).cast("double").alias("syy_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_b, x)).cast("double").alias("sx_b"),
        F.sum(F.when(is_b, y)).cast("double").alias("sy_b"),
        F.sum(F.when(is_b, x * y)).cast("double").alias("sxy_b"),
        F.sum(F.when(is_b, x * x)).cast("double").alias("sxx_b"),
        F.sum(F.when(is_b, y * y)).cast("double").alias("syy_b"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n

    def _adj_sum(sy_g, sx_g):
        return sy_g - theta * sx_g

    def _mean_adj(sy_g, sx_g, n_g):
        return (sy_g - theta * (sx_g - xbar * n_g)) / n_g

    def _var_term(syy_g, sxy_g, sxx_g, sy_g, sx_g, n_g):
        ss = (
            syy_g
            - 2 * theta * sxy_g
            + theta * theta * sxx_g
        )
        asum = _adj_sum(sy_g, sx_g)
        return ((ss - asum * asum / n_g) / (n_g - 1)) / n_g

    n_a, n_b = F.col("n_a"), F.col("n_b")
    mean_a = _mean_adj(F.col("sy_a"), F.col("sx_a"), n_a)
    mean_b = _mean_adj(F.col("sy_b"), F.col("sx_b"), n_b)
    var_a = _var_term(
        F.col("syy_a"), F.col("sxy_a"), F.col("sxx_a"),
        F.col("sy_a"), F.col("sx_a"), n_a,
    )
    var_b = _var_term(
        F.col("syy_b"), F.col("sxy_b"), F.col("sxx_b"),
        F.col("sy_b"), F.col("sx_b"), n_b,
    )
    return s.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        F.round(theta, 6).alias("theta"),
        F.round(mean_a, 6).alias("mean_adj_a"),
        F.round(mean_b, 6).alias("mean_adj_b"),
        F.round((mean_a - mean_b) / F.sqrt(var_a + var_b), 6).alias(
            "z_cuped"
        ),
    )


@query(
    "events_ks_test",
    # Two-sample Kolmogorov-Smirnov distance between the arms'
    # per-user purchase-value distributions.  EXACT: with c_a/c_b the
    # cumulative arm counts at each distinct metric value, the KS
    # numerator max|c_a*n_b - c_b*n_a| is pure BIGINT arithmetic; the
    # single division happens once, on the final row, rounded at 9 dp.
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS v
        FROM events GROUP BY user_id
    ),
    by_value AS (
        SELECT v,
               SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS a_cnt,
               SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS b_cnt
        FROM per_user GROUP BY v
    ),
    cum AS (
        SELECT SUM(a_cnt) OVER (ORDER BY v) AS c_a,
               SUM(b_cnt) OVER (ORDER BY v) AS c_b,
               (SELECT SUM(a_cnt) FROM by_value) AS n_a,
               (SELECT SUM(b_cnt) FROM by_value) AS n_b
        FROM by_value
    )
    SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           CAST(MAX(ABS(c_a * n_b - c_b * n_a)) AS BIGINT) AS d_num,
           ROUND(CAST(MAX(ABS(c_a * n_b - c_b * n_a)) AS DOUBLE)
                 / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE)),
                 9) AS d_stat
    FROM cum
    """,
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KOLMOGOROV-SMIRNOV test between the A/B arms'
    per-user purchase-value distributions — the distribution-shift
    readout that catches what a mean test (events_ab_test) cannot:
    identical means with different shapes.  D = sup|F_A − F_B| is
    computed EXACTLY: cumulative counts per distinct metric value keep
    the numerator |c_a·n_b − c_b·n_a| in integers; one division at the
    end.

    Plan: groupBy(user_id) → per-user metric, groupBy(metric value) →
    DISTINCT-VALUE table (bounded by metric cardinality, tiny after
    2-dp quantization), one cumulative window over it, one global max.
    Two shuffles, both shrinking; at 100 TB the window runs over the
    value grid, not users."""
    ev = _events(spark, sf_dir)
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3", "4", "5", "6", "7"
        ),
        "A",
    ).otherwise("B")
    zero = F.lit(0).cast("decimal(18,2)")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(zero)
        ).alias("v")
    ).select(arm.alias("arm"), F.col("v").cast("decimal(18,2)").alias("v"))
    by_value = per_user.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("a_cnt"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("b_cnt"),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = by_value.select(
        F.sum("a_cnt").over(wcum).alias("c_a"),
        F.sum("b_cnt").over(wcum).alias("c_b"),
        F.sum("a_cnt").over(wall).alias("n_a"),
        F.sum("b_cnt").over(wall).alias("n_b"),
    )
    d = F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a"))
    return cum.agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.max(d).cast("bigint").alias("d_num"),
        F.round(
            F.max(d).cast("double")
            / (F.max("n_a").cast("double") * F.max("n_b").cast("double")),
            9,
        ).alias("d_stat"),
    )


ACF_LAGS = [1, 7]  # day and week seasonality probes


@query(
    "events_autocorrelation",
    # exact integer sufficient statistics over (day, day+k) count
    # pairs; covariance/variance numerators stay in exact HUGEINT /
    # DECIMAL arithmetic, so the only float ops are one cast each plus
    # mul/sqrt/div — bit-identical across engines with no rounding.
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, CAST(l.lag AS INT) AS lag,
               a.x AS x, b.x AS y
        FROM daily a
        JOIN (VALUES {", ".join(f"({k})" for k in ACF_LAGS)}) l(lag) ON TRUE
        JOIN daily b ON b.event_type = a.event_type
                    AND b.day = a.day + to_days(CAST(l.lag AS INT))
    ),
    s AS (
        SELECT event_type, lag, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / SQRT(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))
               AS acf
    FROM s
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of the daily event-count series per event
    type (k = 1 day, 7 days) — the seasonality/trend probe behind
    anomaly baselines.  Pairs align on the CALENDAR (day, day+k), not
    on row offsets, so missing days never smear lags; days absent from
    the data drop out of the pair set (observed-pairs ACF).

    One shuffle builds the daily grid (map-side combined, so raw
    events never move twice); the lag alignment is a self-join of the
    DAY-sized table with itself — at 100 TB the daily grid is
    |types|x|days| rows, trivially joinable regardless of event
    volume.  Covariance/variance numerators n·Σxy − ΣxΣy are computed
    in EXACT decimal integer arithmetic (counts are integers), so the
    correlation is three IEEE ops on bit-identical inputs — the
    stronger form of the agg_corr_pairs recipe."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    a = daily.select(
        "event_type",
        "day",
        "x",
        F.explode(F.array(*[F.lit(k) for k in ACF_LAGS])).alias("lag"),
    ).alias("a")
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("x").alias("y"),
    ).alias("b")
    pairs = a.join(
        b,
        (F.col("b_type") == F.col("a.event_type"))
        & (
            F.col("b_day")
            == F.expr("a.day + make_interval(0, 0, 0, a.lag, 0, 0, 0)")
        ),
    )
    d0 = "decimal(38,0)"
    x, y = F.col("x").cast(d0), F.col("y").cast(d0)
    s = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast(d0).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "event_type",
        F.col("lag").cast("int"),
        n.cast("bigint").alias("n_pairs"),
        (cov / F.sqrt(vx * vy)).alias("acf"),
    )


@query(
    "events_psi_drift",
    # the ln() terms follow the agg_entropy discipline: exact count
    # ratios into ln on both engines, one pinned expression order,
    # round at 9 dp
    oracle="""
    WITH tagged AS (
        SELECT event_type,
               (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') % 2
                 AS bucket
        FROM events
    ),
    cells AS (
        SELECT event_type, bucket, COUNT(*) AS c
        FROM tagged GROUP BY 1, 2
    ),
    tot AS (
        SELECT bucket, SUM(c) AS t FROM cells GROUP BY 1
    ),
    pq AS (
        SELECT e.event_type,
               CAST(ce.c AS DOUBLE) / CAST(te.t AS DOUBLE) AS p,
               CAST(co.c AS DOUBLE) / CAST(to_.t AS DOUBLE) AS q
        FROM (SELECT DISTINCT event_type FROM cells) e
        JOIN cells ce ON ce.event_type = e.event_type AND ce.bucket = 0
        JOIN cells co ON co.event_type = e.event_type AND co.bucket = 1
        JOIN tot te ON te.bucket = 0
        JOIN tot to_ ON to_.bucket = 1
    )
    SELECT event_type,
           ROUND(p, 9) AS p_even, ROUND(q, 9) AS q_odd,
           ROUND((p - q) * ln(p / q), 9) AS psi_term
    FROM pq
    """,
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the even-epoch-day and
    odd-epoch-day halves of the stream — the standard drift monitor
    for a feature/event distribution (PSI > 0.2 is the classic
    retrain alarm).  The even/odd split is a deterministic temporal
    A/B that needs no anchor-date literal.

    One map-side-combined groupBy produces the |types|x2 cell table;
    totals and the PSI terms are arithmetic on a handful of rows.
    Event types appearing in only one bucket would need the
    standard epsilon-floor; this corpus has none, and the inner join
    makes that precondition explicit rather than silently emitting
    infinities.  At 100 TB the plan is one aggregation of the fact
    table — nothing else scales with volume."""
    e = _events(spark, sf_dir)
    bucket = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 2
    ).alias("bucket")
    cells = (
        e.select("event_type", bucket)
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cells.groupBy("bucket").agg(F.sum("c").alias("t"))
    ce = cells.filter(F.col("bucket") == 0).select(
        "event_type", F.col("c").alias("c_even")
    )
    co = cells.filter(F.col("bucket") == 1).select(
        "event_type", F.col("c").alias("c_odd")
    )
    te = tot.filter(F.col("bucket") == 0).select(F.col("t").alias("t_even"))
    to = tot.filter(F.col("bucket") == 1).select(F.col("t").alias("t_odd"))
    p = F.col("c_even").cast("double") / F.col("t_even").cast("double")
    q = F.col("c_odd").cast("double") / F.col("t_odd").cast("double")
    return (
        ce.join(co, "event_type")
        .crossJoin(F.broadcast(te))
        .crossJoin(F.broadcast(to))
        .select(
            "event_type",
            F.round(p, 9).alias("p_even"),
            F.round(q, 9).alias("q_odd"),
            F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
        )
    )


@query(
    "events_changepoint_cusum",
    # scaled CUSUM S_k = n*prefix_k - k*total is integer-exact, so the
    # argmax day is deterministic; ties break to the earliest day
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, day,
               SUM(x) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS pfx,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
               SUM(x) OVER (PARTITION BY event_type) AS total,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    s AS (
        SELECT event_type, day,
               CAST(n * pfx - k * total AS BIGINT) AS s_scaled
        FROM c
    )
    SELECT event_type, day AS change_day, s_scaled
    FROM s
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY ABS(s_scaled) DESC, day ASC) = 1
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection per event type: the day where the
    scaled CUSUM statistic S_k = n·prefix_k − k·total peaks in
    absolute value (the mean-shift estimator behind monitoring
    alarms).  The scaling clears the mean division, so S_k is EXACT
    integer arithmetic end to end — no float comparison decides the
    argmax, and distance ties break to the earliest day identically
    in both engines.

    Plan: one map-side-combined daily aggregation (the only pass over
    raw events), then windows over the |types|x|days| grid, then a
    per-type argmax via max_by on an exact (|S|, −day) key — no
    second sort, no join.  Per-type day counts bound the window
    partitions, so the plan is volume-independent past the first
    aggregation."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    c = daily.select(
        "event_type",
        "day",
        F.sum("x").over(wcum).alias("pfx"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
        .alias("k"),
        F.sum("x").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    s = c.select(
        "event_type",
        "day",
        (F.col("n") * F.col("pfx") - F.col("k") * F.col("total"))
        .cast("bigint")
        .alias("s_scaled"),
    )
    ed = F.datediff(F.to_date("day"), F.lit("1970-01-01"))
    pick = F.max_by(
        F.struct(F.col("day"), F.col("s_scaled")),
        F.struct(F.abs(F.col("s_scaled")).alias("a"), (-ed).alias("d")),
    )
    return (
        s.groupBy("event_type")
        .agg(pick.alias("best"))
        .select(
            "event_type",
            F.col("best.day").alias("change_day"),
            F.col("best.s_scaled").alias("s_scaled"),
        )
    )


@query(
    "events_forecast_holt",
    # alpha = beta = 1/2 keeps every intermediate a dyadic rational
    # (divides are exact); the denominator doubles twice per step, so
    # after ~20 steps additions do round — but BOTH engines evaluate
    # the same expression tree in the same left-fold order, so every
    # rounding is identical and the fold stays bit-for-bit equal with
    # no output rounding (exactness for short series is pinned against
    # rational arithmetic in tests/test_round4_ops.py).
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               list(CAST(x AS DOUBLE) ORDER BY day) AS xs,
               COUNT(*) AS n_days
        FROM daily GROUP BY event_type
    ),
    fitted AS (
        -- list_reduce has no seed argument, so the seed state rides as
        -- the first element and every x is lifted into a 1-list to
        -- unify the accumulator/element types
        SELECT event_type, n_days,
               list_reduce(
                   list_prepend(CAST([0.0, 0.0, 0.0] AS DOUBLE[]),
                                list_transform(xs, x -> [x])),
                   (acc, xl) -> CASE WHEN acc[3] = 0
                       THEN [xl[1], 0.0, 1.0]
                       ELSE [(xl[1] + acc[1] + acc[2]) / 2,
                             (((xl[1] + acc[1] + acc[2]) / 2) - acc[1]
                              + acc[2]) / 2,
                             acc[3] + 1]
                   END) AS st
        FROM series
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast_next
    FROM fitted
    """,
)
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over the daily
    event-count series per event type (level + trend state, one-step
    forecast) — the baseline forecaster behind capacity planning and
    anomaly thresholds.  alpha = beta = 1/2:
    level' = (x + level + trend)/2, trend' = (level' - level + trend)/2.

    The recursion is inherently sequential, so it runs as a JVM-side
    left-fold (F.aggregate) over each type's day-ordered count array —
    the same in-codegen fold discipline as agg_entropy.  Halving
    coefficients keep divides exact and the fold's expression order is
    pinned identically in both engines, so every rounding (additions
    start rounding once the dyadic denominator passes the mantissa,
    ~20 steps in) happens bit-identically — the cross-engine hash
    proves all 30 recursion steps, not a rounded tail (see oracle
    note; short-series exactness pinned against rational arithmetic
    in tests).  Scale: raw events collapse to the |types|x|days|
    grid in one map-side-combined pass; each fold's state is two
    doubles — a per-series O(days) array, the standard bound for
    sequential smoothers (at 100 TB you shard by series key, which
    this plan already does)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s["x"].cast("double"),
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_days"),
    )
    two = F.lit(2.0)
    st = F.aggregate(
        F.col("xs"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),
        lambda acc, x: F.when(
            acc[2] == 0.0, F.array(x, F.lit(0.0), F.lit(1.0))
        ).otherwise(
            F.array(
                (x + acc[0] + acc[1]) / two,
                (((x + acc[0] + acc[1]) / two) - acc[0] + acc[1]) / two,
                acc[2] + 1.0,
            )
        ),
    )
    return series.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        st[0].alias("level"),
        st[1].alias("trend"),
        (st[0] + st[1]).alias("forecast_next"),
    )


@query(
    "events_bounce_rate",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o
    ),
    sess AS (
      SELECT user_id, session_idx,
             date_trunc('day', MIN(ts)) AS day,
             COUNT(*) AS n_events
      FROM s GROUP BY 1, 2
    )
    SELECT day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 9) AS bounce_rate
    FROM sess GROUP BY day
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions containing exactly one
    event, attributed to the day the session STARTED — the engagement
    metric every web dashboard pairs with DAU.  Sessions come from the
    same exact-microsecond gap-and-island shape as events_sessionize
    (one shuffle keyed by user); sessions then roll up by start day —
    a second aggregation over the SESSION-sized table, never raw
    events.  Counts are exact integers; the rate is one rounded
    divide."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    brk = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess_idx = (
        F.sum(brk)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
    )
    sess = (
        ev.select("user_id", "ts", "event_id", sess_idx.alias("session_idx"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("day"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sess.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.cast("bigint").alias("n_bounces"),
        F.round(
            bounce.cast("double") / F.count(F.lit(1)), 9
        ).alias("bounce_rate"),
    )


@query(
    "events_diff_in_diff",
    # arms via the md5 hash-split discipline; periods via the PSI key's
    # even/odd epoch-day split — all four cell means from exact decimal
    # sums, the DiD estimate is one fixed double expression at 6 dp
    oracle="""
    WITH cell AS (
        SELECT
            CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7')
                 THEN 'A' ELSE 'B' END AS arm,
            (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') % 2
              AS period,
            CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END AS x
        FROM events
    ),
    s AS (
        SELECT arm, period, COUNT(*) AS n,
               CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx
        FROM cell GROUP BY arm, period
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN arm='A' AND period=0 THEN sx/n END) AS a0,
            MAX(CASE WHEN arm='A' AND period=1 THEN sx/n END) AS a1,
            MAX(CASE WHEN arm='B' AND period=0 THEN sx/n END) AS b0,
            MAX(CASE WHEN arm='B' AND period=1 THEN sx/n END) AS b1,
            CAST(SUM(n) AS BIGINT) AS n_events
        FROM s
    )
    SELECT n_events,
           ROUND(a0, 6) AS mean_a_pre, ROUND(a1, 6) AS mean_a_post,
           ROUND(b0, 6) AS mean_b_pre, ROUND(b1, 6) AS mean_b_post,
           ROUND((b1 - b0) - (a1 - a0), 6) AS did_estimate
    FROM wide
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES estimator: treatment effect =
    (B_post − B_pre) − (A_post − A_pre) over per-event purchase value,
    with arms carved by the reproducible md5 hash split (events_ab_test
    discipline) and pre/post periods by the even/odd epoch-day split
    (events_psi_drift discipline) — the quasi-experimental readout for
    rollouts that lack a clean randomized holdout.

    One map-side-combined groupBy to the 2x2 (arm, period) cell table;
    cell sums are exact decimals, the four means and the DiD contrast
    are one fixed double expression rounded at 6 dp.  Nothing after
    the first aggregation scales with event volume."""
    e = _events(spark, sf_dir)
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
            *"01234567"
        ),
        "A",
    ).otherwise("B")
    period = F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 2
    x = F.when(
        F.col("event_type") == "purchase", F.col("value").cast("decimal(18,2)")
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    s = (
        e.select(arm.alias("arm"), period.alias("period"), x.alias("x"))
        .groupBy("arm", "period")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
        .select(
            "arm",
            "period",
            "n",
            (F.col("sx").cast("double") / F.col("n")).alias("m"),
        )
    )

    def cell(a, p):
        return F.max(
            F.when((F.col("arm") == a) & (F.col("period") == p), F.col("m"))
        )

    a0, a1, b0, b1 = cell("A", 0), cell("A", 1), cell("B", 0), cell("B", 1)
    return s.agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.round(a0, 6).alias("mean_a_pre"),
        F.round(a1, 6).alias("mean_a_post"),
        F.round(b0, 6).alias("mean_b_pre"),
        F.round(b1, 6).alias("mean_b_post"),
        F.round((b1 - b0) - (a1 - a0), 6).alias("did_estimate"),
    )


BOOTSTRAP_B = 32  # bootstrap replicas
# Poisson(1) CDF breakpoints scaled to the 48-bit uniform grid and
# truncated at weight 8 (tail mass < 1e-5): replica weight = number of
# breakpoints at or below the draw — an all-INTEGER quantile transform,
# so both engines assign identical weights with no float boundary.
_POIS_T = [
    103548857136060, 207097714272121, 258872142840152, 276130285696162,
    280444821410164, 281307728552965, 281451546410098, 281472091818260,
]
_SQL_POIS = ", ".join(str(t) for t in _POIS_T)


@query(
    "events_bootstrap_ci",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS x
        FROM events GROUP BY user_id
    ),
    draws AS (
        SELECT u.user_id, u.x, b.b,
               CAST('0x' || substr(md5(CAST(u.user_id AS VARCHAR)
                                       || '_' || CAST(b.b AS VARCHAR)),
                                   1, 12) AS BIGINT) AS u48
        FROM per_user u, (SELECT UNNEST(range({BOOTSTRAP_B})) AS b) b
    ),
    weighted AS (
        SELECT b, user_id, x,
               len(list_filter([{_SQL_POIS}], t -> u48 >= t)) AS w
        FROM draws
    ),
    reps AS (
        SELECT b,
               CAST(CAST(SUM(w * x) AS VARCHAR) AS DOUBLE)
                 / SUM(w) AS rep_mean
        FROM weighted GROUP BY b
    ),
    sorted AS (
        SELECT list_sort(list(rep_mean)) AS ms FROM reps
    ),
    point AS (
        SELECT COUNT(*) AS n_users,
               CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mean_x
        FROM per_user
    )
    SELECT p.n_users, ROUND(p.mean_x, 6) AS mean_value,
           ROUND(s.ms[2], 6) AS ci_lo,
           ROUND(s.ms[{BOOTSTRAP_B - 1}], 6) AS ci_hi
    FROM point p, sorted s
    """,
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOTSTRAP confidence interval for mean per-user purchase value
    via the DETERMINISTIC Poisson bootstrap (Chamandy et al. 2012 —
    the one-pass resampling scheme built for map-reduce): each (user,
    replica) pair draws a Poisson(1) weight from 48 md5 bits through
    an all-integer quantile table, replica means are
    weight-normalized, and the CI is the 2nd / 31st of the 32 sorted
    replica means.  Unlike rand()-based bootstraps this is
    reproducible across engines, reruns and cluster sizes — which is
    what makes the CI itself hash-checkable.

    Plan: one groupBy(user) collapses events; the replica explode is
    {B}x the USER-level table (never raw events); one
    map-side-combined groupBy(replica) of exact decimal weighted sums;
    the final sort is over {B} numbers.  At 100 TB the user collapse
    dominates and everything downstream is replica-sized."""
    e = _events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).alias("x")
    )
    per_user = per_user.localCheckpoint()  # two consumers: point + reps
    draws = per_user.select(
        "user_id",
        "x",
        F.explode(F.array(*[F.lit(b) for b in range(BOOTSTRAP_B)])).alias("b"),
    ).withColumn(
        "u48",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("_"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    thresholds = F.array(*[F.lit(t) for t in _POIS_T])
    w = F.size(F.filter(thresholds, lambda t: F.col("u48") >= t))
    reps = (
        draws.withColumn("w", w)
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("x")).cast("double") / F.sum("w")
            ).alias("rep_mean")
        )
    )
    sorted_means = reps.agg(
        F.array_sort(F.collect_list("rep_mean")).alias("ms")
    )
    point = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mean_x"),
    )
    return point.crossJoin(F.broadcast(sorted_means)).select(
        "n_users",
        F.round("mean_x", 6).alias("mean_value"),
        F.round(F.element_at("ms", 2), 6).alias("ci_lo"),
        F.round(F.element_at("ms", BOOTSTRAP_B - 1), 6).alias("ci_hi"),
    )


# two-sided alpha=0.05, power=0.80: (z_{0.975} + z_{0.84})^2, a fixed
# published constant of the standard sample-size formula
_POWER_Z2 = 7.849
_POWER_MDE = 0.05  # minimum detectable effect: 5% relative lift


@query(
    "events_power_analysis",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS x
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx
        FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(sx / n, 6) AS mean_x,
           ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_x,
           CAST(CEIL(2 * {_POWER_Z2} * ((sxx - sx * sx / n) / (n - 1))
                     / (({_POWER_MDE} * sx / n) * ({_POWER_MDE} * sx / n)))
                AS BIGINT) AS n_per_arm
    FROM s
    """,
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test POWER ANALYSIS: users-per-arm needed to detect a
    {mde:.0%} relative lift in mean per-user purchase value at
    alpha=0.05 / power=0.80 — n = 2(z_a+z_b)^2 * sigma^2 / delta^2,
    the sizing every experiment review asks for before launch.
    Variance comes from the same exact decimal power sums as
    events_ab_test, so the only floats are the fixed published z
    constant and three IEEE ops; the ceil is over a value far from
    integer boundaries (pinned by the cross-engine hash).

    Plan: one groupBy(user) collapse, one global 3-counter aggregation,
    scalar epilogue on a single row."""
    e = _events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).alias("x")
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / n) / (n - 1)
    delta = _POWER_MDE * sx / n
    return s.select(
        n.cast("bigint").alias("n_users"),
        F.round(sx / n, 6).alias("mean_x"),
        F.round(var, 6).alias("var_x"),
        F.ceil(2 * _POWER_Z2 * var / (delta * delta))
        .cast("bigint")
        .alias("n_per_arm"),
    )


events_power_analysis.__doc__ = events_power_analysis.__doc__.format(
    mde=_POWER_MDE
)
