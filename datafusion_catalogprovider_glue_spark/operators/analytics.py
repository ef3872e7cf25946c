"""Analytics extensions: as-of join, range join, pivot/unpivot,
order statistics, moment statistics, deterministic sampling.

None of these exist in the reference crate — they extend its delegated
SQL surface (SURVEY.md §2-C scoping note) with operators a time-series
/ feature-engineering workload needs, each built Spark-first:

* as-of join — Spark has no ASOF JOIN operator (DuckDB does, which
  makes the oracle easy).  The scalable implementation is the
  union + window trick: tag both sides, union, one shuffle on the key,
  and a running ``last(value, ignorenulls)`` ordered by (ts, side)
  carries the most recent right-side row onto each left row.  This is
  O(n log n) in the partition with NO range explosion — at 100 TB it
  beats any join-on-inequality plan (which Spark would execute as a
  broadcast nested loop) because it shuffles each row exactly once.
* range join — joining a fact column into literal interval bands.
  The band table is tiny, so the right plan at any scale is a
  broadcast nested-loop join with the band predicate evaluated in
  codegen; Catalyst picks exactly that.
* pivot / unpivot — first-class DataFrame ops in Spark; the oracle
  spells them as conditional aggregation / UNION ALL, which is also
  what Catalyst lowers them to.
* percentiles — exact interpolated percentiles (Catalyst's
  ``percentile``, a single-pass sort-based aggregate).  On the
  integer-valued quantity column the linear interpolation is exact in
  doubles, so values hash-match DuckDB's ``quantile_cont``.
* moment statistics — variance/stddev/correlation computed from EXACT
  decimal power sums (Σx, Σx², Σxy) with one final double expression,
  written with the identical formula text in both engines: the result
  is bit-identical, unlike native ``stddev``/``corr`` whose merge
  order differs per engine/partitioning.  At 100 TB the power sums are
  a single map-side-combined aggregation — same cost as the native
  implementation.
* deterministic sampling — hash-based Bernoulli sampling
  (``md5(key) < threshold``): reproducible across engines, runs, and
  cluster sizes, unlike seed-based ``TABLESAMPLE`` whose output
  depends on partitioning.  This is the sampling you actually want in
  a 100 TB pipeline (stable holdout sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.functions import dsum, sql_dsum
from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_engine_conf(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


@query(
    "join_asof",
    oracle="""
    WITH v AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.purchase_value,
           v.ts AS view_ts, v.view_value
    FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the latest view event
    of the same user at-or-before it (inner semantics — purchases with
    no prior view drop, matching DuckDB ASOF JOIN).

    Implementation: union + running window.  The right side is first
    made unique per (user_id, ts) (MAX(value) — ties at identical
    microsecond timestamps would otherwise make the match
    nondeterministic), then both sides are unioned with a side tag and
    a single window partitioned by user_id, ordered by (ts, side),
    carries the last non-null right-side payload forward onto each
    left row.  side: views sort before purchases at equal ts, so the
    match is inclusive (ts_view <= ts_purchase) like DuckDB's ``>=``.

    One shuffle total (by user_id), no inequality-join explosion —
    the plan that survives 100 TB."""
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            "view_value",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("view_value"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn("matched_value", F.last("view_value", ignorenulls=True).over(w))
        .withColumn(
            "matched_ts",
            F.last(
                F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .filter((F.col("side") == 1) & F.col("matched_value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "purchase_value",
            F.col("matched_ts").alias("view_ts"),
            F.col("matched_value").alias("view_value"),
        )
    )


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------

_BANDS = [("low", 1, 15), ("mid", 15, 35), ("high", 35, 51)]


@query(
    "join_range",
    oracle=f"""
    SELECT b.band, COUNT(*) AS n_items,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM lineitem l
    JOIN (VALUES ('low', 1, 15), ('mid', 15, 35), ('high', 35, 51)) b(band, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: lineitem rows land in literal quantity
    bands.  The band table is 3 rows → Catalyst plans a broadcast
    nested-loop join with the interval predicate in codegen; the fact
    side streams through once, never shuffled.  With a large interval
    table the scale path is binning both sides to an equi-join key
    (floor(qty/width)) — noted here, not needed for literal bands."""
    li = _t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, "band string, lo int, hi int")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(rev, 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# pivot / unpivot
# ---------------------------------------------------------------------------


@query(
    "pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag = 'A') AS VARCHAR) AS DOUBLE) AS "A",
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag = 'N') AS VARCHAR) AS DOUBLE) AS "N",
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag = 'R') AS VARCHAR) AS DOUBLE) AS "R"
    FROM lineitem GROUP BY l_linestatus
    """,
)
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: quantity by linestatus × returnflag.  Pivot values are
    given explicitly — with them, Spark skips the extra distinct-values
    job and plans ONE grouped aggregation with conditional aggregates
    (exactly the oracle's FILTER form), map-side combined."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(dsum(F.col("l_quantity"), 2))
    )


@query(
    "unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
    """,
)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): part attributes to long form.  Spark's
    ``unpivot`` expands each row to k rows in the scan projection —
    no shuffle at all; the oracle's UNION ALL spelling would scan the
    table twice, the DataFrame op scans once."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return p.unpivot(["p_partkey"], ["p_size", "p_retailprice"], "attr", "val")


# ---------------------------------------------------------------------------
# order statistics / moment statistics
# ---------------------------------------------------------------------------


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           unnest([0.25, 0.5, 0.75]) AS q,
           unnest(quantile_cont(l_quantity, [0.25, 0.5, 0.75])) AS q_value,
           median(l_quantity) AS med
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per group (Catalyst
    ``percentile`` — single-pass, sort-based), emitted as one
    (group, q, q_value) row per requested quantile — scalar columns
    only, never an array result (DuckDB twin: zipped ``unnest`` of the
    q-list and the ``quantile_cont`` list).  l_quantity is
    integer-valued so the interpolation arithmetic (lower + frac *
    (upper - lower)) is exact in doubles → hash-matches DuckDB's
    quantile_cont.  At 100 TB switch to approx_percentile (t-digest,
    mergeable sketch) — kept exact here because the oracle is exact."""
    li = _t(spark, sf_dir, "lineitem")
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    agg = li.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_quantity"), F.lit([0.25, 0.5, 0.75])).alias("qarr"),
        F.median(F.col("l_quantity")).alias("med"),
    )
    return agg.select(
        "l_returnflag", F.posexplode("qarr").alias("pos", "q_value"), "med"
    ).select(
        "l_returnflag",
        F.element_at(qs, F.col("pos") + 1).alias("q"),
        "q_value",
        "med",
    )


@query(
    "agg_moment_stats",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             AS corr_qty_discount
    FROM s
    """,
)
def agg_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / correlation from exact decimal power
    sums (Σx, Σx², Σy, Σy², Σxy) + one double-precision formula.
    Native ``stddev``/``corr`` merge partial moments in partition
    order — nondeterministic across engines AND across cluster sizes;
    power sums in decimal are exact under any merge order, and the
    identical final expression text makes both engines round the same
    way.  Same single-aggregation cost."""
    li = _t(spark, sf_dir, "lineitem")
    q, d = F.col("l_quantity"), F.col("l_discount")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(q, 2).alias("sx"),
        dsum(q * q, 2).alias("sxx"),
        dsum(d, 4).alias("sy"),
        dsum(d * d, 4).alias("syy"),
        dsum(q * d, 4).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return agg.select(
        "l_returnflag",
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_discount"),
    )


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


@query(
    "sample_hash",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% Bernoulli sample keyed on md5(orderkey).
    Unlike TABLESAMPLE / ``df.sample`` (partitioning-dependent even
    with a seed), the hash predicate selects the SAME rows on any
    engine, any cluster size, any run — the property a reproducible
    holdout/eval split needs.  Evaluates in the scan's codegen stage;
    no shuffle."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


# ---------------------------------------------------------------------------
# distribution window functions / collection aggregates
# ---------------------------------------------------------------------------


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ntile(4)      OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()   OVER w AS cume,
           nth_value(o_totalprice, 2)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    / nth_value.  Ordered by the unique o_orderkey so ranks are
    deterministic; nth_value gets an explicit full-partition frame
    (engine defaults differ).  percent_rank and cume_dist are exact
    rationals computed identically in both engines.  One shuffle on
    o_custkey; at 100 TB the per-customer partitions are tiny and
    AQE-coalesced."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value(F.col("o_totalprice"), 2).over(wf).alias("second_price"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_names,
           array_to_string(list_sort(list(DISTINCT
               CAST(s_acctbal > 0 AS VARCHAR))), ',') AS bal_signs_csv,
           string_agg(s_name, ',' ORDER BY s_name) AS names_csv
    FROM supplier GROUP BY s_nationkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: list / distinct-list / string_agg.
    Spark's collect_list order is partition-arrival order
    (nondeterministic) — array_sort after collection restores a stable
    result, which is also the only sane contract at 100 TB where
    partitioning is dynamic.  The collected lists are emitted as
    sorted CSV strings (scalar columns only — array-typed outputs are
    not hashable by the correctness gate).  State per group is the
    collected list: fine for bounded groups (suppliers per nation),
    the wrong tool for unbounded ones — that's what the sketch
    aggregates are for."""
    s = _t(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_names"),
        F.array_join(
            F.array_sort(F.collect_set((F.col("s_acctbal") > 0).cast("string"))), ","
        ).alias("bal_signs_csv"),
        F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("names_csv"),
    )


@query(
    "agg_approx_percentile",
    # TOLERANCE oracle: the GK-sketch value is engine-specific, but
    # its rank-error contract is not.  The Spark side brackets the
    # sketch value between the EXACT quantiles at q ± 2ε (ε =
    # 1/accuracy — twice the guaranteed rank error) and emits the
    # exact quantile plus the bracket boolean; DuckDB recomputes the
    # exact quantile and literal TRUE — the hash covers the envelope.
    oracle="""
    SELECT l_returnflag,
           unnest([0.25, 0.5, 0.75]) AS q,
           unnest(quantile_cont(l_quantity, [0.25, 0.5, 0.75])) AS exact_value,
           TRUE AS within_rank_eps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB swap agg_percentile's docstring promises: quantiles
    from a bounded-memory mergeable sketch (Catalyst's
    ``approx_percentile``, Greenwald-Khanna family) instead of the
    exact sort-based ``percentile``.  The exact form buffers each
    group's values; the sketch holds O(1/accuracy) state per group
    regardless of row count and merges associatively across
    partitions — the only viable shape when one group spans billions
    of rows.  The production operator is the sketch alone; the exact
    percentiles here anchor the value-hashed accuracy envelope
    (sketch value between the exact quantiles at q ± 2/accuracy),
    upgrading the old rows-only check."""
    li = _t(spark, sf_dir, "lineitem")
    qs, eps = [0.25, 0.5, 0.75], 2.0 / 1000
    # one array-percentile aggregate for all nine exact anchors, not
    # three: each scalar/array F.percentile agg buffers and sorts the
    # full per-group value list separately — three value-list copies
    # per partial-agg buffer, three sorts, triple shuffle payload
    # (optimization r10, guide §1.2 per-task work / §2.3).  Same
    # percentile_cont semantics, hash-identical result.
    all_qs = qs + [q - eps for q in qs] + [q + eps for q in qs]
    agg = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            F.col("l_quantity"), F.lit(qs), F.lit(1000)
        ).alias("approx"),
        F.percentile(F.col("l_quantity"), F.lit(all_qs)).alias("pall"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        "l_returnflag", "approx", "n_rows",
        F.slice("pall", 1, len(qs)).alias("exact"),
        F.slice("pall", len(qs) + 1, len(qs)).alias("lo"),
        F.slice("pall", 2 * len(qs) + 1, len(qs)).alias("hi"),
    )
    z = F.arrays_zip("approx", "exact", "lo", "hi")
    return agg.select(
        "l_returnflag", F.posexplode(z).alias("pos", "v"), "n_rows"
    ).select(
        "l_returnflag",
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("pos") + 1).alias("q"),
        F.col("v.exact").alias("exact_value"),
        (
            (F.col("v.approx") >= F.col("v.lo"))
            & (F.col("v.approx") <= F.col("v.hi"))
        ).alias("within_rank_eps"),
        "n_rows",
    )


@query(
    "join_salted",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_lines,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit key salting — the manual fix for join skew that AQE's
    runtime splitting (pinned in tests/test_plans.py) automates.  The
    technique: the build side is replicated once per salt value with
    an explicit salt column; the probe side computes a deterministic
    per-row salt from non-key columns; the join key becomes
    (key, salt), spreading any hot key over SALT shuffle partitions.
    The oracle is the PLAIN join — hash-matching it proves salting is
    result-preserving.  Use when one key holds >~1 partition's worth
    of rows and the build side is too big to broadcast; replication
    multiplies build-side shuffle volume by SALT, so size it to the
    skew, not higher.  At 100 TB this is the difference between one
    straggler task holding the stage for hours and SALT even tasks."""
    SALT = 8
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salts = spark.range(SALT).select(F.col("id").cast("int").alias("salt"))
    o_salted = o.crossJoin(F.broadcast(salts))
    li_salted = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT)).cast("int")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li_salted.join(
            o_salted,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li_salted.salt == o_salted.salt),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum(rev, 4).alias("revenue"))
    )


@query(
    "agg_hll_partitioned_merge",
    # TOLERANCE oracle (the agg_approx_distinct pattern): the sketch
    # bytes and the estimate are engine-specific, but the accuracy
    # contract is not.  Spark emits the EXACT per-day and global
    # distinct counts plus booleans asserting the sketch estimates
    # landed within 8% (~5x the lgConfigK=12 rsd of 1.6% — a sigma
    # multiple wide enough that the cross-engine gate cannot flake);
    # DuckDB emits the same exact counts and literal TRUE.  The
    # tighter 5% empirical bound on this data stays pinned in
    # tests/test_extensions.py::test_hll_partitioned_merge_accuracy.
    oracle="""
    WITH d AS (
        SELECT date_trunc('day', ts) AS day,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS exact_daily_users
        FROM events GROUP BY 1
    ),
    t AS (SELECT COUNT(DISTINCT user_id) AS exact_total_users FROM events)
    SELECT day, n_events, exact_daily_users,
           TRUE AS daily_within_8pct,
           exact_total_users,
           TRUE AS total_within_8pct
    FROM d CROSS JOIN t
    """,
)
def agg_hll_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch architecture, end-to-end: per-day HLL sketches
    of the distinct-user set (``hll_sketch_agg``), then a sketch UNION
    (``hll_union_agg``) produces the global distinct estimate without
    ever re-touching the rows.  This two-level shape is the 100 TB
    pattern approx_count_distinct hides inside one aggregate: daily
    sketches are tiny (≤ ~1.5 KB at lgConfigK=12), so incremental
    ingestion keeps one sketch per partition-day and any rollup
    (7-day, monthly, all-time) is a byte-merge, not a scan.  The
    production operator is the sketch pipeline alone; the exact
    countDistincts here are the oracle anchors that turn the old
    rows-only check into a value-hashed accuracy envelope."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.hll_sketch_agg("user_id").alias("sketch"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("exact_daily_users"),
        )
    )
    per_day = daily.select(
        "day",
        "n_events",
        "exact_daily_users",
        (
            F.abs(
                F.hll_sketch_estimate("sketch") - F.col("exact_daily_users")
            )
            <= 0.08 * F.col("exact_daily_users")
        ).alias("daily_within_8pct"),
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("total_est")
    ).crossJoin(
        F.broadcast(
            ev.agg(F.countDistinct("user_id").alias("exact_total_users"))
        )
    ).select(
        "exact_total_users",
        (
            F.abs(F.col("total_est") - F.col("exact_total_users"))
            <= 0.08 * F.col("exact_total_users")
        ).alias("total_within_8pct"),
    )
    return per_day.crossJoin(F.broadcast(total)).orderBy("day")


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
               ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3','4','5','6','7')
          END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the majority stratum (en) keeps
    ~25% while every minority language keeps ~50% — the mixture
    rebalancing step of a training-data pipeline (downsample the
    dominant source, preserve the tails), with the same hash-keyed
    reproducibility as sample_hash: identical rows selected on any
    engine, partitioning, or run.  Evaluates in the scan's codegen
    stage; no shuffle, no RNG state."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    keep = F.when(
        F.col("lang") == "en", bucket.isin("0", "1", "2", "3")
    ).otherwise(bucket.isin("0", "1", "2", "3", "4", "5", "6", "7"))
    return d.filter(keep).select("doc_id", "lang", "n_chars")


CMS_EPS = 0.001  # ±0.1% of stream length per point estimate
CMS_CONF = 0.99
CMS_SEED = 42
CMS_PROBE_KEYS = list(range(1, 21))


@query(
    "agg_count_min_sketch",
    # TOLERANCE oracle (the agg_approx_distinct pattern): the CMS
    # byte layout and its estimates are engine-specific, but the
    # Cormode-Muthukrishnan contract is not.  Spark emits, per probe
    # key, the EXACT count plus two booleans: est >= exact (the HARD
    # one-sided guarantee — holds for every seed) and est <= exact +
    # 2·eps·N (double the w.p.-conf bound, so a future Spark hash-seed
    # change cannot flake the cross-engine gate); DuckDB emits the
    # same exact counts and literal TRUE.  The tight eps·N bound on
    # this data stays pinned in test_count_min_sketch_error_bound.
    oracle=f"""
    WITH probes AS (
        SELECT UNNEST(range(1, {max(CMS_PROBE_KEYS) + 1})) AS o_custkey
    ),
    exact AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders
        WHERE o_custkey BETWEEN 1 AND {max(CMS_PROBE_KEYS)}
        GROUP BY o_custkey
    )
    SELECT CAST(p.o_custkey AS BIGINT) AS o_custkey,
           CAST(COALESCE(e.n, 0) AS BIGINT) AS exact_orders,
           TRUE AS ge_exact,
           TRUE AS within_2eps
    FROM probes p LEFT JOIN exact e USING (o_custkey)
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch point-frequency estimates (Cormode-Muthukrishnan):
    how often does each probe customer appear in orders, answered from a
    fixed-size mergeable sketch instead of a full groupBy.

    The sketch is built distributed (map-side partial sketches, one
    byte-matrix merge per partition tree level) and is O(w·d) =
    O(e/eps · ln(1/conf)) — a few KB regardless of stream length, the
    state a streaming frequency monitor keeps per window at 100 TB.
    Only the probe results (20 rows) ever reach the driver... plus the
    sketch itself, which IS driver-sized by construction.  Estimates
    are deterministic for a fixed seed; the exact per-key counts here
    are the oracle anchors turning the old rows-only check into a
    value-hashed error envelope (true <= est <= true + 2·eps·N)."""
    apply_engine_conf(spark)
    o = _t(spark, sf_dir, "orders")
    agg = o.agg(
        F.expr(
            f"count_min_sketch(o_custkey, {CMS_EPS}d, {CMS_CONF}d, {CMS_SEED})"
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    blob, n_orders = agg["s"], agg["n"]
    jvm = spark._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )
    est = {
        int(k): int(sketch.estimateCount(jvm.java.lang.Long.valueOf(k)))
        for k in CMS_PROBE_KEYS
    }
    probes = spark.createDataFrame(
        [(k,) for k in CMS_PROBE_KEYS], "o_custkey bigint"
    )
    exact = (
        o.filter(F.col("o_custkey").isin(CMS_PROBE_KEYS))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    est_map = F.create_map(
        *[F.lit(x) for k in CMS_PROBE_KEYS for x in (k, est[k])]
    )
    bound = 2.0 * CMS_EPS * n_orders
    return (
        probes.join(exact, "o_custkey", "left")
        .select(
            "o_custkey",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("exact_orders"),
            (
                F.element_at(est_map, F.col("o_custkey"))
                >= F.coalesce(F.col("n"), F.lit(0))
            ).alias("ge_exact"),
            (
                F.element_at(est_map, F.col("o_custkey"))
                <= F.coalesce(F.col("n"), F.lit(0)) + F.lit(bound)
            ).alias("within_2eps"),
        )
    )


@query(
    "customer_rfm",
    oracle="""
    WITH base AS (
        SELECT o_custkey,
               datediff('day', MAX(CAST(o_orderdate AS TIMESTAMP)),
                        (SELECT MAX(CAST(o_orderdate AS TIMESTAMP)) FROM orders))
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_bucket,
           ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_bucket,
           ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_bucket
    FROM base
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency / frequency / monetary quartiles per
    customer, the composite every CRM pipeline runs.  One fact pass
    builds the per-customer base (map-side combined; recency anchors
    on the corpus max date via a broadcast scalar, not ``now()``,
    for reproducibility), then three global ``ntile(4)`` windows
    bucket it, each ordered with the unique custkey tie-break that
    makes quartile edges engine-deterministic.

    Scale note: a global ntile is a single-partition window over
    |customers| rows — fine to ~10⁷, and the honest swap past that
    is approx_percentile cut points (the mergeable-sketch path
    pinned by agg_approx_percentile) joined back as bucket
    boundaries; this key pins the exact-quartile semantics."""
    o = _t(spark, sf_dir, "orders")
    max_date = o.agg(F.max("o_orderdate").alias("anchor"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dsum(F.col("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(max_date))
        .select(
            "o_custkey",
            F.datediff(F.col("anchor"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from pyspark.sql.window import Window

    return base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(Window.orderBy("recency_days", "o_custkey")).alias("r_bucket"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .alias("f_bucket"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
        .alias("m_bucket"),
    )


HIST_WIDTH = 25000.0


@query(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / {HIST_WIDTH}) AS BIGINT) AS bucket,
           CAST(FLOOR(o_totalprice / {HIST_WIDTH}) AS BIGINT) * {HIST_WIDTH}
               AS bucket_lo,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               AS sum_price
    FROM orders GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value — the profiling aggregate
    behind every distribution dashboard.  The bucket id is
    ``floor(x / width)`` (one double divide + floor, identical in any
    engine — no half-way rounding exists for floor), so histogram
    cells are engine-exact and the whole op is a single
    map-side-combined aggregation with O(buckets) output.  At 100 TB
    this is the cheap first look that decides where Z-ordering,
    skew salting, or quantile sketches are worth pointing."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / HIST_WIDTH).cast("bigint")
    return (
        o.groupBy(
            bucket.alias("bucket"),
            (bucket * HIST_WIDTH).alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


_BIN_W = 10  # quantity-domain bin width for the binned range join


@query(
    "join_range_binned",
    oracle=f"""
    SELECT b.band, COUNT(*) AS n_items,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM lineitem l
    JOIN (VALUES ('low', 1, 15), ('mid', 15, 35), ('high', 35, 51)) b(band, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`join_range`'s documented 100 TB swap, materialized: the
    interval join executed as a BIN-GRID EQUI-JOIN.  Each interval
    [lo, hi) is exploded to the bins it overlaps (floor(lo/W) ..
    floor((hi-1)/W)); each fact row computes its single bin; the join
    key becomes the bin (hash join — shuffle- or broadcast-able, AQE
    skew-splittable) with the exact interval predicate kept as the
    residual filter.  A nested-loop join dies at a million intervals;
    the grid join's fan-out is bounded by interval_length/W + 1 per
    interval and ONE bin per fact row.  The oracle is the PLAIN
    interval join — the hash match proves binning is result-preserving
    (same guarantee style as `join_salted` vs the plain join).
    """
    li = _t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, "band string, lo int, hi int")
    binned_bands = bands.select(
        "band",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BIN_W),
                F.floor((F.col("hi") - 1) / _BIN_W),
            )
        ).alias("bin"),
    )
    fact = li.withColumn("bin", F.floor(F.col("l_quantity") / _BIN_W))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        fact.join(F.broadcast(binned_bands), "bin")
        .filter(
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi"))
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(rev, 4).alias("revenue"))
    )


@query(
    "agg_linear_regression",
    # Component sums run on the exact decimal grid (the moment-stats
    # technique: 2-dp money and quantity values scale to integers, so
    # sums are exact); the slope/intercept/r² arithmetic then happens
    # in doubles converted from those exact components in an IDENTICAL
    # expression tree on both engines — bit-identical without any
    # output rounding.
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)) AS slope,
           (sy - (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))) * sx) / n
             AS intercept,
           (((n * sxy) - (sx * sy)) * ((n * sxy) - (sx * sy)))
             / (((n * sxx) - (sx * sx)) * ((n * syy) - (sy * sy))) AS r2
    FROM s
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (price ~ quantity): slope,
    intercept, r² from the five component sums — the REGR_SLOPE /
    REGR_INTERCEPT / REGR_R2 surface, built deterministic instead of
    delegating to the engines' float-order-dependent builtins.

    Component sums are exact (decimal grid — 2-dp inputs scale to
    integers; map-side combinable, one shuffle of 5 numbers per
    group), and the closed-form arithmetic happens in doubles derived
    from those exact sums with the same expression shape the oracle
    uses.  This is the 100 TB regression recipe: sufficient statistics
    aggregate; raw points never move."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = (n * sxy) - (sx * sy)
    var_n = (n * sxx) - (sx * sx)
    slope = cov_n / var_n
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        slope.alias("slope"),
        ((sy - (slope * sx)) / n).alias("intercept"),
        ((cov_n * cov_n) / (var_n * ((n * syy) - (sy * sy)))).alias("r2"),
    )


_WQ_QS = (0.5, 0.9)


@query(
    "agg_weighted_percentile",
    # Weighted lower-quantile definition: the smallest value whose
    # cumulative weight reaches q * total_weight.  Everything is
    # integer arithmetic (weights are word counts) except the final
    # q * tot product, computed identically on both engines.
    oracle=f"""
    WITH d AS (
      SELECT source, n_chars,
             len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS wt
      FROM documents
    ), cum AS (
      SELECT source, n_chars, wt,
             SUM(wt) OVER (PARTITION BY source ORDER BY n_chars, wt
                           ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY source) AS tot
      FROM d
    )
    SELECT source, q, MIN(n_chars) AS value
    FROM cum, (SELECT UNNEST([{", ".join(str(q) for q in _WQ_QS)}]) AS q)
    WHERE cw >= q * tot
    GROUP BY source, q
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-WEIGHTED percentiles of document length per source — the
    curation statistic that answers "where does the p90 of my TOKENS
    sit", which the unweighted quantile misrepresents whenever long
    docs carry most of the mass (they always do).

    Lower-quantile definition: smallest value whose running weight
    reaches q·total.  One shuffle on the group key; the cumulative
    window and the threshold filter run in codegen; quantiles fan out
    from a 2-element literal array, so the plan is one window pass
    regardless of how many quantiles are requested.  At 100 TB the
    swap is a fixed-width weighted histogram (agg_histogram's shape)
    — exact sort-based kept here because the oracle is exact."""
    d = _t(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("wt"),
    )
    from pyspark.sql.window import Window

    wc = (
        Window.partitionBy("source")
        .orderBy("n_chars", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt_tot = Window.partitionBy("source")
    cum = d.select(
        "source",
        "n_chars",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt_tot).alias("tot"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in _WQ_QS])).alias("q")
    return (
        cum.select("source", "n_chars", "cw", "tot", qs)
        .filter(F.col("cw") >= F.col("q") * F.col("tot"))
        .groupBy("source", "q")
        .agg(F.min("n_chars").alias("value"))
    )


@query(
    "agg_pmi_association",
    # Per-cell POINTWISE mutual information over exact integer
    # counts, one row per contingency cell — no cross-cell float
    # summation.  ln() is not correctly-rounded in either engine
    # (JVM Math.log vs libm differ by 1 ulp on some inputs), so the
    # value is rounded to 9 dp, far above the ulp and far below any
    # analytical use of PMI.
    oracle="""
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS n_xy FROM documents GROUP BY 1, 2
    ), margins AS (
      SELECT c.lang, c.source, c.n_xy,
             SUM(c.n_xy) OVER (PARTITION BY c.lang) AS n_x,
             SUM(c.n_xy) OVER (PARTITION BY c.source) AS n_y,
             SUM(c.n_xy) OVER () AS n
      FROM cells c
    )
    SELECT lang, source, CAST(n_xy AS BIGINT) AS n_xy,
           ROUND(ln((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE))
                    / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 9) AS pmi
    FROM margins
    """,
)
def agg_pmi_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between two categorical columns
    (lang × source) — the association measure behind collocation
    mining and contamination forensics (is a source over-represented
    in a language?).  Cells and margins come from ONE aggregation plus
    three windows over the tiny cell table (|langs|×|sources| rows);
    the corpus contributes exactly one groupBy.  Per-cell PMI keeps
    the float work order-free: ln of a ratio of exact counts,
    bit-identical cross-engine."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_xy"))
    m = cells.select(
        "lang",
        "source",
        "n_xy",
        F.sum("n_xy").over(Window.partitionBy("lang")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("source")).alias("n_y"),
        F.sum("n_xy").over(
            Window.partitionBy()
        ).alias("n"),
    )
    pmi = F.round(
        F.log(
            (F.col("n_xy").cast("double") * F.col("n").cast("double"))
            / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
        ),
        9,
    )
    return m.select(
        "lang", "source", F.col("n_xy").cast("bigint").alias("n_xy"),
        pmi.alias("pmi"),
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH v AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.purchase_value,
           v.ts AS view_ts, v.view_value
    FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — each purchase matched to the EARLIEST view
    at-or-after it (the "next maintenance event" / "next quote after
    the order" direction; DuckDB: ``ASOF JOIN ... ON p.ts <= v.ts``).
    Same union + running-window plan as the backward join_asof, with
    the scan direction reversed: order DESCENDING by ts and carry the
    last right-side row forward — which, read against event time, is
    the nearest FUTURE view.  Within equal ts the secondary key is
    side ASCENDING, so the view (side 0) enters the scan before the
    purchase (side 1) and the purchase's running frame SEES the
    equal-ts view — the inclusive ``<=`` semantics of DuckDB's ASOF.
    One user_id shuffle, no inequality-join explosion — identical
    scale behavior to the backward form."""
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            "view_value",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("view_value"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn(
            "matched_value", F.last("view_value", ignorenulls=True).over(w)
        )
        .withColumn(
            "matched_ts",
            F.last(
                F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .filter((F.col("side") == 1) & F.col("matched_value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "purchase_value",
            F.col("matched_ts").alias("view_ts"),
            F.col("matched_value").alias("view_value"),
        )
    )


@query(
    "join_scd2_point_in_time",
    # SCD2 dim fixture derived deterministically from customer: version
    # 1 (original acctbal) valid before 1996-01-01, version 2 (acctbal
    # + 1000) valid from it on.  Facts join the version whose validity
    # covers the order date.
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey, c_acctbal AS acctbal,
             TIMESTAMP '1970-01-01' AS valid_from,
             TIMESTAMP '1996-01-01' AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, c_acctbal + 1000,
             TIMESTAMP '1996-01-01', TIMESTAMP '9999-01-01'
      FROM customer
    )
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum("d.acctbal", 2)} AS sum_acctbal_at_order
    FROM orders o
    JOIN dim d ON o.o_custkey = d.c_custkey
              AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
              AND CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to
    GROUP BY o.o_orderpriority
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLOWLY-CHANGING-DIMENSION (type 2) point-in-time join: each
    fact row joins the dimension VERSION that was valid at fact time —
    the correctness backbone of every warehouse with mutable
    dimensions (and of feature stores: this is the point-in-time
    feature join that prevents label leakage).

    The oracle is the textbook BETWEEN-validity range join.  The Spark
    plan avoids the inequality join entirely: dimension versions and
    facts union into ONE stream keyed by c_custkey, ordered by
    (effective_ts, side), and a carry-forward window attaches the
    latest dimension version at-or-before each fact — the join_asof
    machinery applied per entity, one shuffle, no range explosion.
    At 100 TB a BETWEEN join on a billion-row dim is a disaster; this
    shape is the standard fix."""
    from pyspark.sql.window import Window

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    v1 = c.select(
        F.col("c_custkey").alias("key"),
        F.lit("1970-01-01").cast("timestamp").alias("ts"),
        F.lit(0).alias("side"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    v2 = c.select(
        F.col("c_custkey").alias("key"),
        F.lit("1996-01-01").cast("timestamp").alias("ts"),
        F.lit(0).alias("side"),
        (F.col("c_acctbal") + 1000).alias("acctbal"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.lit(1).alias("side"),
        F.lit(None).cast("double").alias("acctbal"),
        "o_orderpriority",
    )
    w = (
        Window.partitionBy("key")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        v1.unionByName(v2)
        .unionByName(o)
        .withColumn(
            "dim_acctbal", F.last("acctbal", ignorenulls=True).over(w)
        )
        .filter(F.col("side") == 1)
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("dim_acctbal"), 2).alias("sum_acctbal_at_order"),
    )


@query(
    "agg_mad",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, median(l_quantity) AS med
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, MAX(m.med) AS med,
           median(abs(l.l_quantity - m.med)) AS mad,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN med m USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN ABSOLUTE DEVIATION per group — the robust dispersion
    measure (outlier-resistant where stddev is not; the scale estimate
    behind robust z-scores).  Two exact median passes: group medians
    first (tiny result, broadcast back onto the fact scan), then the
    median of absolute deviations.  Integer-valued quantities keep
    both interpolations exact in doubles, so values hash-match
    DuckDB's median.  At 100 TB each pass is one sort-based aggregate;
    the approx_percentile sketch is the documented swap
    (agg_approx_percentile's tolerance pattern applies verbatim)."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("med").alias("med"),
            F.median(F.abs(F.col("l_quantity") - F.col("med"))).alias("mad"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH v AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.purchase_value,
           b.view_ts, b.view_value
    FROM p CROSS JOIN LATERAL (
        SELECT v.ts AS view_ts, v.view_value
        FROM v WHERE v.user_id = p.user_id
        ORDER BY ABS(epoch_us(v.ts) - epoch_us(p.ts)) ASC, v.ts ASC
        LIMIT 1
    ) b
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — each purchase matched to the view CLOSEST
    in time, in either direction (ties in distance go to the EARLIER
    view), completing the asof family next to the backward and
    forward forms.  The oracle is the obvious LATERAL
    order-by-absolute-distance; the Spark plan never builds that
    quadratic candidate set: the nearest view is necessarily either
    the latest view at-or-before the purchase or the earliest view
    at-or-after it, so TWO carry-forward window scans over one
    user-keyed union stream (the backward machinery + its reversed
    twin) produce both candidates and a row-local comparison on exact
    epoch-microsecond distances picks the winner.  Two sorts of one
    shuffle, no inequality join — the same scale shape as join_asof.
    """
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            "view_value",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("view_value"),
    )
    from pyspark.sql.window import Window

    u = views.unionByName(purchases)
    # backward scan: ts ASC, views first at ties -> inclusive <=
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward scan: ts DESC, views first at ties -> inclusive >=
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_ts_expr = F.when(F.col("side") == 0, F.col("ts"))
    cand = (
        u.withColumn("b_value", F.last("view_value", ignorenulls=True).over(wb))
        .withColumn("b_ts", F.last(view_ts_expr, ignorenulls=True).over(wb))
        .withColumn("f_value", F.last("view_value", ignorenulls=True).over(wf))
        .withColumn("f_ts", F.last(view_ts_expr, ignorenulls=True).over(wf))
        .filter(F.col("side") == 1)
    )
    p_us = F.unix_micros(F.col("ts"))
    b_diff = p_us - F.unix_micros(F.col("b_ts"))
    f_diff = F.unix_micros(F.col("f_ts")) - p_us
    pick_back = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (b_diff <= f_diff)
    )
    return (
        cand.withColumn(
            "view_ts", F.when(pick_back, F.col("b_ts")).otherwise(F.col("f_ts"))
        )
        .withColumn(
            "view_value",
            F.when(pick_back, F.col("b_value")).otherwise(F.col("f_value")),
        )
        .filter(F.col("view_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "purchase_value",
            "view_ts",
            "view_value",
        )
    )


@query(
    "agg_corr_pairs",
    # Same determinism recipe as agg_linear_regression: component sums
    # on the exact decimal grid, then one identical double expression
    # tree (sqrt is IEEE correctly-rounded in both engines), so the
    # correlations agree bit-for-bit with no output rounding.
    oracle="""
    WITH s AS (
      SELECT l_linestatus,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sq,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sp,
             CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sd,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqq,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS spp,
             CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sdd,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqp,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqd,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS spd
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus, CAST(n AS BIGINT) AS n_rows,
           ((n * sqp) - (sq * sp))
             / SQRT(((n * sqq) - (sq * sq)) * ((n * spp) - (sp * sp)))
               AS corr_qty_price,
           ((n * sqd) - (sq * sd))
             / SQRT(((n * sqq) - (sq * sq)) * ((n * sdd) - (sd * sd)))
               AS corr_qty_disc,
           ((n * spd) - (sp * sd))
             / SQRT(((n * spp) - (sp * sp)) * ((n * sdd) - (sd * sd)))
               AS corr_price_disc
    FROM s
    """,
)
def agg_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (quantity, price, discount)
    per line status — the CORR() surface, built from exact sufficient
    statistics instead of the engines' float-order-dependent builtin.

    One pass, one shuffle of ten numbers per group (map-side
    combined); all cross-products are decimal×decimal (exact, widened
    precision), so at 100 TB the raw fact rows never move and the
    result is independent of partitioning, task order, and cluster
    size — the property the builtin CORR gives up."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    s = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(d).cast("double").alias("sd"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(p * p).cast("double").alias("spp"),
        F.sum(d * d).cast("double").alias("sdd"),
        F.sum(q * p).cast("double").alias("sqp"),
        F.sum(q * d).cast("double").alias("sqd"),
        F.sum(p * d).cast("double").alias("spd"),
    )
    n = F.col("n")

    def corr(sx, sy, sxy, sxx, syy):
        return ((n * sxy) - (sx * sy)) / F.sqrt(
            ((n * sxx) - (sx * sx)) * ((n * syy) - (sy * sy))
        )

    sq, sp, sd = F.col("sq"), F.col("sp"), F.col("sd")
    sqq, spp, sdd = F.col("sqq"), F.col("spp"), F.col("sdd")
    sqp, sqd, spd = F.col("sqp"), F.col("sqd"), F.col("spd")
    return s.select(
        "l_linestatus",
        n.cast("bigint").alias("n_rows"),
        corr(sq, sp, sqp, sqq, spp).alias("corr_qty_price"),
        corr(sq, sd, sqd, sqq, sdd).alias("corr_qty_disc"),
        corr(sp, sd, spd, spp, sdd).alias("corr_price_disc"),
    )


@query(
    "agg_skyline",
    # Frontier construction, not dominance anti-join: per distinct
    # price keep the max size, then a running max over strictly
    # cheaper prices decides survival.  tests/test_extensions.py pins
    # equivalence to the quadratic NOT-EXISTS dominance definition.
    oracle="""
    WITH best AS (
        SELECT p_retailprice, MAX(p_size) AS best_size
        FROM part GROUP BY p_retailprice
    ),
    frontier AS (
        SELECT p_retailprice, best_size,
               MAX(best_size) OVER (ORDER BY p_retailprice
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) AS prev_best
        FROM best
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    JOIN frontier f
      ON p.p_retailprice = f.p_retailprice AND p.p_size = f.best_size
    WHERE f.prev_best IS NULL OR f.best_size > f.prev_best
    """,
)
def agg_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto frontier) — parts not dominated on
    (minimize p_retailprice, maximize p_size); the classic
    multi-criteria OLAP operator behind "cheapest-for-its-size"
    shortlists.  A part survives iff no other part is at most as
    expensive AND at least as large with one strict inequality;
    equal (price, size) twins don't dominate each other, so ALL rows
    matching a frontier point are emitted (the join-back).

    Scale shape: the corpus reduces to DISTINCT prices with a
    map-side-combined max-size (one shuffle); the running max then
    runs over that shrunken table.  The single-partition window is
    bounded by PRICE CARDINALITY, not row count — and if even that
    is too wide, the same running max nests hierarchically
    (per-bucket max, prefix over buckets, the
    pipeline_pack_sequences trick).  The join back to part
    broadcasts the frontier (it's tiny by construction)."""
    from pyspark.sql.window import Window

    p = _t(spark, sf_dir, "part")
    best = p.groupBy("p_retailprice").agg(F.max("p_size").alias("best_size"))
    w = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        best.withColumn("prev_best", F.max("best_size").over(w))
        .filter(
            F.col("prev_best").isNull()
            | (F.col("best_size") > F.col("prev_best"))
        )
        .select("p_retailprice", F.col("best_size").alias("p_size"))
    )
    return p.join(
        F.broadcast(frontier), ["p_retailprice", "p_size"]
    ).select("p_partkey", "p_retailprice", "p_size")


@query(
    "agg_theil_index",
    # Per-row entropy terms are rounded at 9 dp and summed on an exact
    # decimal grid (float-order-free); mu and mu_g are one double
    # divide over exact 2-dp decimal sums.  Final divides are rounded
    # at 9 dp: the DECIMAL->DOUBLE cast of wide sums can skew 1 ulp
    # across engines (measured in text_zipf_fit), and 9 dp sits six
    # orders above that noise.
    oracle="""
    WITH g AS (
        SELECT o_orderpriority,
               COUNT(*) AS n_g,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) AS mu_g
        FROM orders GROUP BY o_orderpriority
    ),
    tot AS (
        SELECT COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) AS mu
        FROM orders
    ),
    terms AS (
        SELECT o.o_orderpriority,
               CAST(ROUND((o.o_totalprice / g.mu_g)
                          * ln(o.o_totalprice / g.mu_g), 9)
                    AS DECIMAL(18,9)) AS t
        FROM orders o JOIN g ON o.o_orderpriority = g.o_orderpriority
    )
    SELECT g.o_orderpriority,
           CAST(g.n_g AS BIGINT) AS n_orders,
           g.mu_g AS group_mean,
           ROUND(CAST(CAST(SUM(t.t) AS VARCHAR) AS DOUBLE) / g.n_g, 9) AS theil_within,
           ROUND((CAST(g.n_g AS DOUBLE) / tot.n) * (g.mu_g / tot.mu)
                 * ROUND(ln(g.mu_g / tot.mu), 9), 9) AS between_term
    FROM terms t
    JOIN g ON t.o_orderpriority = g.o_orderpriority
    CROSS JOIN tot
    GROUP BY g.o_orderpriority, g.n_g, g.mu_g, tot.n, tot.mu
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-T inequality decomposition of order value by priority —
    the additive inequality measure (unlike Gini) whose total splits
    exactly into within-group + between-group parts; data teams use
    it to answer "is revenue concentration driven inside segments or
    across them?".  Emits per group: the within-group index and the
    group's between-component (sum the columns for the decomposition).

    Scale shape: two exact-decimal aggregations (group and global —
    the global is ONE row, broadcast), then one row-local term per
    order summed on the decimal grid: the sufficient-statistics
    recipe again, raw rows shuffle once on the group key.
    Determinism: ln is the only non-portable op; every ln-bearing
    term is rounded at 9 dp before the exact sum, and the final
    divides round at 9 dp (ulp discipline documented in the oracle
    comment)."""
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_g"),
        (F.sum(price).cast("double") / F.count(F.lit(1))).alias("mu_g"),
    )
    tot = o.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(price).cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    ratio = F.col("o_totalprice") / F.col("mu_g")
    terms = (
        o.join(F.broadcast(g), "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_g",
            "mu_g",
            F.round(ratio * F.log(ratio), 9).cast("decimal(18,9)").alias("t"),
        )
    )
    mu_ratio = F.col("mu_g") / F.col("mu")
    return (
        terms.groupBy("o_orderpriority", "n_g", "mu_g")
        .agg(F.sum("t").alias("st"))
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority",
            F.col("n_g").cast("bigint").alias("n_orders"),
            F.col("mu_g").alias("group_mean"),
            F.round(F.col("st").cast("double") / F.col("n_g"), 9).alias(
                "theil_within"
            ),
            F.round(
                (F.col("n_g").cast("double") / F.col("n"))
                * mu_ratio
                * F.round(F.log(mu_ratio), 9),
                9,
            ).alias("between_term"),
        )
    )


# ---------------------------------------------------------------------------
# interval-overlap join + tolerance as-of join
# ---------------------------------------------------------------------------

_SESSION_GAP = "INTERVAL 30 MINUTES"


def _session_sql(types_pred: str, alias: str) -> str:
    """Gap-sessionize SQL (lag + flag + running sum), tie-broken on
    event_id so equal-timestamp rows order identically cross-engine."""
    return f"""
    {alias}_flags AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS flag
        FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
              FROM events WHERE {types_pred})
    ),
    {alias}_sess AS (
        SELECT user_id,
               SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
               ts
        FROM {alias}_flags
    ),
    {alias} AS (
        SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM {alias}_sess GROUP BY user_id, sid
    )"""


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH {_session_sql("event_type IN ('view','click')", "browse")},
    {_session_sql("event_type = 'purchase'", "buy")[5:]}
    SELECT b.user_id,
           b.s_start AS browse_start, b.s_end AS browse_end,
           p.s_start AS buy_start, p.s_end AS buy_end,
           CAST(epoch_us(least(b.s_end, p.s_end))
                - epoch_us(greatest(b.s_start, p.s_start))
                AS BIGINT) AS overlap_us
    FROM browse b
    JOIN buy p
      ON b.user_id = p.user_id
     AND b.s_start <= p.s_end AND p.s_start <= b.s_end
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join — browse sessions (view/click, 30-min
    gap sessionization) joined to purchase sessions of the same user
    wherever the two time intervals overlap (inclusive endpoints),
    with the exact overlap duration in microseconds.  The
    interval-interval form is a different join family from the
    point-in-interval joins (join_range / join_range_binned): both
    sides carry [start, end], and the overlap predicate
    ``a.start <= b.end AND b.start <= a.end`` cannot become a plain
    equi-join.

    Plan: both session tables come off ONE user_id window+groupBy
    each; the join is an equi-join on user_id with the overlap
    predicate as a residual filter — pairs are bounded per user, never
    a cartesian.  Keyless interval joins at 100 TB bin both sides to
    fixed time buckets (the join_range_binned pattern) and dedupe;
    with a user key, co-partitioning already bounds the work.
    Sessionization ties are broken on event_id, so equal-timestamp
    rows sessionize identically in both engines."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")

    def sessions(pred):
        e = ev.filter(pred).select("user_id", "ts", "event_id")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        flag = F.when(
            F.col("ts")
            > F.lag("ts").over(w) + F.expr(_SESSION_GAP),
            1,
        ).otherwise(0)
        sid = F.sum(flag).over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            e.withColumn("sid", sid)
            .groupBy("user_id", "sid")
            .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
        )

    browse = sessions(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("s_start").alias("browse_start"),
        F.col("s_end").alias("browse_end"),
    )
    buy = sessions(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("s_start").alias("buy_start"),
        F.col("s_end").alias("buy_end"),
    )
    overlap_us = F.unix_micros(
        F.least(F.col("browse_end"), F.col("buy_end"))
    ) - F.unix_micros(F.greatest(F.col("browse_start"), F.col("buy_start")))
    return (
        browse.join(
            buy,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("browse_start") <= F.col("buy_end"))
            & (F.col("buy_start") <= F.col("browse_end")),
        )
        .select(
            "user_id",
            "browse_start",
            "browse_end",
            "buy_start",
            "buy_end",
            overlap_us.cast("bigint").alias("overlap_us"),
        )
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH v AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.purchase_value,
           v.ts AS view_ts, v.view_value
    FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    WHERE p.ts - v.ts <= INTERVAL 1 HOUR
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas ``merge_asof(tolerance=...)``
    semantics): each purchase matches the latest view at-or-before it,
    but only if that view is within 1 hour — a stale quote/sensor
    reading must not attribute.  The tolerance is a post-filter on the
    matched gap: the as-of match itself picks the nearest prior view,
    so filtering it is equivalent to bounding the search.

    Same single user_id shuffle union+window plan as join_asof; the
    gap filter runs in codegen on the matched rows."""
    matched = join_asof(spark, sf_dir)
    return matched.filter(
        F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")
    )


WINSOR_LO, WINSOR_HI = 0.10, 0.90  # clamp tails at p10 / p90


@query(
    "agg_winsorized_mean",
    # both engines pick the SAME clamp values — element at rank
    # ceil(p*n) in (value, then arbitrary-but-irrelevant) order — so
    # the clamped decimal sums are exact and the one divide matches
    oracle=f"""
    WITH v AS (
        SELECT o_orderpriority AS prio,
               CAST(o_totalprice AS DECIMAL(18,2)) AS val,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY CAST(o_totalprice AS DECIMAL(18,2)))
                 AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    ),
    cuts AS (
        SELECT prio,
               MAX(CASE WHEN rn = CAST(CEIL({WINSOR_LO} * n) AS BIGINT)
                        THEN val END) AS lo,
               MAX(CASE WHEN rn = CAST(CEIL({WINSOR_HI} * n) AS BIGINT)
                        THEN val END) AS hi,
               CAST(MAX(n) AS BIGINT) AS n_rows
        FROM v GROUP BY prio
    )
    SELECT v.prio, cuts.n_rows,
           CAST(CAST(MAX(cuts.lo) AS VARCHAR) AS DOUBLE) AS p10,
           CAST(CAST(MAX(cuts.hi) AS VARCHAR) AS DOUBLE) AS p90,
           -- CASE, not LEAST/GREATEST: DuckDB's LEAST/GREATEST on
           -- decimals returns DOUBLE, which would float-sum the clamp
           CAST(CAST(SUM(CASE WHEN v.val < cuts.lo THEN cuts.lo
                              WHEN v.val > cuts.hi THEN cuts.hi
                              ELSE v.val END)
                     AS VARCHAR) AS DOUBLE) / MAX(cuts.n_rows)
             AS winsorized_mean
    FROM v JOIN cuts ON v.prio = cuts.prio
    GROUP BY v.prio, cuts.n_rows
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED MEAN per order priority: clamp the bottom/top decile
    to the exact p10/p90 data values, then average — the
    outlier-robust mean every metrics platform offers next to the
    trimmed mean.  Cut points are percentile_disc semantics pinned to
    ONE convention (element at rank ceil(p*n) under value order) in
    both engines, so the clamp values are identical exact decimals
    and the mean is exact-sum / count with a single double divide.

    Plan: one shuffle on the group key serves both the ranking window
    and the final aggregation; the cut-point table is group-sized and
    broadcasts back.  Value ties are harmless — ranks may permute
    equal values but the SELECTED value is the same."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("val"),
    )
    w = Window.partitionBy("prio").orderBy("val")
    v = o.select(
        "prio",
        "val",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("prio")).alias("n"),
    )
    cuts = v.groupBy("prio").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(WINSOR_LO * F.col("n")), F.col("val")
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(WINSOR_HI * F.col("n")), F.col("val")
            )
        ).alias("hi"),
        F.max("n").cast("bigint").alias("n_rows"),
    )
    clamped = F.least(F.greatest(F.col("val"), F.col("lo")), F.col("hi"))
    return (
        v.join(F.broadcast(cuts), "prio")
        .groupBy("prio", "n_rows")
        .agg(
            F.first(F.col("lo")).cast("double").alias("p10"),
            F.first(F.col("hi")).cast("double").alias("p90"),
            (F.sum(clamped).cast("double") / F.max("n_rows")).alias(
                "winsorized_mean"
            ),
        )
        .select("prio", "n_rows", "p10", "p90", "winsorized_mean")
    )


@query(
    "agg_winsorized_mean_approx",
    # TOLERANCE oracle (agg_approx_percentile's envelope pattern): the
    # sketch-derived winsorized mean is engine-specific, but clamping
    # is MONOTONE in both cut points, so the mean computed with approx
    # cuts must lie between the means computed with the exact
    # quantiles at p ∓ 2ε and p ± 2ε.  DuckDB re-derives the exact
    # p10/p90 anchors and literal TRUE; the hash covers the envelope.
    oracle="""
    SELECT o_orderpriority AS prio, COUNT(*) AS n_rows,
           quantile_cont(CAST(o_totalprice AS DOUBLE), 0.1) AS p10_exact,
           quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS p90_exact,
           TRUE AS within_envelope
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_winsorized_mean_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB production path agg_winsorized_mean's exact-rank
    formulation can't take there: cut points from the mergeable
    GK sketch (``approx_percentile``, O(1/accuracy) state per group)
    instead of a full ``row_number()`` sort per group — no window, no
    per-group total ordering, just two ordinary hash aggregations and
    a broadcast-back of the group-sized cut table.  One group spanning
    billions of rows costs the same state as one spanning thousands.

    Correctness contract: clamp(val, lo, hi) is monotone in lo and hi,
    and each sketch cut lies between the exact quantiles at p ± 2ε
    (rank-error guarantee, ε = 1/accuracy), so the approx winsorized
    mean is bracketed by the means computed with the exact ∓2ε and
    ±2ε cut pairs — the boolean the gate hashes.  The exact anchors
    exist only to verify; the production operator is the sketch path
    alone (drop the F.percentile columns and the plan is sort-free).
    """
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("double").alias("val"),
    )
    eps2 = 2.0 / 1000
    # the six exact verification anchors come from ONE array-percentile
    # aggregate, not six scalar ones: each scalar F.percentile agg
    # buffers and sorts the full per-group value list SEPARATELY (six
    # value-list copies per group in every partial-agg buffer, six
    # sorts, six times the shuffle payload) — the array form buffers
    # once, sorts once, extracts all six ranks (optimization r10,
    # guide §1.2 per-task work / §2.3 shuffle fewer bytes).  Same
    # percentile_cont semantics, same values, hash-identical result.
    cuts = o.groupBy("prio").agg(
        F.approx_percentile(
            F.col("val"), F.lit([WINSOR_LO, WINSOR_HI]), F.lit(1000)
        ).alias("ap"),
        F.percentile(
            F.col("val"),
            F.lit([
                WINSOR_LO, WINSOR_HI,
                WINSOR_LO - eps2, WINSOR_LO + eps2,
                WINSOR_HI - eps2, WINSOR_HI + eps2,
            ]),
        ).alias("px"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        "prio", "ap", "n_rows",
        F.col("px")[0].alias("p10_exact"),
        F.col("px")[1].alias("p90_exact"),
        F.col("px")[2].alias("lo_min"),
        F.col("px")[3].alias("lo_max"),
        F.col("px")[4].alias("hi_min"),
        F.col("px")[5].alias("hi_max"),
    )

    def _clamp(lo, hi):
        return F.least(F.greatest(F.col("val"), lo), hi)

    joined = o.join(F.broadcast(cuts), "prio")
    means = joined.groupBy("prio", "n_rows").agg(
        (
            F.sum(_clamp(F.col("ap")[0], F.col("ap")[1])) / F.max("n_rows")
        ).alias("m_approx"),
        (
            F.sum(_clamp(F.col("lo_min"), F.col("hi_min"))) / F.max("n_rows")
        ).alias("m_min"),
        (
            F.sum(_clamp(F.col("lo_max"), F.col("hi_max"))) / F.max("n_rows")
        ).alias("m_max"),
        F.first("p10_exact").alias("p10_exact"),
        F.first("p90_exact").alias("p90_exact"),
    )
    return means.select(
        "prio",
        "n_rows",
        "p10_exact",
        "p90_exact",
        (
            (F.col("m_approx") >= F.col("m_min"))
            & (F.col("m_approx") <= F.col("m_max"))
        ).alias("within_envelope"),
    )
