"""Additional TPC-H-shaped query library (SURVEY.md §2-C widening).

The reference's delegated surface is "anything DataFusion SQL can do
on Glue tables" (lib.rs:5-6, demo.rs:66-123); its author's own catalog
holds TPC-H parquet (README.md:12-16).  This module widens the rebuilt
surface with the remaining TPC-H query *shapes* expressible over the
driver's TPC-H-ish schema (no partsupp table; no l_shipmode /
l_commitdate / p_container columns — predicates are adapted, plan
shapes preserved):

* Q7  — two-sided dimension filter with a disjunctive nation pair
* Q8  — market-share ratio (conditional aggregation over a 7-table join)
* Q13 — outer-join + count distribution (group-by on an aggregate)
* Q14 — promo revenue ratio (CASE inside SUM)
* Q15 — top supplier via aggregate-of-aggregate scalar subquery
* Q17 — correlated per-group average threshold
* Q18 — large orders via grouped HAVING semi-join
* Q19 — disjunction of conjunctive join predicates
* Q22 — anti join + ungrouped scalar-average subquery

Every aggregate routes through the deterministic decimal helpers
(functions/__init__.py) so values hash-match the DuckDB oracle
bit-for-bit.  Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.functions import (
    davg,
    dsum,
    spark_davg,
    spark_dsum,
    sql_davg,
    sql_dsum,
)
from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_engine_conf(spark)
    return load_table(spark, sf_dir, name)


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS l_year,
           {sql_dsum(_SQL_REV, 4)} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: shipping volume between a nation pair by year.
    The disjunctive pair predicate sits ABOVE the joins (it needs both
    sides), but each nation join is a broadcast, so the fact table is
    touched once and the only shuffle is lineitem↔orders.  At 100 TB
    the nation/customer/supplier broadcasts are unchanged; the pair
    filter rejects rows before aggregation, not before the join — same
    plan TPC-H engines use."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev(), 4).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", 4)}
             / {sql_dsum("volume", 4)} AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'EUROPE'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: one nation's market share of a region's promo
    volume, by order year.  Seven broadcast joins around one fact scan;
    the share is a conditional-sum / sum ratio computed in one grouped
    aggregation (no second pass over the data).  Both sums are exact
    decimals; the single divide is the only float op."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = _rev().alias("volume")
    all_nations = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"), volume, "nation")
    )
    national = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0)
    return all_nations.groupBy("o_year").agg(
        (dsum(national, 4) / dsum(F.col("volume"), 4)).alias("mkt_share")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: distribution of order counts per customer,
    including zero-order customers (left outer join keeps them;
    COUNT(o_orderkey) counts non-nulls).  Two aggregations: the first
    shuffles on c_custkey, the second on the (tiny) count domain — the
    second shuffle is negligible at any scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 4)}
                  / {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: promo revenue percentage for one month.  part
    broadcasts; the month filter is scan-pushed on lineitem; the ratio
    is one global aggregation (partial map-side combine → single final
    row — no shuffle of data, only of two accumulators)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    p = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((F.lit(100.00) * dsum(promo, 4) / dsum(_rev(), 4)).alias("promo_revenue"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum(_SQL_REV, 4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) with the maximum quarterly revenue.
    The revenue aggregate is computed once and reused for both the max
    (a 1-row broadcast) and the final join — in SQL so Catalyst handles
    the scalar subquery; the CTE keeps one scan of lineitem per use
    (at 100 TB, persist the revenue view to scan lineitem once)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q15_lineitem")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("q15_supplier")
    spark_rev = spark_dsum(_SQL_REV, 4)
    return spark.sql(
        f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, {spark_rev} AS total_revenue
            FROM q15_lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM q15_supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
        """
    )


@query(
    "q17_small_quantity",
    oracle=f"""
    SELECT {sql_dsum("l.l_extendedprice", 2)} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND p.p_size <= 10
      AND l.l_quantity < (
          SELECT 0.5 * {sql_davg("l2.l_quantity", 4)}
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: revenue from small-quantity orders of one
    brand, thresholded by a correlated per-part average.  Written in
    SQL so Catalyst's decorrelation turns the correlated scalar
    subquery into a per-partkey aggregate joined back — the same
    rewrite DataFusion applies.  The per-part aggregate shuffles on
    l_partkey (same key as the join: one exchange reused)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q17_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("q17_part")
    return spark.sql(
        f"""
        SELECT {spark_dsum("l.l_extendedprice", 2)} / 7.0 AS avg_yearly
        FROM q17_lineitem l
        JOIN q17_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND p.p_size <= 10
          AND l.l_quantity < (
              SELECT 0.5 * {spark_davg("l2.l_quantity", 4)}
              FROM q17_lineitem l2
              WHERE l2.l_partkey = p.p_partkey
          )
        """
    )


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           date_trunc('day', o.o_orderdate) AS orderdate, o.o_totalprice,
           {sql_dsum("l.l_quantity", 2)} AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: customers with very large orders.  The naive
    plan (and the oracle SQL) scans lineitem twice — once for the
    HAVING subquery, once to re-aggregate sum_qty in the output.  But
    the output sum IS the HAVING sum, so this implementation computes
    the per-order aggregate once and joins it straight to
    orders/customer: one fact scan, one aggregation, and the
    orderkey-partitioned aggregate feeds the orders join without a
    second lineitem exchange.  At 100 TB that halves the dominant
    cost (the fact scan).  Top-100 via TakeOrderedAndProject.
    Hash-matching the two-pass oracle proves the reuse is exact."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_trunc("day", F.col("o_orderdate")).alias("orderdate"),
            "o_totalprice",
            F.col("q").cast("decimal(38,2)").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum(_SQL_REV, 4)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 45
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: disjunction of conjunctive predicates across
    both join sides.  Catalyst keeps the equi-join on p_partkey and
    evaluates the OR as a post-join filter, while pushing the
    per-side common denominators (brand ∈ {...}, quantity ≤ 50) down
    to the scans — check PushedFilters in .explain."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(1, 30) & q.between(10, 35))
        | ((b == "Brand#3") & sz.between(1, 45) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(_rev(), 4).alias("revenue"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
    SELECT cntrycode, COUNT(*) AS numcust,
           {sql_dsum("c_acctbal", 2)} AS totacctbal
    FROM (
        SELECT c.c_nationkey % 5 AS cntrycode, c.c_acctbal
        FROM customer c
        WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11)
          AND c.c_acctbal > (
              SELECT {sql_davg("c2.c_acctbal", 4)}
              FROM customer c2
              WHERE c2.c_acctbal > 0.0
                AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11)
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: well-funded customers with no orders (the
    reference schema has no c_phone, so country code is adapted to
    n_nationkey buckets).  Three pieces: an ungrouped average (1-row
    broadcast), a NOT EXISTS anti join on o_custkey, and a final small
    aggregation.  The anti join is the only fact-sized shuffle."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q22_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q22_orders")
    return spark.sql(
        f"""
        SELECT cntrycode, COUNT(*) AS numcust,
               {spark_dsum("c_acctbal", 2)} AS totacctbal
        FROM (
            SELECT c.c_nationkey % 5 AS cntrycode, c.c_acctbal
            FROM q22_customer c
            WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11)
              AND c.c_acctbal > (
                  SELECT {spark_davg("c2.c_acctbal", 4)}
                  FROM q22_customer c2
                  WHERE c2.c_acctbal > 0.0
                    AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11)
              )
              AND NOT EXISTS (
                  SELECT 1 FROM q22_orders o WHERE o.o_custkey = c.c_custkey
              )
        ) custsale
        GROUP BY cntrycode
        ORDER BY cntrycode
        """
    )
