"""Iterative graph dataflow: weighted PageRank.

The reference has no graph surface; dedup_clusters (operators/dedup.py)
already covers unbounded-iteration connected components.  This module
adds the other canonical iterative-dataflow shape — fixed-iteration
PageRank — because its convergence loop (join ranks to edges,
re-aggregate, repeat) is the template for label propagation, belief
propagation, and embedding-table refinement jobs, and because a FIXED
iteration count can be exactly unrolled into a DuckDB oracle, making
the whole loop hash-checkable rather than rows-only.

Determinism: per-edge contributions are computed in double (one
deterministic rounding each: ``r·w/out_w``), then cast onto a
decimal(28,15) grid so the per-node SUM is exact integer arithmetic —
associativity-free under any partitioning, the same trick as
functions.dsum.  The scalar tail (teleport + damping) runs in a fixed
order and rounds to 12 dp before feeding the next iteration, so both
engines iterate on IDENTICAL numbers.

Scale: each iteration is one hash join (ranks ⋈ edges on src — at
graph scale, pre-partition both on src so iterations reuse the
exchange) plus a map-side-combined aggregation on dst.  Rank state is
O(|nodes|); edges stream.  The 25-node trade graph here is tiny, but
the dataflow is the one GraphX/Pregel lowers to anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

PR_ITERS = 5
PR_DAMP = 0.85
PR_N = 25  # nation count is fixed in the schema (TPC-H invariant)


def _oracle() -> str:
    base = f"""
    WITH edges AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), outw AS (
        SELECT src, SUM(w) AS out_w FROM edges GROUP BY src
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges
    ), r0 AS (
        SELECT node, 1.0 / {PR_N} AS r FROM nodes
    )"""
    step = """, r{i} AS (
        SELECT n.node,
               ROUND({t} + {d} * CAST(COALESCE(SUM(
                   CAST(p.r * e.w / ow.out_w AS DECIMAL(28,15))
               ), 0) AS DOUBLE), 12) AS r
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN r{prev} p ON p.node = e.src
        LEFT JOIN outw ow ON ow.src = e.src
        GROUP BY n.node
    )"""
    t = f"{1 - PR_DAMP} / {PR_N}"
    for i in range(1, PR_ITERS + 1):
        base += step.format(i=i, prev=i - 1, t=t, d=PR_DAMP)
    return base + f"\n    SELECT node AS nationkey, r AS pagerank FROM r{PR_ITERS}"


@query("graph_pagerank", oracle=_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, {iters} fixed iterations, over the
    supplier-nation → customer-nation trade graph (edge weight =
    lineitem count routed between the nations).  See module docstring
    for the determinism scheme; the oracle is the SAME loop unrolled
    into chained CTEs, so every iteration's arithmetic is
    hash-verified, not just the final shape."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = edges.localCheckpoint()  # graph build runs once, not per iteration
    # the loop sides are nation-bounded by schema invariant (≤25 nodes,
    # ≤625 edges) but checkpointing erased their stats, so Catalyst
    # planned every per-iteration join as a shuffle — explicit
    # broadcast hints (guide §3.1: force it when you KNOW a side is
    # small) leave one tiny aggregation exchange per iteration
    # (A/B at sf0.1: 1.80 → 1.42 s steady-state, hash-identical)
    edges = F.broadcast(edges)
    outw = F.broadcast(
        edges.groupBy("src")
        .agg(F.sum("w").alias("out_w"))
        .withColumnRenamed("src", "osrc")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", (F.lit(1.0) / PR_N).alias("r"))
    teleport = (1 - PR_DAMP) / PR_N
    for _ in range(PR_ITERS):
        contrib = F.col("r") * F.col("w") / F.col("out_w")
        ranks = (
            nodes.join(edges, edges.dst == nodes.node, "left")
            .join(F.broadcast(ranks.withColumnRenamed("node", "rnode")),
                  F.col("rnode") == F.col("src"), "left")
            .join(outw, F.col("osrc") == F.col("src"), "left")
            .groupBy("node")
            .agg(
                F.round(
                    teleport
                    + PR_DAMP
                    * F.coalesce(
                        F.sum(contrib.cast("decimal(28,15)")), F.lit(0)
                    ).cast("double"),
                    12,
                ).alias("r")
            )
        )
    return ranks.select(F.col("node").alias("nationkey"), F.col("r").alias("pagerank"))


@query(
    "graph_triangle_count",
    oracle="""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
                        greatest(c.c_nationkey, s.s_nationkey) AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    ) GROUP BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the undirected nation
    trade graph (an edge links two nations with at least one traded
    lineitem between them).  Triangle counting is the clustering-
    coefficient / community-density primitive; like PageRank above,
    the reference has no graph surface, so this extends the engine.

    Algorithm: canonical-orientation enumeration.  Every undirected
    edge is stored once as (a < b); a triangle {x,y,z} with x<y<z is
    found exactly once as e(x,y) ⋈ e(y,z) ⋈ e(x,z) — two equi-joins,
    no post-hoc dedup, integer-only arithmetic (no float determinism
    risk).  Each found triangle credits all three corners via a
    3-way UNION ALL + count.

    100 TB notes: canonical orientation already halves the edge list;
    at web-graph scale you additionally orient edges from lower- to
    higher-DEGREE endpoint (not id) so the join fan-out per vertex is
    bounded by O(sqrt(|E|)) arboricity — swap the least/greatest key
    for a (degree, id) ordering; the plan shape (two shuffles on edge
    keys) is unchanged.  The nation graph is broadcast-sized, so
    Catalyst turns both joins into broadcast hash joins here.
    """
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
    )
    e = e.localCheckpoint()  # edge build (4-way fact join) runs once, not 3x
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


LPA_ITERS = 3


def _lpa_oracle() -> str:
    base = """
    WITH raw AS MATERIALIZED (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (
        SELECT src, dst, SUM(w) AS w FROM (
            SELECT src, dst, w FROM raw
            UNION ALL
            SELECT dst AS src, src AS dst, w FROM raw
        ) GROUP BY src, dst
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    l0 AS (SELECT node, node AS lbl FROM nodes)"""
    step = """, l{i} AS MATERIALIZED (
        SELECT node, lbl FROM (
            SELECT e.src AS node, p.lbl,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.src
                       ORDER BY SUM(e.w) DESC, p.lbl) AS rn
            FROM edges e JOIN l{prev} p ON p.node = e.dst
            GROUP BY e.src, p.lbl
        ) t WHERE rn = 1
    )"""
    for i in range(1, LPA_ITERS + 1):
        base += step.format(i=i, prev=i - 1)
    return (
        base
        + f"\n    SELECT CAST(node AS BIGINT) AS nationkey,"
        f" CAST(lbl AS BIGINT) AS community FROM l{LPA_ITERS}"
    )


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL PROPAGATION community detection over the undirected
    nation trade graph — the O(E)-per-round community algorithm
    (Raghavan et al.) that GraphX ships as `labelPropagation`.
    Synchronous updates, {LPA_ITERS} fixed rounds: each node adopts
    the label with the highest incident edge weight among its
    neighbors, ties to the SMALLEST label — fully deterministic, so
    the whole loop unrolls into chained CTEs and every round is
    hash-verified (the graph_pagerank discipline; pagerank checks the
    float path, this checks the argmax/tie path).

    Scale: per round ONE hash join (labels ⋈ edges on dst) + a
    (node, label) weight rollup + a per-node argmax window — all
    map-side combinable, label state O(|nodes|), edges stream.  The
    argmax window partitions by node, so there is no global sort.
    Self-loops are excluded when the graph is built (they vote for
    the node's own label and freeze propagation)."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql.window import Window

    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = (
        raw.unionByName(
            raw.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()  # graph build runs once, not per round
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    rn_w = Window.partitionBy("src").orderBy(F.col("sw").desc(), F.col("lbl"))
    for _ in range(LPA_ITERS):
        # NOTE (optimization r10): broadcasting the node-sized label
        # side here, the graph_pagerank treatment, measured WORSE in a
        # same-box A/B (best-of-2 × 2: 2.13–2.30 s hinted vs
        # 1.80–1.95 s unhinted at sf0.1) — the round's rollup+window
        # exchanges dominate and the hint only displaces them — so the
        # loop keeps Catalyst's own plan.
        labels = (
            edges.join(
                labels.withColumnRenamed("node", "nbr"),
                F.col("nbr") == F.col("dst"),
            )
            .groupBy("src", "lbl")
            .agg(F.sum("w").alias("sw"))
            .withColumn("rn", F.row_number().over(rn_w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "lbl")
        )
    return labels.select(
        F.col("node").cast("bigint").alias("nationkey"),
        F.col("lbl").cast("bigint").alias("community"),
    )


@query(
    "graph_common_neighbors",
    oracle="""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
                        greatest(c.c_nationkey, s.s_nationkey) AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    ),
    nbr AS (
        SELECT a AS node, b AS nb FROM e
        UNION ALL SELECT b, a FROM e
    ),
    deg AS (SELECT node, COUNT(*) AS d FROM nbr GROUP BY node),
    cn AS (
        SELECT n1.node AS u, n2.node AS v, COUNT(*) AS common
        FROM nbr n1 JOIN nbr n2 ON n1.nb = n2.nb AND n1.node < n2.node
        GROUP BY 1, 2
    )
    SELECT cn.u, cn.v, cn.common,
           (EXISTS (SELECT 1 FROM e WHERE e.a = cn.u AND e.b = cn.v))
             AS adjacent,
           ROUND(CAST(cn.common AS DOUBLE)
                 / (du.d + dv.d - cn.common), 9) AS nbr_jaccard
    FROM cn
    JOIN deg du ON du.node = cn.u
    JOIN deg dv ON dv.node = cn.v
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the undirected nation trade
    graph: for every node pair sharing at least one neighbor, the
    common-neighbor count, neighbor-set Jaccard, and whether the pair
    is ALREADY an edge (non-adjacent high-scoring pairs are the link
    predictions; adjacent ones measure embeddedness/tie strength).

    Algorithm: wedge enumeration — the symmetric neighbor table joined
    to itself on the SHARED NEIGHBOR with u < v generates each wedge
    once, one groupBy counts them; degrees and adjacency attach via
    joins on the pair-sized result.  Integer counts throughout; the
    one float (Jaccard) is a single rounded divide.  At 100 TB wedge
    enumeration is the standard bottleneck — hot nodes (hubs) make
    |wedges| = sum deg^2; the production guard is degree-capping or
    hub-sampling, not needed at nation scale and orthogonal to the
    plan shape."""
    apply_engine_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
        .localCheckpoint()  # graph build runs once, feeds three consumers
    )
    nbr = e.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionByName(
        e.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    n1 = nbr.select(F.col("node").alias("u"), "nb")
    n2 = nbr.select(F.col("node").alias("v"), F.col("nb").alias("nb2"))
    cn = (
        n1.join(n2, (F.col("nb") == F.col("nb2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).withColumn(
        "adjacent", F.lit(True)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        cn.join(adj, ["u", "v"], "left")
        .join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            "common",
            F.coalesce("adjacent", F.lit(False)).alias("adjacent"),
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")),
                9,
            ).alias("nbr_jaccard"),
        )
    )
