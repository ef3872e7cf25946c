"""Geospatial grid operators: radius join, nearest neighbor, cell stats.

The reference exposes no spatial surface (it is a catalog provider,
SURVEY.md §0); these extend the delegated SQL surface (§2-C scoping
note) with the canonical distributed-spatial shapes — the ones every
geo workload (store matching, rider dispatch, POI dedup) lowers to:

* **grid-bucketed radius join** — the spatial analogue of the banded
  LSH join: bucket both sides into cells of side = radius, explode
  the SMALLER side to its 3x3 cell neighborhood, equi-join on the
  cell key, verify exact distance.  Correct because any two points
  within distance R lie within one cell step of each other when the
  cell side is >= R; never an all-pairs cross join, so the plan is
  linear in points + true matches, and survives 100 TB where the
  theta-join form (every pair through a distance predicate) cannot
  run at all.
* **nearest neighbor within radius** — same candidate generator, then
  a per-left-row argmin (min_by on an exact (dist, key) tuple) instead
  of emitting all matches.
* **cell stats** — the aggregation-side primitive (density maps,
  heat tiles): one map-side-combined groupBy on the cell key.

Coordinates: the TPC-H-ish schema has no lat/lon, so each key derives
a deterministic position via modular arithmetic on PRIME multipliers
(integer-exact, reproduced verbatim in the oracle).  Geometry is the
equirectangular plane in degrees — squared Euclidean distance on
decimal(7,2) coordinates, so every distance and comparison is EXACT
decimal arithmetic in both engines (no trig, no float drift, no
antimeridian handling; a production haversine swap keeps the same
plan shape and moves only the verify expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

# Radius (degrees) and grid cell side.  Cell side == radius is the
# correctness requirement for the 3x3 neighborhood probe.
GEO_RADIUS = 3
_R2 = GEO_RADIUS * GEO_RADIUS  # compare against squared distance

# lat in [-90, 90) at 0.01 resolution; lon in [-180, 180).  Distinct
# primes per (table, axis) so the two point sets are uncorrelated.
# The outer DECIMAL(9,2) cast is load-bearing: DuckDB evaluates
# DECIMAL / INTEGER in DOUBLE (89.99 comes back 89.99000000000001),
# which would make downstream sums order-dependent; re-snapping to the
# 0.01 grid keeps every coordinate exact in both engines.
_SQL_CUST_LAT = (
    "CAST(CAST((c_custkey * 7919 % 18000) AS DECIMAL(7,2)) / 100 - 90"
    " AS DECIMAL(9,2))"
)
_SQL_CUST_LON = (
    "CAST(CAST((c_custkey * 104729 % 36000) AS DECIMAL(7,2)) / 100 - 180"
    " AS DECIMAL(9,2))"
)
_SQL_SUPP_LAT = (
    "CAST(CAST((s_suppkey * 7907 % 18000) AS DECIMAL(7,2)) / 100 - 90"
    " AS DECIMAL(9,2))"
)
_SQL_SUPP_LON = (
    "CAST(CAST((s_suppkey * 104717 % 36000) AS DECIMAL(7,2)) / 100 - 180"
    " AS DECIMAL(9,2))"
)


def _cust_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    c = load_table(spark, sf_dir, "customer")
    lat = (
        ((F.col("c_custkey") * 7919 % 18000).cast("decimal(7,2)") / 100 - 90)
        .cast("decimal(9,2)")
        .alias("c_lat")
    )
    lon = (
        ((F.col("c_custkey") * 104729 % 36000).cast("decimal(7,2)") / 100 - 180)
        .cast("decimal(9,2)")
        .alias("c_lon")
    )
    return c.select("c_custkey", lat, lon)


def _supp_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    s = load_table(spark, sf_dir, "supplier")
    lat = (
        ((F.col("s_suppkey") * 7907 % 18000).cast("decimal(7,2)") / 100 - 90)
        .cast("decimal(9,2)")
        .alias("s_lat")
    )
    lon = (
        ((F.col("s_suppkey") * 104717 % 36000).cast("decimal(7,2)") / 100 - 180)
        .cast("decimal(9,2)")
        .alias("s_lon")
    )
    return s.select("s_suppkey", lat, lon)


def _cell(col_lat, col_lon):
    return (
        F.floor(col_lat / GEO_RADIUS).cast("int"),
        F.floor(col_lon / GEO_RADIUS).cast("int"),
    )


def _dist2(lat_a, lon_a, lat_b, lon_b):
    """Squared planar distance on the exact decimal grid: decimal(8,2)
    differences squared to decimal(17,4), summed to decimal(18,4) —
    every step exact, so the radius comparison is bit-deterministic."""
    dlat = (lat_a - lat_b).cast("decimal(8,2)")
    dlon = (lon_a - lon_b).cast("decimal(8,2)")
    return (dlat * dlat + dlon * dlon).cast("decimal(18,4)")


_SQL_POINTS = f"""
    cpts AS (
        SELECT c_custkey, {_SQL_CUST_LAT} AS c_lat, {_SQL_CUST_LON} AS c_lon
        FROM customer
    ),
    spts AS (
        SELECT s_suppkey, {_SQL_SUPP_LAT} AS s_lat, {_SQL_SUPP_LON} AS s_lon
        FROM supplier
    )
"""

_SQL_DIST2 = (
    "CAST(CAST(c_lat - s_lat AS DECIMAL(8,2)) * CAST(c_lat - s_lat AS DECIMAL(8,2))"
    " + CAST(c_lon - s_lon AS DECIMAL(8,2)) * CAST(c_lon - s_lon AS DECIMAL(8,2))"
    " AS DECIMAL(18,4))"
)


@query(
    "geo_radius_join",
    # the oracle is the unblocked theta-join definition — the grid
    # candidate generator must reproduce it exactly
    oracle=f"""
    WITH {_SQL_POINTS}
    SELECT c.c_custkey, s.s_suppkey,
           CAST({_SQL_DIST2} AS DOUBLE) AS dist2
    FROM cpts c JOIN spts s ON {_SQL_DIST2} <= {_R2}
    """,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within GEO_RADIUS degrees.

    Plan: suppliers (the smaller side) explode to their 3x3 cell
    neighborhood; customers carry their single home cell; one
    EQUI-join on (cell_i, cell_j) generates candidates; exact decimal
    distance verifies.  The oracle recomputes the quadratic theta-join
    independently, so a hash match proves the grid is lossless.  At
    100 TB both sides shuffle on the cell key only (spatial
    co-location), and skewed cells (cities) split under AQE exactly
    like hot LSH bands."""
    c = _cust_points(spark, sf_dir)
    s = _supp_points(spark, sf_dir)
    ci, cj = _cell(F.col("c_lat"), F.col("c_lon"))
    c = c.select("c_custkey", "c_lat", "c_lon", ci.alias("gi"), cj.alias("gj"))
    si, sj = _cell(F.col("s_lat"), F.col("s_lon"))
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    s = (
        s.select("s_suppkey", "s_lat", "s_lon", si.alias("si0"), sj.alias("sj0"))
        .withColumn("di", off)
        .withColumn("dj", off)
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.col("si0") + F.col("di")).alias("gi"),
            (F.col("sj0") + F.col("dj")).alias("gj"),
        )
    )
    d2 = _dist2(F.col("c_lat"), F.col("c_lon"), F.col("s_lat"), F.col("s_lon"))
    return (
        c.join(s, ["gi", "gj"])
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= _R2)
        .select("c_custkey", "s_suppkey", F.col("dist2").cast("double"))
    )


# Fine-phase cell side for the two-phase NN: GEO_RADIUS / 4, expressed
# in the 0.01-degree integer grid (lat*100) so cell ids are computed
# from exact integers.  The resolution bound is the side SQUARED in
# squared-degree units.
_FINE_SIDE_100 = GEO_RADIUS * 100 // 4          # 75 hundredths = 0.75°
_FINE_BOUND2 = (GEO_RADIUS / 4) ** 2            # 0.5625 deg² (exact)


def _nn_argmin(cand: DataFrame) -> DataFrame:
    pick = F.min_by(
        F.struct(F.col("s_suppkey"), F.col("dist2")),
        F.struct(F.col("dist2"), F.col("s_suppkey")),
    )
    return (
        cand.groupBy("c_custkey")
        .agg(pick.alias("nn"))
        .select(
            "c_custkey",
            F.col("nn.s_suppkey").alias("nearest_suppkey"),
            F.col("nn.dist2").alias("dist2"),
        )
    )



@query(
    "geo_nearest_neighbor",
    oracle=f"""
    WITH {_SQL_POINTS},
    cand AS (
        SELECT c.c_custkey, s.s_suppkey,
               CAST({_SQL_DIST2} AS DOUBLE) AS dist2
        FROM cpts c JOIN spts s ON {_SQL_DIST2} <= {_R2}
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, dist2
    FROM (
        SELECT c_custkey, s_suppkey, dist2,
               ROW_NUMBER() OVER (PARTITION BY c_custkey
                                  ORDER BY dist2, s_suppkey) AS rn
        FROM cand
    ) WHERE rn = 1
    """,
)
def geo_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within GEO_RADIUS per customer (customers with
    no supplier in range are absent — the bounded-radius contract that
    makes distributed NN tractable).

    TWO-PHASE grid search (the density fix for the one-shot R-cell
    plan, whose per-cell candidate volume grows with density² because
    the cell count is fixed by the radius):

    * **fine phase** — cells of side R/4; suppliers explode to the
      3×3 fine neighborhood, one equi-join, per-customer argmin.  A
      point OUTSIDE a 3×3 window of side c is strictly farther than
      c, so a fine-phase winner with dist ≤ c is PROVABLY the global
      nearest — no second look needed.  Candidate volume per customer
      covers (3R/4)² instead of (3R)², a 16× cut, and the guarantee
      resolves almost every customer once supplier density is high —
      exactly the regime that breaks the one-shot plan.
    * **fallback phase** — only customers the fine phase could NOT
      certify (no supplier within R/4) rerun the original R-cell
      plan.  Their population shrinks as density grows, so total
      candidate work stays ~linear in points instead of quadratic in
      density (SCALING_r07_quiet flagged the one-shot plan at 22× for
      10× data; the two-phase plan removes the flag).

    The per-customer argmin is min_by on the exact (dist2, s_suppkey)
    decimal pair — deterministic in both engines; the oracle is the
    unblocked theta-join + window definition, so the hash match
    proves both phases and the certificate rule are lossless."""
    c = _cust_points(spark, sf_dir)
    s = _supp_points(spark, sf_dir)
    # integer-exact fine cells from the 0.01-degree grid
    c_fine = c.select(
        "c_custkey", "c_lat", "c_lon",
        F.floor((F.col("c_lat") * 100).cast("long") / _FINE_SIDE_100)
        .cast("int").alias("gi"),
        F.floor((F.col("c_lon") * 100).cast("long") / _FINE_SIDE_100)
        .cast("int").alias("gj"),
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    s_fine = (
        s.select(
            "s_suppkey", "s_lat", "s_lon",
            F.floor((F.col("s_lat") * 100).cast("long") / _FINE_SIDE_100)
            .cast("int").alias("si0"),
            F.floor((F.col("s_lon") * 100).cast("long") / _FINE_SIDE_100)
            .cast("int").alias("sj0"),
        )
        .withColumn("di", off)
        .withColumn("dj", off)
        .select(
            "s_suppkey", "s_lat", "s_lon",
            (F.col("si0") + F.col("di")).alias("gi"),
            (F.col("sj0") + F.col("dj")).alias("gj"),
        )
    )
    d2 = _dist2(F.col("c_lat"), F.col("c_lon"), F.col("s_lat"), F.col("s_lon"))
    cand1 = (
        c_fine.join(s_fine, ["gi", "gj"])
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= _R2)
        .select("c_custkey", "s_suppkey", F.col("dist2").cast("double"))
    )
    nn1 = _nn_argmin(cand1)
    # certificate: a fine-phase winner within R/4 is globally nearest
    resolved = nn1.filter(F.col("dist2") <= F.lit(_FINE_BOUND2))
    unresolved = c.join(
        resolved.select("c_custkey"), "c_custkey", "left_anti"
    )
    # fallback: the original R-cell candidate plan, only for the
    # customers the fine phase could not certify
    ci, cj = _cell(F.col("c_lat"), F.col("c_lon"))
    c2 = unresolved.select(
        "c_custkey", "c_lat", "c_lon", ci.alias("gi"), cj.alias("gj")
    )
    si, sj = _cell(F.col("s_lat"), F.col("s_lon"))
    s2 = (
        s.select(
            "s_suppkey", "s_lat", "s_lon", si.alias("si0"), sj.alias("sj0")
        )
        .withColumn("di", off)
        .withColumn("dj", off)
        .select(
            "s_suppkey", "s_lat", "s_lon",
            (F.col("si0") + F.col("di")).alias("gi"),
            (F.col("sj0") + F.col("dj")).alias("gj"),
        )
    )
    cand2 = (
        c2.join(s2, ["gi", "gj"])
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= _R2)
        .select("c_custkey", "s_suppkey", F.col("dist2").cast("double"))
    )
    return resolved.unionByName(_nn_argmin(cand2))


@query(
    "geo_cell_stats",
    oracle=f"""
    WITH {_SQL_POINTS}
    SELECT CAST(FLOOR(c_lat / {GEO_RADIUS}) AS INT) AS gi,
           CAST(FLOOR(c_lon / {GEO_RADIUS}) AS INT) AS gj,
           COUNT(*) AS n_points,
           CAST(CAST(SUM(c_lat) AS VARCHAR) AS DOUBLE) / COUNT(*) AS centroid_lat,
           CAST(CAST(SUM(c_lon) AS VARCHAR) AS DOUBLE) / COUNT(*) AS centroid_lon
    FROM cpts
    GROUP BY gi, gj
    HAVING COUNT(*) >= 2
    """,
)
def geo_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell density + centroid over the customer point set (the
    heat-tile primitive).  One map-side-combined groupBy on the cell
    key; centroids are exact decimal sums with a single double divide
    (the davg discipline), so values hash-match the oracle.  Cells
    with a single point are suppressed (density maps bin, they don't
    echo points)."""
    c = _cust_points(spark, sf_dir)
    ci, cj = _cell(F.col("c_lat"), F.col("c_lon"))
    return (
        c.groupBy(ci.alias("gi"), cj.alias("gj"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.sum("c_lat").cast("double") / F.count(F.lit(1))).alias(
                "centroid_lat"
            ),
            (F.sum("c_lon").cast("double") / F.count(F.lit(1))).alias(
                "centroid_lon"
            ),
        )
        .filter(F.col("n_points") >= 2)
    )


# Test polygons on the SCALED integer grid (coordinates x100, i.e.
# 0.01-degree units): a pentagon and a triangle, counterclockwise.
# Integer vertices + integer points make the crossing test EXACT —
# no epsilon, no engine-dependent convention at boundaries.
GEO_POLYGONS: dict[int, list[tuple[int, int]]] = {
    1: [(-3000, -2000), (2000, -3500), (4500, 0), (1000, 3000), (-2500, 1500)],
    2: [(5000, 5000), (12000, 6000), (8000, 11000)],
}


def _edges_sql(poly: list[tuple[int, int]]) -> str:
    n = len(poly)
    rows = []
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        rows.append(f"({x1}, {y1}, {x2}, {y2})")
    return ", ".join(rows)


def _sql_pip(poly: list[tuple[int, int]]) -> str:
    """DuckDB crossing-parity test against one polygon, all-integer:
    an upward/downward edge crossing flips parity iff the point is
    strictly left of the edge at its own latitude — the division-free
    form t = (px−x1)·dy − (x2−x1)·(py−y1) with sign(dy)."""
    edges = _edges_sql(poly)
    return f"""(
        SELECT COUNT(*) % 2 = 1 FROM (VALUES {edges}) e(x1, y1, x2, y2)
        WHERE (y1 > py) <> (y2 > py)
          AND CASE WHEN y2 - y1 > 0
                   THEN (px - x1) * (y2 - y1) - (x2 - x1) * (py - y1) < 0
                   ELSE (px - x1) * (y2 - y1) - (x2 - x1) * (py - y1) > 0
              END
    )"""


@query(
    "geo_point_in_polygon",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(({_SQL_CUST_LON}) * 100 AS BIGINT) AS px,
               CAST(({_SQL_CUST_LAT}) * 100 AS BIGINT) AS py
        FROM customer
    ),
    hits AS (
        SELECT c_custkey, 1 AS polygon_id FROM pts WHERE {_sql_pip(GEO_POLYGONS[1])}
        UNION ALL
        SELECT c_custkey, 2 AS polygon_id FROM pts WHERE {_sql_pip(GEO_POLYGONS[2])}
    )
    SELECT polygon_id, COUNT(*) AS n_inside,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM hits GROUP BY polygon_id
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment (ray casting / crossing parity) —
    the geofencing primitive — evaluated ENTIRELY in integer
    arithmetic: coordinates live on the 0.01-degree grid, so scaling
    by 100 makes points and polygon vertices exact integers and the
    division-free crossing test t = (px−x1)·dy − (x2−x1)·(py−y1)
    decides strictly-left with no float anywhere.  Boundary points
    resolve by the half-open rule identically in both engines because
    every comparison is integer.

    Plan: the polygon edge list is a literal array folded per point
    with F.aggregate (scan-stage codegen, no join, no UDF); each
    polygon is one fold, the rollup is one tiny groupBy.  At 100 TB
    with many polygons the production shape adds the grid-cell
    blocking of geo_radius_join (points probe only polygons whose
    bounding box shares a cell) — the per-pair test stays this
    fold."""
    c = _cust_points(spark, sf_dir)
    pts = c.select(
        "c_custkey",
        (F.col("c_lon") * 100).cast("bigint").alias("px"),
        (F.col("c_lat") * 100).cast("bigint").alias("py"),
    )
    px, py = F.col("px"), F.col("py")
    hits = []
    for pid, poly in GEO_POLYGONS.items():
        n = len(poly)
        edges = F.array(
            *[
                F.struct(
                    F.lit(poly[i][0]).alias("x1"),
                    F.lit(poly[i][1]).alias("y1"),
                    F.lit(poly[(i + 1) % n][0]).alias("x2"),
                    F.lit(poly[(i + 1) % n][1]).alias("y2"),
                )
                for i in range(n)
            ]
        )

        def crossing(e, px=px, py=py):
            dy = e["y2"] - e["y1"]
            t = (px - e["x1"]) * dy - (e["x2"] - e["x1"]) * (py - e["y1"])
            return (
                ((e["y1"] > py) != (e["y2"] > py))
                & F.when(dy > 0, t < 0).otherwise(t > 0)
            ).cast("int")

        parity = F.aggregate(
            edges, F.lit(0), lambda acc, e: acc + crossing(e)
        ) % 2 == 1
        hits.append(
            pts.filter(parity).select(
                "c_custkey", F.lit(pid).alias("polygon_id")
            )
        )
    out = hits[0]
    for h in hits[1:]:
        out = out.unionByName(h)
    return out.groupBy("polygon_id").agg(
        F.count(F.lit(1)).alias("n_inside"),
        F.sum("c_custkey").cast("bigint").alias("key_sum"),
    )
