"""Similarity search over embeddings (SURVEY.md §2-D3).

Three paths, mirroring how ANN systems are actually deployed:

* brute-force top-k — the exact baseline; a broadcast join of the
  (small) query set against the corpus, cosine folded JVM-side.
  Scales linearly with the corpus: at 100 TB the corpus side stays
  partitioned, queries broadcast, and the per-partition top-k +
  final merge is exactly what ``row_number() ≤ k`` compiles to.
* LSH-bucketed (random hyperplanes) — candidates are restricted to
  matching sign-buckets, turning the cross join into an equi-join on
  bucket id.  Recall < 1 by construction (rows-only check + a recall
  test; the brute-force twin is the oracle-checked exact variant).
* IVF (k-means inverted file) — a coarse quantizer assigns corpus
  vectors to cells; queries probe their nprobe nearest cells.  The
  FAISS-style structure, in Spark primitives (rows-only + recall
  test, same reason).
* product quantization (PQ/ADC + exact re-rank) — per-subspace
  codebooks compress vectors 64×; queries rank by distance-table
  lookups, then exactly re-rank a shortlist (rows-only + recall
  test, same reason).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_catalogprovider_glue_spark.functions import cosine, dot, norm, vec_double
from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

N_QUERIES = 10   # vec_id < 10 are the query vectors
TOP_K = 5

# deterministic random hyperplanes for the LSH path (seed fixed so
# every run — and every resumed run — buckets identically)
# Tuned for the testdata's weak cluster structure (top-5 neighbors sit
# at cosine 0.26-0.49, i.e. 60-75 deg): per-plane agreement p ~ 0.6, so
# 4 planes/table -> p^4 ~ 0.13 per table, 8 OR-combined tables ->
# recall ~ 1-(1-0.13)^8 ~ 0.67 (tests assert >= 0.5).  Tight clusters
# (the usual near-dup case) push p toward 1 and recall toward 1 with
# far fewer tables; the knobs trade candidate volume for recall.
LSH_PLANES = 4        # 2^4 = 16 buckets per table
LSH_TABLES = 8        # OR-amplification: union of 8 independent tables
_EMBED_DIM = 64


def _planes(table: int) -> list[list[float]]:
    rng = np.random.default_rng(42 + table)
    return rng.standard_normal((LSH_PLANES, _EMBED_DIM)).round(6).tolist()


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", vec_double(F.col("embedding")).alias("v")
    )


_KMEANS_SAMPLE_CAP = 65536  # FAISS-style: codebooks train on a bounded sample

# ORDER BY md5(vec_id-as-string) — a hash order BOTH engines compute
# identically (md5 of the decimal string of a bigint), so the bounded
# training sample is cross-engine reproducible: the DuckDB oracle
# re-derives the exact same sample, seeds, and (via the pinned Lloyd
# round below) the exact same codebook.  Spark's xxhash64 would be
# cheaper but has no DuckDB twin — md5 runs once per corpus row only
# during index TRAINING, never on the query path.
_SAMPLE_ORDER_SQL = "md5(CAST(vec_id AS VARCHAR)), vec_id"


def _hash_order(df: DataFrame) -> DataFrame:
    return df.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")


def _hash_sample(df: DataFrame, cap: int = _KMEANS_SAMPLE_CAP) -> DataFrame:
    """Deterministic bounded training sample for quantizer fits — the
    FAISS training contract: the codebook fits on a fixed-size sample
    regardless of corpus size, and only the ENCODE step touches the
    full corpus.  ``orderBy(md5(vec_id)).limit(cap)`` keeps a cap-sized
    heap per task and merges — one O(n) corpus scan, no full shuffle —
    and the hash order makes the sample scale-stable AND reproducible
    by the DuckDB oracle (see _SAMPLE_ORDER_SQL).  At 100 TB the cap
    (not the corpus) bounds the training set: 65536 × 64 doubles =
    32 MB."""
    return _hash_order(df).limit(cap)


def _sample_seed_ids(sample: DataFrame, k: int) -> list[int]:
    """The k vec_ids heading the hash-ordered sample — the
    deterministic stand-in for random codebook init (hash order IS a
    uniform draw).  K rows collected: the only driver-side materialization
    in the sample-trained index paths, bounded by k (≤ 256)."""
    return [r.vec_id for r in _hash_order(sample).limit(k).collect()]


def _double_sql(x: float) -> str:
    """Shortest round-trip SQL double literal.  Python ``repr`` emits the
    shortest string that parses back to the same IEEE 754 double, and
    Spark's parser is correctly rounded, so the ``D``-suffixed literal is
    bit-identical to ``F.lit(float(x))``."""
    return repr(float(x)) + "D"


def _double_array_sql(xs) -> str:
    """A ``DOUBLE`` array literal as ONE SQL fragment."""
    return "array(" + ",".join(_double_sql(x) for x in xs) + ")"


def _codebook_lit(centroids: list[list[float]]):
    """The codebook as ONE nested-array literal column.

    Rendered as a single SQL string parsed JVM-side: the expression-API
    form ``F.array(*[F.array(*[F.lit(x) ...]) ...])`` issues one py4j
    round-trip per coordinate — K×D ≈ 1024 driver RPCs per call site,
    measured as ~10k py4j calls dominating sim_topk_ivf's plan-build
    wall.  The parsed Catalyst tree (CreateArray of double Literals) is
    identical either way."""
    return F.expr("array(" + ",".join(_double_array_sql(c) for c in centroids) + ")")


def _d2_table(vcol, centroids: list[list[float]], digits: int | None = None):
    """Array of squared distances from ``vcol`` to every centroid.

    Uses ``transform`` over a nested-array literal rather than k
    unrolled aggregate expressions: the literal payload is the same
    but the tree has ONE fold lambda, so Catalyst analysis + codegen
    is ~2× faster (measured) and the generated function stays small.
    With ``digits`` the fold is rounded — the cross-engine pinning
    discipline (every float op identical to the DuckDB twin's
    list_reduce left fold + ROUND).
    """
    def one(c):
        fold = F.aggregate(
            F.zip_with(vcol, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.round(fold, digits) if digits is not None else fold

    return F.transform(_codebook_lit(centroids), one)


def _argmin_cell(vcol, centroids: list[list[float]], digits: int | None = None):
    """Index (0-based) of the nearest centroid, as a codegen expression:
    an array of squared distances + array_position of its min.  Ties
    resolve to the first (lowest) index — deterministic (the DuckDB
    twin: ROW_NUMBER ordered by (d2 ASC, cid ASC))."""
    d2s = _d2_table(vcol, centroids, digits)
    return (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")


def _d2_sql(a: str, b: str, dims: int) -> str:
    """DuckDB twin of the pinned rounded squared-L2 fold: identical
    operation sequence (left fold over coordinates in order) so the
    doubles come out bit-identical to Spark's F.aggregate."""
    return (
        f"ROUND(list_reduce(list_prepend(0.0, "
        f"list_transform(range(1, {dims} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (x, y) -> x + y), 6)"
    )


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, cos, rank
    FROM (
        SELECT q.vec_id AS query_id,
               c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]), 6) AS cos,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                                         c.embedding::DOUBLE[]), 6) DESC,
                            c.vec_id) AS BIGINT) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ) t WHERE rank <= {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 exact baseline: top-{K} cosine neighbors for each query
    vector.  The query set broadcasts (it's tiny by construction);
    the corpus never shuffles; ranking is per-query-partition."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def _planes_df(spark: SparkSession):
    """All tables' hyperplanes as DATA (32 rows), not as plan literals.

    Inlining planes into expressions would bake tables×planes×dim
    (= 2048 here) double literals into the generated code — megabytes
    of Janino output that stalls JIT and would grow with any index
    parameter.  As a broadcast DataFrame the codegen is one generic
    zip_with/aggregate fold, independent of index size."""
    rows = [
        (t, i, plane)
        for t in range(LSH_TABLES)
        for i, plane in enumerate(_planes(t))
    ]
    return spark.createDataFrame(
        rows, "htable int, plane_idx int, plane array<double>"
    )


def _bucket_assignments(e: DataFrame) -> DataFrame:
    """(vec_id, htable, bucket): sign-bit buckets for every hash table
    in one data-driven pass — corpus × planes broadcast join, then a
    bit-packing aggregation keyed by (vec_id, htable)."""
    spark = e.sparkSession
    scored = e.crossJoin(F.broadcast(_planes_df(spark))).select(
        "vec_id",
        "htable",
        F.when(
            dot(F.col("v"), F.col("plane")) >= 0,
            F.expr("shiftleft(1L, plane_idx)"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("bit"),
    )
    return scored.groupBy("vec_id", "htable").agg(F.sum("bit").alias("bucket"))


_PLANE_VALUES = ", ".join(
    f"({t}, {i}, [{', '.join(repr(float(x)) for x in plane)}])"
    for t in range(LSH_TABLES)
    for i, plane in enumerate(_planes(t))
)


@query(
    "sim_topk_lsh",
    # Full value oracle: the hyperplanes are fixed literals (same 6-dp
    # doubles both engines), the sign test folds the dot product in the
    # identical left-to-right order (Spark aggregate == DuckDB
    # list_reduce), and the exact re-rank mirrors sim_topk_bruteforce's
    # proven cosine/ROUND/row_number idiom — so even the LSH path is
    # value-checked, not rows-only.
    oracle=f"""
    WITH planes(htable, plane_idx, p) AS (VALUES {_PLANE_VALUES}),
    e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    scored AS (
      SELECT vec_id, htable,
             CASE WHEN list_reduce(list_prepend(0.0,
                      list_transform(generate_series(1, {_EMBED_DIM}),
                                     i -> v[i] * p[i])),
                    (a, b) -> a + b) >= 0
                  THEN (CAST(1 AS BIGINT) << plane_idx)
                  ELSE CAST(0 AS BIGINT) END AS bit
      FROM e CROSS JOIN planes
    ),
    buckets AS MATERIALIZED (
      SELECT vec_id, htable, CAST(SUM(bit) AS BIGINT) AS bucket
      FROM scored GROUP BY vec_id, htable
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c
        ON q.htable = c.htable AND q.bucket = c.bucket
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT t.query_id, t.neighbor_id, t.cos,
             ROW_NUMBER() OVER (PARTITION BY t.query_id
                                ORDER BY t.cos DESC, t.neighbor_id) AS rank
      FROM (
        SELECT cd.query_id, cd.neighbor_id,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS cos
        FROM cand cd
        JOIN embeddings a ON a.vec_id = cd.query_id
        JOIN embeddings b ON b.vec_id = cd.neighbor_id
      ) t
    ) WHERE rank <= {TOP_K}
    """,
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 scale path: random-hyperplane LSH.  Each vector lands in one
    sign-bucket per hash table (OR-combined over LSH_TABLES tables);
    candidates = corpus vectors sharing a bucket with a query in any
    table; then exact cosine + top-k on candidates only.

    Plan shape for scale: ONE corpus scan computes all tables' bucket
    ids (posexplode of an array — not a union of per-table scans);
    candidate dedup runs on bare (query_id, neighbor_id) ids so the
    shuffle never carries embedding arrays; vectors are re-attached by
    equi-joins afterwards.  The expensive cross join becomes an
    equi-join on (htable, bucket) — at 100 TB this is the difference
    between 10^14 candidate pairs and ~10^10 — and bucket skew is
    handled by AQE skew splitting."""
    from datafusion_catalogprovider_glue_spark.operators.dedup import _parallelize

    e = _parallelize(_emb(spark, sf_dir), "vec_id")
    buckets = _bucket_assignments(e)
    q = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "htable", "bucket"
    )
    c = buckets.select(F.col("vec_id").alias("neighbor_id"), "htable", "bucket")
    candidates = (
        c.join(F.broadcast(q), ["htable", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        candidates.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


IVF_CELLS = 16        # coarse centroids (k for the k-means quantizer)
IVF_NPROBE = 4        # cells probed per query


def _ivf_sample_oracle() -> str:
    """DuckDB twin of the ENTIRE sample-trained IVF path: hash-ordered
    bounded sample -> hash-order seeds -> one pinned Lloyd round ->
    full-corpus cell assignment -> probe selection -> exact cosine
    rank.  Every float op mirrors the Spark plan (pinned rounded d2
    folds, decimal-grid centroid means), so the key is fully
    value-hashed despite being sample-trained."""
    d2 = lambda a, b: _d2_sql(a, b, _EMBED_DIM)
    return f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ),
    smp AS MATERIALIZED (
        SELECT vec_id, vv FROM v
        ORDER BY {_SAMPLE_ORDER_SQL} LIMIT {_KMEANS_SAMPLE_CAP}
    ),
    c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY {_SAMPLE_ORDER_SQL}) - 1 AS INT)
                   AS cid, vv AS cv
        FROM (SELECT vec_id, vv FROM smp
              ORDER BY {_SAMPLE_ORDER_SQL} LIMIT {IVF_CELLS})
    ),
    m1 AS (
        SELECT vec_id, cid FROM (
            SELECT s.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id
                       ORDER BY {d2("s.vv", "c.cv")} ASC, c.cid) AS rn
            FROM smp s CROSS JOIN c0 c
        ) WHERE rn = 1
    ),
    cm AS (
        SELECT cid, pos,
               CAST(CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) / 1000000.0 AS av
        FROM (SELECT m.cid, unnest(s.vv) AS val,
                     unnest(range(0, len(s.vv))) AS pos
              FROM smp s JOIN m1 m USING (vec_id))
        GROUP BY cid, pos
    ),
    c1 AS (SELECT cid, list(av ORDER BY pos) AS cv FROM cm GROUP BY cid),
    asg AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cid AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY {d2("v.vv", "c.cv")} ASC, c.cid) AS rn
            FROM v CROSS JOIN c1 c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, cell FROM (
            SELECT q.vec_id AS query_id, c.cid AS cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY {d2("q.vv", "c.cv")} ASC, c.cid) AS pr
            FROM (SELECT vec_id, vv FROM v WHERE vec_id < {N_QUERIES}) q
            CROSS JOIN c1 c
        ) WHERE pr <= {IVF_NPROBE}
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(qv.vv, nv.vv), 6) AS cos
        FROM probes p
        JOIN asg a ON a.cell = p.cell
        JOIN v qv ON qv.vec_id = p.query_id
        JOIN v nv ON nv.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
        FROM cand
    ) WHERE rank <= {TOP_K}
    """


@query("sim_topk_ivf", oracle=_ivf_sample_oracle())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 scale path #2: IVF (inverted-file) ANN — the index structure
    FAISS/Milvus-style systems use, built from Spark primitives, with
    the FAISS training contract: the coarse quantizer fits on a
    BOUNDED hash-ordered sample (cap = 65536 regardless of corpus
    size), and only the encode step touches the full corpus.

    Training is one deterministic Lloyd round ON the sample — seeds =
    the first IVF_CELLS sample rows in hash order (hash order is the
    uniform draw), assignment by pinned rounded squared-L2, centroid
    update on the 1e-6 integer grid — so the fit costs O(cap × cells)
    and, unlike an RNG-seeded numpy fit, is reproduced bit-for-bit by
    the DuckDB oracle: this key is fully value-hashed end to end
    (sample, seeds, codebook, cell assignment, probes, ranking).

    Every corpus vector then maps to a cell in ONE whole-stage-codegen
    pass with the K centroids as plan literals (K rows collected — the
    FAISS read-the-trained-index step); each query probes its
    IVF_NPROBE nearest centroids and ranks exact cosine only within
    those cells via an equi-join on cell id.  At 100 TB: training cost
    is fixed by the sample cap, assignment is a map (no shuffle, no
    join), and probe work is proportional to nprobe/cells of the
    corpus.

    Recall on this near-uniform testdata: centroid distances are a
    weak signal (as with LSH); the recall test pins >= 0.5 at nprobe=4
    of 16 cells, i.e. scanning ~25% of the corpus.
    """
    e = _emb(spark, sf_dir).select("vec_id", "v")
    sample = _hash_sample(e)
    seed_ids = _sample_seed_ids(sample, IVF_CELLS)
    cid_map = F.create_map(
        *[F.lit(x) for i, vid in enumerate(seed_ids) for x in (vid, i)]
    )
    seeds = e.filter(F.col("vec_id").isin(seed_ids)).select(
        F.element_at(cid_map, F.col("vec_id")).cast("int").alias("cid"),
        F.col("v").alias("cv"),
    )
    # one Lloyd round on the sample: pinned-d2 assignment to the seeds,
    # then decimal-grid (exact, order-free) centroid means
    m1 = (
        sample.crossJoin(F.broadcast(seeds))
        .select("vec_id", "cid", _d2_pinned(F.col("v"), F.col("cv")).alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"))
    )
    coords = sample.join(m1, "vec_id").select(
        "cid", F.posexplode("v").alias("pos", "val")
    )
    cm = coords.groupBy("cid", "pos").agg(
        (
            F.sum(F.round(F.col("val") * 1000000.0).cast("long")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0)
        ).alias("av")
    )
    c1 = cm.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "av"))), lambda t: t["av"]
        ).alias("cv")
    )
    # the trained codebook: K tiny rows -> plan literals (the FAISS
    # "load the trained index" step; bounded by IVF_CELLS, not data)
    cents = sorted(c1.collect(), key=lambda r: r.cid)
    centroids = [list(r.cv) for r in cents]
    cid_arr = F.expr("array(" + ",".join(str(int(r.cid)) for r in cents) + ")")

    # Index BUILD is a materialization step (FAISS writes the inverted
    # file to disk; here localCheckpoint pins the assignment).  Without
    # it the 16-centroid argmin expression is re-inlined into all three
    # downstream plan branches (queries, probes, corpus) and Catalyst
    # planning time dominates the tiny probe job.
    assigned = e.select(
        "vec_id",
        "v",
        F.element_at(
            cid_arr, _argmin_cell(F.col("v"), centroids, digits=6) + 1
        ).alias("cell"),
    ).localCheckpoint()

    # per query: nprobe nearest centroids (tiny: n_queries x cells)
    q = assigned.filter(F.col("vec_id") < N_QUERIES)
    cell_dists = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.posexplode(_d2_table(F.col("v"), centroids, digits=6)).alias(
            "pos", "d2"
        ),
    ).select(
        "query_id", "qv", "d2", F.element_at(cid_arr, F.col("pos") + 1).alias("cell")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cell"))
    probes = (
        cell_dists.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= IVF_NPROBE)
        .select("query_id", "qv", "cell")
    )

    c = assigned.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cell")
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# embedding column maintenance ops (feed the similarity paths above)
# ---------------------------------------------------------------------------


@query(
    "embedding_normalize",
    oracle="""
    SELECT vec_id,
           unnest(range(0, len(embedding))) AS pos,
           unnest(list_transform(
               CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_reduce(
                   list_prepend(0.0, list_transform(CAST(embedding AS DOUBLE[]),
                                                    y -> y * y)),
                   (a, b) -> a + b))
           )) AS nval
    FROM embeddings
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize the embedding column (the prep step before cosine
    becomes a plain dot product).  Pure JVM higher-order functions
    (transform/aggregate) — row-local, no shuffle, whole-stage
    codegen; the left-to-right fold order matches DuckDB's
    list_reduce, so doubles are bit-identical with no rounding.  The
    normalized vector is emitted as (vec_id, pos, nval) scalar rows
    (posexplode / zipped unnest) — the gate hashes scalars, and the
    row form is also what a feature-store sink ingests."""
    from datafusion_catalogprovider_glue_spark.functions import let

    e = _emb(spark, sf_dir)
    # the norm fold is LET-BOUND (functions.let): captured inside the
    # divide lambda it would re-fold the whole vector per element
    nvec = let(
        F.sqrt(
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        lambda nrm: F.transform(F.col("v"), lambda x: x / nrm),
    )
    return e.select(
        "vec_id", F.posexplode(nvec).alias("pos", "nval")
    ).withColumn("pos", F.col("pos").cast("long"))


@query(
    "embedding_centroid",
    oracle="""
    WITH e AS (
        SELECT label,
               unnest(CAST(embedding AS DOUBLE[])) AS val,
               unnest(range(0, len(embedding))) AS pos
        FROM embeddings
    )
    SELECT label, pos,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS VARCHAR) AS DOUBLE)
             / COUNT(val) / 1000000.0 AS av
    FROM e GROUP BY label, pos
    """,
)
def embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector (the k-means update step / class
    prototype), emitted as (label, pos, n_vectors, av) scalar rows —
    the coordinate form a downstream assign-step joins on, and the
    only form the correctness gate can hash.  posexplode → grouped
    exact-decimal mean per (label, dimension).  The explode multiplies
    rows by dim (64×) but each is 3 narrow columns, and the
    aggregation is map-side combined on (label, pos) — at 100 TB this
    beats collecting vectors: state is one accumulator per (label,
    pos), never a vector buffer.  Means use exact decimal sums, so
    centroids are bit-identical across engines/partitionings."""
    e = _emb(spark, sf_dir)
    exploded = e.select("label", F.posexplode(F.col("v")).alias("pos", "val"))
    return (
        exploded.withColumn("pos", F.col("pos").cast("long"))
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            # Mean over a 1e-6 integer grid: round(val*1e6) breaks .5
            # ties away-from-zero in BOTH engines (Spark HALF_UP ==
            # DuckDB std::round on the same product double), the
            # integer SUM is exact and order-free, and the two final
            # divides are correctly-rounded in a pinned order.  The
            # previous double->DECIMAL(18,9) cast hit the engines'
            # DIFFERENT tie rules on vals that are exact 10-digit
            # decimals (found at sf0.1).
            (
                F.sum(F.round(F.col("val") * 1000000.0).cast("long")).cast("double")
                / F.count("val")
                / F.lit(1000000.0)
            ).alias("av"),
        )
    )


@query(
    "embedding_quantize",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    s AS (
        SELECT vec_id, v,
               list_aggregate(list_transform(v, x -> abs(x)), 'max') AS amax
        FROM v
    )
    SELECT vec_id, amax / 127.0 AS scale,
           unnest(range(0, len(v))) AS pos,
           unnest(CASE WHEN amax = 0.0 THEN list_transform(v, x -> 0)
                ELSE list_transform(v, x -> CAST(round(x / (amax / 127.0)) AS INT))
           END) AS qv
    FROM s
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 family: symmetric int8 scalar quantization per vector — the
    standard 4× shrink before an ANN index or a feature store write.
    Row-local and zero-shuffle: scale = max|x| / 127, q = round(x /
    scale), all in JVM higher-order functions (transform / array_max),
    so the 100 TB plan is a pure map stage that pipelines with the
    scan.  All-zero vectors keep scale 0 and quantize to zeros instead
    of dividing by zero.  Determinism: divide and round are
    exactly-rounded IEEE ops with identical formula text on both
    engines; both engines round halves away from zero, and the int
    cast is exact because round() already produced an integral.  The
    code vector is emitted as (vec_id, scale, pos, qv) scalar rows
    (posexplode / zipped unnest) for the hash gate.

    amax is LET-BOUND (functions.let): captured inside the quantize
    lambda it would re-scan the whole vector per element — 64×64 ops
    per row instead of 64 (the interpreted-HOF capture pathology)."""
    from datafusion_catalogprovider_glue_spark.functions import let

    e = _emb(spark, sf_dir)

    def _quant(amax):
        q = F.when(
            amax == 0.0, F.transform(F.col("v"), lambda x: F.lit(0))
        ).otherwise(
            F.transform(
                F.col("v"),
                lambda x: F.round(x / (amax / 127.0)).cast("int"),
            )
        )
        return F.struct((amax / 127.0).alias("scale"), q.alias("q"))

    sq = let(
        F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))), _quant
    )
    return (
        e.select("vec_id", sq.alias("_s"))
        .select(
            "vec_id",
            F.col("_s.scale").alias("scale"),
            F.posexplode("_s.q").alias("pos", "qv"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
    )


@query(
    "embedding_dim_stats",
    oracle="""
    WITH e AS (
        SELECT unnest(CAST(embedding AS DOUBLE[])) AS val,
               unnest(range(0, len(embedding))) AS dim
        FROM embeddings
    )
    SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS VARCHAR) AS DOUBLE)
             / COUNT(val) / 1000000.0 AS mean_val,
           MIN(val) AS min_val, MAX(val) AS max_val
    FROM e GROUP BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 family: per-dimension corpus statistics (mean / min / max) —
    the profile a pipeline needs before whitening, clipping, or
    choosing quantization ranges.  posexplode fans each vector into
    (dim, val) pairs; the aggregation is map-side combined on the
    64-value dim domain, so the shuffle carries 64 accumulator rows
    per map task regardless of corpus size — this is the
    no-vector-buffer pattern from embedding_centroid, global instead
    of per-label.  Means use the same 1e-6 integer-grid sum as
    embedding_centroid (tie-free quantization, exact order-free
    integer sum, pinned divides), so stats hash-match under any
    partitioning AND any engine."""
    e = _emb(spark, sf_dir)
    ex = e.select(F.posexplode(F.col("v")).alias("dim", "val")).withColumn(
        "dim", F.col("dim").cast("long")
    )
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("val") * 1000000.0).cast("long")).cast("double")
            / F.count("val")
            / F.lit(1000000.0)
        ).alias("mean_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@query(
    "sim_range_search",
    oracle="""
    SELECT a.vec_id AS query_id, b.vec_id AS match_id,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a
    JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.35
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search — ALL pairs above a similarity threshold, the
    complement of top-k (top-k bounds output per query; range search
    bounds quality).  This is the primitive behind near-dup pair
    mining at a fixed similarity bar and radius-based clustering.
    (The bar is 0.35 because the synthetic corpus has weak cluster
    structure — within-label cosines top out near 0.47; a production
    near-dup bar sits at 0.9+ with the identical plan.)
    Same IVF-style label blocking as dedup_embedding_nn (a pair join
    is quadratic without a blocking key), canonical a < b orientation
    halves the candidate set, and the cosine is rounded to 6 decimals
    BEFORE thresholding so the boundary set is identical on both
    engines.  At 100 TB the label blocks come from a coarse quantizer
    (sim_topk_ivf's k-means) and hot blocks lean on AQE skew
    splitting — same playbook as the dedup family."""
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("query_id"), F.col("label"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("match_id"), F.col("label").alias("lb"), F.col("v").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("query_id") < F.col("match_id")))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.35)
        .select("query_id", "match_id", "cos")
    )


# --- random projection (JL) -------------------------------------------------

_RP_OUT_DIM = 16


def _rp_signs() -> list[list[float]]:
    """Deterministic ±1 sign matrix (16 × 64) for the Johnson-
    Lindenstrauss sign projection: the parity of the first md5 byte of
    "j_i".  Hash-derived (not a linear pattern — a (-1)^(i+j) grid
    would make output dims pairwise identical up to sign) and
    reproducible everywhere, so the identical literals are inlined in
    the Spark plan AND the DuckDB oracle text."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{j}_{i}".encode()).digest()[0] % 2 == 0 else -1.0
            for i in range(_EMBED_DIM)
        ]
        for j in range(_RP_OUT_DIM)
    ]


def _rp_sql_values() -> str:
    """The sign matrix as VALUES rows — a 16-row table the planner
    materializes ONCE.  (Indexing a nested literal-list expression
    inside the per-element lambda instead re-built the 1024-literal
    matrix per element: measured 253 s vs 0.05 s at 500 rows.)"""
    return ", ".join(
        f"({j + 1}, [" + ", ".join(f"{x:.1f}" for x in row) + "])"
        for j, row in enumerate(_rp_signs())
    )


@query(
    "embedding_random_projection",
    oracle=f"""
    WITH m AS (SELECT * FROM (VALUES {_rp_sql_values()}) t(j, signs))
    SELECT e.vec_id, e.label, CAST(m.j AS BIGINT) AS j,
           round(list_reduce(
             list_prepend(0.0, list_transform(range(1, {_EMBED_DIM} + 1), i ->
               CAST(e.embedding[i] AS DOUBLE) * m.signs[i])),
             (a, b) -> a + b) / 4.0, 6) AS pj
    FROM embeddings e CROSS JOIN m
    """,
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3i: Johnson-Lindenstrauss sign random projection, 64 → 16 dims
    (Achlioptas 2003: ±1 entries preserve pairwise distances in
    expectation) — the cheap dimensionality-reduction pre-step before
    ANN indexing or clustering, shrinking every downstream distance
    computation 4×.

    Row-local JVM higher-order folds with the sign matrix UNROLLED —
    one ``zip_with``+``aggregate`` per output dim against that dim's
    literal sign row — zero shuffle, whole-stage codegen, no Python.
    (The tempting 2-D form — ``transform`` over j with nested
    ``element_at(element_at(signs, j), i)`` — re-evaluates the nested
    array construction per element: 3.7× slower measured.)  The fold
    is left-to-right in both engines (Spark ``aggregate`` / DuckDB
    ``list_reduce`` over ``list_prepend``), scaled by 1/√16, rounded
    once to 6 dp → the projected coordinates hash-match cross-engine.
    Emitted as (vec_id, label, j, pj) scalar rows — one row per output
    dimension — because the hash gate cannot canonicalize array
    columns.  At 100 TB this pipelines with the scan; the sign matrix
    is O(dims²) driver-side metadata, never data.
    """
    e = _emb(spark, sf_dir)

    def _pj(row: list[float]):
        # one parsed SQL fragment per sign row (not 64 F.lit py4j calls)
        lit = F.expr(_double_array_sql(row))
        return F.round(
            F.aggregate(
                F.zip_with(F.col("v"), lit, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / 4.0,
            6,
        )

    proj = F.array(*[_pj(row) for row in _rp_signs()])
    return e.select(
        "vec_id", "label", F.posexplode(proj).alias("pos", "pj")
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("long").alias("j"),
        "pj",
    )


# --- product quantization ---------------------------------------------------

PQ_SUBSPACES = 4   # 64 dims → 4 × 16-dim subspaces


def _pq_d2_sql(a: str, b: str) -> str:
    return _d2_sql(a, b, PQ_SUBDIM)


def _pq_d2_raw_sql(a: str, b: str) -> str:
    """UNROUNDED pinned fold — for the maxmin seed chain, where both
    engines produce bit-identical doubles (left fold in coordinate
    order) and compare them raw."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(range(1, {PQ_SUBDIM} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (x, y) -> x + y)"
    )
PQ_SUBDIM = _EMBED_DIM // PQ_SUBSPACES
PQ_CODEBOOK = 16   # centroids per subspace → 4 bytes/vector total
PQ_SHORTLIST = 40  # ADC candidates per query fed to the exact re-rank


def _pq_sample_oracle() -> str:
    """DuckDB twin of the ENTIRE sample-trained PQ path: L2
    normalization -> hash-ordered bounded sample -> hash-order seeds
    -> per-subspace pinned Lloyd round -> full-corpus encoding ->
    per-query d2 lookup tables -> ascending-ADC shortlist -> exact
    cosine re-rank.  Same pinning discipline as _pq_flat_oracle, plus
    the normalization fold (list_transform + left-fold list_reduce in
    the same op order as Spark's F.aggregate) and the reproducible
    md5 sample order."""
    parts = [
        "WITH v AS MATERIALIZED (\n"
        "    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings\n"
        "),\n"
        "nrm AS MATERIALIZED (\n"
        "    SELECT vec_id, list_transform(vv, x -> x / sqrt(\n"
        "        list_reduce(list_prepend(0.0, list_transform(vv, y -> y * y)),\n"
        "                    (a, b) -> a + b))) AS nv\n"
        "    FROM v\n"
        "),\n"
        f"smp AS MATERIALIZED (\n"
        f"    SELECT vec_id, nv FROM nrm\n"
        f"    ORDER BY {_SAMPLE_ORDER_SQL} LIMIT {_KMEANS_SAMPLE_CAP}\n"
        f")"
    ]
    for s in range(PQ_SUBSPACES):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        d2 = _pq_d2_sql("sv", "cv")
        # farthest-point (maxmin) seed chain — replays
        # _maxmin_seeds_subs step for step: seed 0 = head of the hash
        # order, then k-1 rounds of (argmax running-min-d2, tie to the
        # smaller vec_id) with the same LEAST(pinned d2) update
        # every step CTE is MATERIALIZED: w{{i-1}} is referenced twice
        # (by sd{{i}} and w{{i}}), so un-materialized inlining would
        # blow up 2^k
        maxmin = [f"""
    sub{s} AS MATERIALIZED (SELECT vec_id, nv[{lo}:{hi}] AS sv FROM nrm),
    smp{s} AS MATERIALIZED (SELECT vec_id, nv[{lo}:{hi}] AS sv FROM smp),
    sd{s}_0 AS MATERIALIZED (SELECT sv AS cv FROM smp{s}
                ORDER BY {_SAMPLE_ORDER_SQL} LIMIT 1),
    w{s}_0 AS MATERIALIZED (SELECT w.vec_id, w.sv,
                        {_pq_d2_raw_sql("w.sv", "c.cv")} AS m
               FROM smp{s} w CROSS JOIN sd{s}_0 c)"""]
        for i in range(1, PQ_CODEBOOK):
            maxmin.append(f"""
    sd{s}_{i} AS MATERIALIZED (SELECT sv AS cv FROM w{s}_{i - 1}
                  ORDER BY m DESC, vec_id LIMIT 1),
    w{s}_{i} AS MATERIALIZED (SELECT w.vec_id, w.sv,
                        LEAST(w.m, {_pq_d2_raw_sql("w.sv", "c.cv")}) AS m
                 FROM w{s}_{i - 1} w CROSS JOIN sd{s}_{i} c)""")
        seed_union = "\n        UNION ALL ".join(
            f"SELECT CAST({i} AS INT) AS cid, cv FROM sd{s}_{i}"
            for i in range(PQ_CODEBOOK)
        )
        parts.append(",".join(maxmin) + f""",
    c0_{s} AS (
        {seed_union}
    ),
    m1_{s} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY {d2} ASC, cid) AS rn
            FROM smp{s} CROSS JOIN c0_{s}
        ) WHERE rn = 1
    ),
    cm_{s} AS (
        SELECT cid, pos,
               CAST(CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) / 1000000.0 AS av
        FROM (SELECT m.cid, unnest(sv) AS val, unnest(range(0, len(sv))) AS pos
              FROM smp{s} JOIN m1_{s} m USING (vec_id))
        GROUP BY cid, pos
    ),
    c1_{s} AS (SELECT cid, list(av ORDER BY pos) AS cv FROM cm_{s} GROUP BY cid),
    codes_{s} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY {d2} ASC, cid) AS rn
            FROM sub{s} CROSS JOIN c1_{s}
        ) WHERE rn = 1
    ),
    dt_{s} AS (
        SELECT q.vec_id AS query_id, c.cid, {_pq_d2_sql("q.sv", "c.cv")} AS d2
        FROM (SELECT vec_id, sv FROM sub{s} WHERE vec_id < {N_QUERIES}) q
        CROSS JOIN c1_{s} c
    )""")
    code_joins = " ".join(
        f"JOIN codes_{s} c{s} USING (vec_id)" for s in range(1, PQ_SUBSPACES)
    )
    dt_joins = " ".join(
        f"JOIN dt_{s} ON dt_{s}.cid = n.code{s} "
        f"AND dt_{s}.query_id = dt_0.query_id"
        for s in range(1, PQ_SUBSPACES)
    )
    parts.append(f"""
    codes AS MATERIALIZED (
        SELECT c0.vec_id, c0.cid AS code0,
               {", ".join(f"c{s}.cid AS code{s}" for s in range(1, PQ_SUBSPACES))}
        FROM codes_0 c0 {code_joins}
    ),
    adc AS (
        SELECT dt_0.query_id, n.vec_id AS neighbor_id,
               ((dt_0.d2 + dt_1.d2) + dt_2.d2) + dt_3.d2 AS score
        FROM codes n
        JOIN dt_0 ON dt_0.cid = n.code0
        {dt_joins}
        WHERE n.vec_id <> dt_0.query_id
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score ASC, neighbor_id) AS rn
            FROM adc
        ) WHERE rn <= {PQ_SHORTLIST}
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT s.query_id, s.neighbor_id,
               ROUND(list_cosine_similarity(a.vv, b.vv), 6) AS cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
                    ORDER BY ROUND(list_cosine_similarity(a.vv, b.vv), 6) DESC,
                             s.neighbor_id) AS BIGINT) AS rank
        FROM short s
        JOIN v a ON a.vec_id = s.query_id
        JOIN v b ON b.vec_id = s.neighbor_id
    ) WHERE rank <= {TOP_K}""")
    return ",".join(parts)


@query("sim_topk_pq", oracle=_pq_sample_oracle())
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 scale path #3: product quantization (Jegou et al. 2011) —
    completes the ANN family next to LSH (`sim_topk_lsh`) and IVF
    (`sim_topk_ivf`), with the FAISS training contract: each
    L2-normalized vector splits into 4 subspaces of 16 dims, and the
    per-subspace codebooks fit on a BOUNDED hash-ordered sample (cap
    = 65536 regardless of corpus size) — only ENCODING touches the
    full corpus.  Encoding turns 256 float bytes into FOUR code bytes
    (64x compression); queries rank by asymmetric distance (ADC): a
    per-query 4x16 lookup table of subspace squared distances, summed
    by code — table lookups and 3 adds per corpus vector, no float
    math against raw vectors at probe time.  The ADC top-PQ_SHORTLIST
    then gets an EXACT cosine re-rank (the FAISS IndexPQ+refine
    topology): full vectors are touched only for shortlist x queries
    rows.

    Training is one deterministic Lloyd round per subspace on the
    sample (farthest-point maxmin seeds — see _maxmin_seeds_subs —
    pinned rounded d2 assignment, decimal-grid centroid means) —
    fused across subspaces in ONE job chain — so unlike an RNG-seeded
    numpy fit the whole path is reproduced bit-for-bit by the DuckDB
    oracle: sample, seed chain, codebooks, codes, ADC shortlist, and
    final ranking are all value-hashed.

    Normalizing first makes L2 order = cosine order, so the recall
    test compares directly against the exact cosine brute force.
    At 100 TB: training cost is fixed by the sample cap; codes are
    built in one encode pass; the probe side broadcasts
    queries+tables (O(queries x 64) doubles) and the corpus never
    shuffles — the same never-move-the-corpus contract as
    `sim_topk_bruteforce`, but the full-corpus pass reads 4-byte
    codes, not 256-byte vectors.
    """
    from datafusion_catalogprovider_glue_spark.functions import let

    e = _emb(spark, sf_dir).select("vec_id", "v")
    # norm LET-BOUND (functions.let): only the bounded sample and the
    # tiny query side read `base` (the corpus encode normalizes inside
    # its Arrow pass), but the capture would still re-fold per element
    base = e.select(
        "vec_id",
        let(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("v"), lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            lambda nrm: F.transform(F.col("v"), lambda x: x / nrm),
        ).alias("nv"),
    )

    def slices(col):
        return F.posexplode(
            F.array(
                *[
                    F.slice(col, s * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for s in range(PQ_SUBSPACES)
                ]
            )
        ).alias("sub", "v")

    subs = base.select("vec_id", slices(F.col("nv")))
    # bounded hash-ordered sample + farthest-point seeds; all 4
    # codebooks train in ONE fused Lloyd round over the sample's
    # subvectors
    sample = _hash_sample(base)
    sub_sample = sample.select("vec_id", slices(F.col("nv"))).localCheckpoint()
    seeds = _maxmin_seeds_subs(sub_sample, PQ_CODEBOOK)
    _, c1 = _kmeans_sub_fused(sub_sample, PQ_CODEBOOK, seeds=seeds)

    # corpus ENCODE (the only full-corpus pass of the index build):
    # one inline-codebook projection, 4 code bytes per vector — no
    # explode, no join, no shuffle (r8; was ~6x superlinear at 10x
    # data through the explode→regroup round trip)
    # localCheckpoint measured FASTER than pipelining the encode into
    # the ADC job (2.6 s vs 4.6 s same-box A/B): materialized 4-byte
    # codes join the four broadcast lookup tables without re-entering
    # the Arrow boundary, and the checkpoint pins a partitioning the
    # ADC stage reuses.  Memory cost is id+4 bytes per vector.
    codes = _encode_codes_inline(
        e, c1, "v", normalize=True
    ).localCheckpoint()
    # per-query d2 lookup tables: queries x K x subspaces (tiny)
    subq = subs.filter(F.col("vec_id") < N_QUERIES)
    dt = subq.join(F.broadcast(c1), "sub").select(
        F.col("vec_id").alias("query_id"),
        "sub",
        "cid",
        _d2_pinned(F.col("v"), F.col("cv")).alias("d2"),
    ).localCheckpoint()
    dts = [
        dt.filter(F.col("sub") == s).select(
            "query_id",
            F.col("cid").alias(f"code{s}"),
            F.col("d2").alias(f"d2_{s}"),
        )
        for s in range(PQ_SUBSPACES)
    ]

    adc = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        *[f"code{s}" for s in range(PQ_SUBSPACES)],
    ).join(F.broadcast(dts[0]), "code0")
    for s in range(1, PQ_SUBSPACES):
        adc = adc.join(F.broadcast(dts[s]), ["query_id", f"code{s}"])
    score = (
        (F.col("d2_0") + F.col("d2_1")) + F.col("d2_2")
    ) + F.col("d2_3")
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("neighbor_id")
    )
    shortlist = (
        adc.filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("adc_rank", F.row_number().over(w_adc))
        .filter(F.col("adc_rank") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank of the ADC shortlist (the FAISS IndexPQ+refine
    # topology): full vectors touched only for shortlist x queries rows
    qv = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )




@query(
    "embedding_whiten",
    # Stats come from exact integer-grid sums (the embedding_dim_stats
    # technique); every later step is a correctly-rounded double op in
    # a pinned order, so the whitened values are bit-identical across
    # engines with NO output rounding step at all.
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT vec_id,
             unnest(list_transform(CAST(embedding AS DOUBLE[]),
                                   x -> CAST(round(x * 1000000.0) AS BIGINT))) AS si,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    st AS MATERIALIZED (
      SELECT dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(si) AS BIGINT) AS s1,
             CAST(SUM(CAST(si AS DECIMAL(38,0)) * si) AS DECIMAL(38,0)) AS s2
      FROM e GROUP BY dim
    ),
    par AS (
      SELECT dim,
             CAST(s1 AS DOUBLE) / n / 1000000.0 AS mu,
             CAST(s2 AS DOUBLE) / n / 1000000000000.0 AS ex2
      FROM st
    )
    SELECT e.vec_id, e.dim,
           (CAST(e.si AS DOUBLE) / 1000000.0 - p.mu)
             / (CASE WHEN p.ex2 - p.mu * p.mu > 0.0
                     THEN sqrt(p.ex2 - p.mu * p.mu) ELSE 1.0 END) AS wval
    FROM e JOIN par p USING (dim)
    """,
)
def embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension whitening (standardize to mean 0 / stddev 1) —
    the preprocessing step the `embedding_dim_stats` profile exists
    for, applied: (x - mu_d) / sigma_d per coordinate, constant
    dimensions passed through (sigma := 1).

    Determinism, engineered: values quantize to the 1e-6 integer grid
    (round ties break away-from-zero in both engines), first and
    second moments are EXACT integer/decimal sums (order-free under
    any partitioning; the si^2 sum is DECIMAL(38,0) — at 100 TB row
    counts a bigint would overflow), and mu / sigma / the whitened
    value are correctly-rounded double ops in a pinned evaluation
    order — so the output needs no rounding step and still
    hash-matches bit-for-bit.

    Plan: one posexplode + a map-side-combined agg over the 64-dim
    domain (64 accumulator rows per task, no vector buffers), stats
    broadcast back, whitening itself in the scan's codegen stage.
    """
    e = _emb(spark, sf_dir)
    si_arr = F.transform(
        F.col("v"), lambda x: F.round(x * 1000000.0).cast("long")
    )
    ex = e.select("vec_id", F.posexplode(si_arr).alias("dim", "si")).withColumn(
        "dim", F.col("dim").cast("long")
    )
    st = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("si").alias("s1"),
        F.sum(F.col("si").cast("decimal(38,0)") * F.col("si")).alias("s2"),
    )
    par = st.select(
        "dim",
        (F.col("s1").cast("double") / F.col("n") / F.lit(1000000.0)).alias("mu"),
        (F.col("s2").cast("double") / F.col("n") / F.lit(1000000000000.0)).alias(
            "ex2"
        ),
    )
    var = F.col("ex2") - F.col("mu") * F.col("mu")
    sigma = F.when(var > 0.0, F.sqrt(var)).otherwise(F.lit(1.0))
    return (
        ex.join(F.broadcast(par), "dim")
        .select(
            "vec_id",
            "dim",
            ((F.col("si").cast("double") / F.lit(1000000.0) - F.col("mu")) / sigma).alias(
                "wval"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means + SemDeDup-style semantic dedup
# ---------------------------------------------------------------------------

# Coarse-cluster count for the oracle-checkable Lloyd pass.  This is
# the SemDeDup cost knob: within-cluster pair work is O(n^2/K), so K
# grows with the corpus (FAISS rule of thumb: K ~ sqrt(n)).  32 ~=
# sqrt(5000) at bench scale; the assignment cross join stays broadcast
# (K rows) for any K below ~1M.
KMEANS_K = 32

def _kmeans_oracle_body(k: int) -> str:
    """The one-Lloyd-round CTE chain (seed → assign → grid-mean update
    → re-assign), parameterized on K so the SemDeDup pass (K=32) and
    the IVF quantizer (K=16) share one source of truth."""
    return f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ),
    c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, vv AS cv
        FROM (SELECT vec_id, vv FROM v ORDER BY vec_id LIMIT {k})
    ),
    a1 AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY ROUND(list_cosine_similarity(vv, cv), 6) DESC, cid) AS rn
        FROM v CROSS JOIN c0
    ),
    m1 AS (SELECT vec_id, cid FROM a1 WHERE rn = 1),
    coords AS (
        SELECT m1.cid, unnest(vv) AS val, unnest(range(0, len(vv))) AS pos
        FROM v JOIN m1 USING (vec_id)
    ),
    cm AS (
        SELECT cid, pos,
               CAST(CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) / 1000000.0 AS av
        FROM coords GROUP BY cid, pos
    ),
    c1 AS (SELECT cid, list(av ORDER BY pos) AS cv FROM cm GROUP BY cid),
    a2 AS (
        SELECT vec_id, cid, ROUND(list_cosine_similarity(vv, cv), 6) AS cos,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY ROUND(list_cosine_similarity(vv, cv), 6) DESC, cid) AS rn
        FROM v CROSS JOIN c1
    ),
    asg AS (SELECT vec_id, cid AS cluster, cos FROM a2 WHERE rn = 1)
"""


_KMEANS_ORACLE_BODY = _kmeans_oracle_body(KMEANS_K)


# Index-build cache: (session id, sf_dir, k) → (assignment, centroids).
# A clustering is an INDEX — FAISS trains once and every consumer
# (assignment lookups, SemDeDup, IVF probing) reuses the artifact.  The
# operators sharing one Spark session get the same reuse here: the
# first caller pays the Lloyd round (embedding_kmeans measures exactly
# that cost in the bench), later callers start from the checkpointed
# result the way a pipeline reads a persisted index.  Entries are
# per-session localCheckpoints; the dict stays O(sf_dirs × k values).
_KMEANS_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _kmeans(
    spark: SparkSession, sf_dir: str, k: int = KMEANS_K
) -> tuple[DataFrame, DataFrame]:
    key = (spark.sparkContext.applicationId, sf_dir, k)
    if key not in _KMEANS_CACHE:
        _KMEANS_CACHE[key] = _kmeans_uncached(spark, sf_dir, k)
    return _KMEANS_CACHE[key]


def invalidate_kmeans_cache() -> None:
    """Drop every cached clustering.  REQUIRED before any blanket
    ``unpersist`` of the session's persistent RDDs (bench.py's per-key
    cleanup does one): the cache holds localCheckpointed DataFrames
    whose lineage IS their checkpoint blocks — free the blocks under a
    live entry and the next consumer dies with
    checkpointRDDBlockIdNotFound."""
    _KMEANS_CACHE.clear()


def _kmeans_uncached(
    spark: SparkSession, sf_dir: str, k: int = KMEANS_K
) -> tuple[DataFrame, DataFrame]:
    """One full Lloyd round of spherical k-means, fully distributed
    and engine-deterministic: seed → assign → decimal-grid centroid
    update → re-assign.  Returns (assignment, centroids): assignment
    is (vec_id, cluster, cos) against the FINAL centroids, centroids
    is the K-row (cid, cv) table those cosines were ranked against.

    Determinism scheme (every float op happens identically in the
    DuckDB oracle): assignment ranks ROUND(cosine, 6) with ties broken
    by cluster id; centroid means run on a 1e-6 integer grid (exact,
    partitioning-free — the embedding_centroid trick); centroid
    vectors are rebuilt in pos order so the cosine fold visits
    coordinates in the same sequence on both engines.

    Assignment is ZERO-SHUFFLE (r6; was a broadcast cross join + a
    vec_id re-agg): the K centroids inline as literal arrays into ONE
    projection — per row, the vector norm is computed once (hoisted),
    each centroid's norm CONSTANT-FOLDS at optimization time (norm of
    a literal is foldable), and the argmax is array_position of the
    rounded-cosine array's max (first occurrence == smallest cid, the
    same tie-break as the oracle's ROW_NUMBER).  Per n·K pair that is
    ONE dot fold instead of three, and the n-row exchange + the v⋈m1
    join disappear — at 10× data the wall now scales with the scan,
    not a shuffle (SCALING_r06 target ≤5×).  Collecting K≤256
    centroid rows to build the literals is metadata-sized, the same
    class as every broadcast seed table."""
    v = _emb(spark, sf_dir).select("vec_id", "v")
    # Seeds: the k smallest vec_ids (deterministic, no RNG; at
    # scale swap in k-means|| over a bounded sample — the loop below
    # is unchanged).  The seed table is k rows: metadata.
    seed_rows = [
        [float(x) for x in r["v"]]
        for r in v.orderBy("vec_id").limit(k).collect()
    ]

    def assign(centroid_vecs: list[list[float]]) -> DataFrame:
        # Arrow-batched numpy for the RAW folds, JVM for round+argmax.
        # Why not pure-JVM: higher-order-function folds sit outside
        # whole-stage codegen (~5 µs per (vec, centroid) pair — the r5
        # scaling long pole); why numpy is still ORACLE-EXACT: the
        # accumulation below runs COORDINATE-ORDERED (one j-step at a
        # time across the whole batch), so every (row, centroid) pair
        # sees the identical IEEE-754 binary64 op sequence as the
        # JVM/DuckDB left fold — elementwise numpy float64 ops are the
        # same hardware ops, so the raw cosines are bit-equal, and the
        # 6-dp ROUND (the only decimal-semantics op) stays JVM-side.
        # The oracle gate itself pins this path at every scale factor.
        # argmax via array_position(max): ties -> first = smallest
        # cid, matching the oracle's ORDER BY cos DESC, cid.
        import math

        import numpy as np
        import pandas as pd

        def _py_norm(c: list[float]) -> float:
            acc = 0.0
            for x in c:  # left fold, same order as F.aggregate
                acc = acc + x * x
            return math.sqrt(acc)

        cb = np.asarray(centroid_vecs, dtype=np.float64)  # K x d
        ncs = np.asarray(
            [_py_norm(c) for c in centroid_vecs], dtype=np.float64
        )
        n_k, dims = cb.shape

        def _cos_batches(batches):
            for pdf in batches:
                m = len(pdf)
                vv = np.empty((m, dims), dtype=np.float64)
                for i, arr in enumerate(pdf["v"]):
                    vv[i, :] = arr
                dot_acc = np.zeros((m, n_k), dtype=np.float64)
                nv_acc = np.zeros(m, dtype=np.float64)
                for j in range(dims):  # the left fold, vectorized
                    vj = vv[:, j]
                    dot_acc += vj[:, None] * cb[None, :, j]
                    nv_acc += vj * vj
                raw = dot_acc / (np.sqrt(nv_acc)[:, None] * ncs[None, :])
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "v": pdf["v"],
                        "_ca": list(raw),
                    }
                )

        with_raw = v.mapInPandas(
            _cos_batches,
            "vec_id long, v array<double>, _ca array<double>",
        )
        rounded = F.transform(F.col("_ca"), lambda x: F.round(x, 6))
        return (
            with_raw.withColumn("_cr", rounded)
            .select(
                "vec_id",
                "v",
                (
                    F.array_position(F.col("_cr"), F.array_max(F.col("_cr")))
                    - 1
                ).cast("int").alias("cid"),
                F.array_max(F.col("_cr")).alias("cos"),
            )
        )

    m1 = assign(seed_rows)
    # Centroid update: map-side-combined (cid, pos) decimal-grid means,
    # then rebuild the centroid vector in pos order.  State is one
    # accumulator per (cid, pos) — never a vector buffer — so the
    # update step scales to any corpus size.  (The assignment rides
    # along on m1's projection — no join.)
    coords = m1.select("cid", F.posexplode("v").alias("pos", "val"))
    cm = coords.groupBy("cid", "pos").agg(
        (
            F.sum(F.round(F.col("val") * 1000000.0).cast("long")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0)
        ).alias("av")
    )
    c1 = cm.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "av"))), lambda s: s["av"]
        ).alias("cv")
    )
    # Materialize the K-row centroid table once: every consumer (the
    # re-assign here, IVF probe ranking, any caller broadcasting it)
    # would otherwise re-execute the whole seed→assign→update lineage.
    c1 = c1.localCheckpoint()
    c1_rows = [
        [float(x) for x in r["cv"]]
        for r in c1.orderBy("cid").collect()  # K rows: metadata
    ]
    final = assign(c1_rows).select(
        "vec_id", F.col("cid").alias("cluster"), "cos"
    )
    return final, c1


# SemDeDup cost control at scale: the within-cluster pair stage is
# O(n²/K), so K must grow with the corpus to hold cluster size (and
# therefore pair volume per doc) constant.  Above _KMEANS_EXACT_MAX
# vectors the exact oracle-checked Lloyd pass (K = KMEANS_K = 32,
# sized for the gate corpora — n ≤ 2000 at every oracle scale factor)
# gives way to the production path: a codebook trained on the bounded
# hash-ordered sample (the sim_topk_ivf FAISS contract) with
# K = n / _KMEANS_TARGET_CLUSTER, and a BLAS-vectorized assignment
# (mapInPandas, one Arrow batch at a time) — brute-force JVM cosine
# folds at n×K would be the new bottleneck (~5 µs/fold measured).
# The scale path is deterministic for a fixed platform (numpy argmax
# on 6-dp-rounded cosines, ties to the smallest cid) but not pinned
# cross-engine — by construction it never runs on an oracle corpus.
# At 1000-executor scale the remaining escalation is centroid-ANN
# (HNSW over the codebook) once K itself outgrows brute-force.
_KMEANS_EXACT_MAX = 16384
_KMEANS_TARGET_CLUSTER = 500


def _corpus_vec_count(spark: SparkSession, sf_dir: str) -> int:
    key = ("n", spark.sparkContext.applicationId, sf_dir)
    if key not in _KMEANS_CACHE:
        _KMEANS_CACHE[key] = (
            load_table(spark, sf_dir, "embeddings").count(),
            None,
        )
    return _KMEANS_CACHE[key][0]


def _kmeans_scale(
    spark: SparkSession, sf_dir: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """Sample-trained spherical k-means + vectorized assignment — the
    large-corpus path (see the block comment above)."""
    import pandas as pd

    v = _emb(spark, sf_dir).select("vec_id", "v")
    sample = np.array(
        [r.v for r in _hash_sample(v).select("v").collect()]
    )
    k = min(k, len(sample))
    cent = sample[:k].copy()  # hash order IS the uniform seed draw
    for _ in range(2):  # bounded Lloyd rounds on the bounded sample
        cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        asg = np.argmax(np.round(sn @ cn.T, 6), axis=1)
        for c in range(k):
            members = sample[asg == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    cent = np.round(cent, 6)
    cent_norm = np.linalg.norm(cent, axis=1)
    cent_rows = [(int(i), [float(x) for x in cent[i]]) for i in range(k)]
    centroids = spark.createDataFrame(
        cent_rows, "cid int, cv array<double>"
    ).localCheckpoint()

    cmat, cnorm = cent, cent_norm

    def assign_batches(batches):
        for pdf in batches:
            vm = np.stack(pdf["v"].to_numpy())
            vn = np.linalg.norm(vm, axis=1)
            cos = np.round(
                (vm @ cmat.T) / (vn[:, None] * cnorm[None, :]), 6
            )
            best = np.argmax(cos, axis=1)  # first max = smallest cid
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": best.astype("int32"),
                    "cos": cos[np.arange(len(best)), best],
                }
            )

    assignment = v.mapInPandas(
        assign_batches, "vec_id bigint, cluster int, cos double"
    )
    return assignment, centroids


def _kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _corpus_vec_count(spark, sf_dir)
    if n <= _KMEANS_EXACT_MAX:
        return _kmeans(spark, sf_dir)[0]
    k = max(KMEANS_K, n // _KMEANS_TARGET_CLUSTER)
    key = (spark.sparkContext.applicationId, sf_dir, ("scale", k))
    if key not in _KMEANS_CACHE:
        _KMEANS_CACHE[key] = _kmeans_scale(spark, sf_dir, k)
    return _KMEANS_CACHE[key][0]


@query(
    "embedding_kmeans",
    oracle=_KMEANS_ORACLE_BODY + "\n    SELECT vec_id, cluster, cos FROM asg",
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means (one hash-verified Lloyd round):
    the coarse-clustering primitive under IVF indexing, SemDeDup, and
    topic bucketing.  Unlike sim_topk_ivf's sample-trained codebook
    (driver-side numpy over a bounded sample, rows-only check), this
    is the FULLY distributed formulation — assignment is a broadcast
    cross join (centroid table is K rows), the update is one
    map-side-combined aggregation keyed (cluster, pos) — and every
    arithmetic step is mirrored in the DuckDB oracle, so the whole
    clustering loop is value-checked, not just shape-checked.

    100 TB notes: per iteration the corpus is read once, shuffles only
    (cluster, pos, grid-val) triples for the update, and never moves
    vectors through a shuffle for assignment (centroids broadcast).
    More iterations = repeat the two steps; K beyond broadcast size =
    partition centroids by a coarse quantizer first (IVF-HNSW shape).
    """
    # the BUILD key: always re-runs (and refreshes) the index so its
    # bench number is the true construction cost; consumer keys
    # (dedup_semantic, sim_topk_ivf_flat at its own K) read the cached
    # artifact the way a pipeline reads a persisted index
    key = (spark.sparkContext.applicationId, sf_dir, KMEANS_K)
    _KMEANS_CACHE[key] = _kmeans_uncached(spark, sf_dir, KMEANS_K)
    return _KMEANS_CACHE[key][0]


@query(
    "dedup_semantic",
    oracle=_KMEANS_ORACLE_BODY + """,
    v2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    pairs AS (
        SELECT a.cluster,
               a.vec_id AS keep_id, b.vec_id AS dup_id,
               ROUND(list_cosine_similarity(va.vv, vb.vv), 6) AS cos,
               ROW_NUMBER() OVER (PARTITION BY a.cluster
                   ORDER BY ROUND(list_cosine_similarity(va.vv, vb.vv), 6) DESC,
                            a.vec_id, b.vec_id) AS rn
        FROM asg a
        JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN v2 va ON va.vec_id = a.vec_id
        JOIN v2 vb ON vb.vec_id = b.vec_id
    )
    SELECT cluster, keep_id, dup_id, cos, (cos >= 0.5) AS is_near_dup
    FROM pairs WHERE rn = 1
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings coarsely, then
    look for near-duplicates ONLY within a cluster — the blocking that
    makes semantic dedup subquadratic.  Emits each cluster's top
    candidate pair (highest cosine, deterministic tie-break) with the
    prune flag a removal pass would act on; on a corpus with planted
    semantic dups the flagged pairs ARE the removal list (this
    synthetic testdata has near-orthogonal vectors, so the flag shows
    false — value-checked either way).

    Plan shape: k-means assignment (see embedding_kmeans) → self
    equi-join ON cluster — never all-pairs — → per-cluster top-1
    window.  At 100 TB the within-cluster join is the quadratic-in-
    cluster-size step, which SemDeDup bounds by choosing K ∝ corpus
    size (FAISS: sqrt(n) clusters); the plan here inherits that knob
    directly through KMEANS_K.

    The pair stage is ONE ``applyInPandas`` PER CLUSTER (r7; the r6
    plan materialized every within-cluster pair through a self-join +
    JVM fold — ~n·target_size/2 pair rows, the SCALING_r06 long pole):
    each cluster's cosine matrix is computed in-task with the
    COORDINATE-ORDERED j-loop (bit-identical to the
    F.aggregate/DuckDB left fold — the r6 embedding_kmeans scheme),
    and only the pairs within a 2e-6 RAW margin of the cluster's raw
    maximum are emitted — a superset of every pair that can win the
    6-dp-rounded ordering (round is monotone, so a winner's raw value
    is ≥ raw_max − 1e-6).  The 6-dp ROUND (decimal semantics) and the
    deterministic top-1 window stay JVM-side over that tiny candidate
    set.  Pair volume never materializes: the shuffle is one n-row
    exchange keyed by cluster, and per-cluster compute is
    O(size² · d) vectorized adds — row-chunked so a skewed cluster
    streams in bounded memory.
    """
    import numpy as np
    import pandas as pd

    # localCheckpoint: the pair stage re-derives the assignment
    # lineage otherwise — the dedup_clusters trick, ~2x here.
    asg = _kmeans_assign(spark, sf_dir).localCheckpoint()
    v = _emb(spark, sf_dir).select("vec_id", "v")
    a = asg.join(v, "vec_id").select(
        F.col("cluster"), F.col("vec_id"), F.col("v")
    )

    def _top_pairs(pdf):
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {
                    "cluster": pd.Series([], dtype="int32"),
                    "keep_id": pd.Series([], dtype="int64"),
                    "dup_id": pd.Series([], dtype="int64"),
                    "_raw": pd.Series([], dtype="float64"),
                }
            )
        cluster = int(pdf["cluster"].iloc[0])
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)  # ascending ids: row i < row k ⇒ id_i < id_k
        ids = ids[order]
        dims = len(pdf["v"].iloc[0])
        vv = np.empty((m, dims), dtype=np.float64)
        for out_i, src_i in enumerate(order):
            vv[out_i, :] = pdf["v"].iloc[src_i]
        ns_acc = np.zeros(m, dtype=np.float64)
        for j in range(dims):  # the left fold, vectorized
            ns_acc += vv[:, j] * vv[:, j]
        ns = np.sqrt(ns_acc)
        best = -np.inf
        cand: list[tuple[int, int, float]] = []
        CH = 4096  # row-chunk: bounds memory to CH×m doubles
        tmp = np.empty((min(CH, m), m), dtype=np.float64)
        for s0 in range(0, m, CH):
            s1 = min(s0 + CH, m)
            rows = s1 - s0
            blk = np.zeros((rows, m), dtype=np.float64)
            t = tmp[:rows]
            for j in range(dims):  # coordinate-ordered pairwise fold
                cj = vv[:, j]
                np.multiply(cj[s0:s1, None], cj[None, :], out=t)
                blk += t
            np.multiply(ns[s0:s1, None], ns[None, :], out=t)
            raw = np.divide(blk, t, out=blk)
            # mask the non-pairs (k <= i): only i < k survives
            raw[np.arange(m)[None, :] <= np.arange(s0, s1)[:, None]] = -np.inf
            mx = float(raw.max()) if raw.size else -np.inf
            if mx > best:
                best = mx
            for i, k in np.argwhere(raw >= best - 2e-6):
                cand.append((int(i) + s0, int(k), float(raw[i, k])))
        cand = [(i, k, r) for i, k, r in cand if r >= best - 2e-6]
        return pd.DataFrame(
            {
                "cluster": pd.Series([cluster] * len(cand), dtype="int32"),
                "keep_id": pd.Series(
                    [int(ids[i]) for i, _k, _r in cand], dtype="int64"
                ),
                "dup_id": pd.Series(
                    [int(ids[k]) for _i, k, _r in cand], dtype="int64"
                ),
                "_raw": pd.Series([r for _i, _k, r in cand], dtype="float64"),
            }
        )

    pairs = a.groupBy("cluster").applyInPandas(
        _top_pairs, "cluster int, keep_id bigint, dup_id bigint, _raw double"
    ).select(
        "cluster", "keep_id", "dup_id", F.round(F.col("_raw"), 6).alias("cos")
    )
    rw = Window.partitionBy("cluster").orderBy(
        F.col("cos").desc(), F.col("keep_id"), F.col("dup_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") == 1)
        .select(
            "cluster", "keep_id", "dup_id", "cos",
            (F.col("cos") >= 0.5).alias("is_near_dup"),
        )
    )


@query(
    "sim_topk_ivf_flat",
    oracle=_kmeans_oracle_body(IVF_CELLS) + f""",
    probes AS (
        SELECT query_id, cell FROM (
            SELECT q.vec_id AS query_id, c.cid AS cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(q.vv, c.cv), 6) DESC,
                                c.cid) AS pr
            FROM (SELECT vec_id, vv FROM v WHERE vec_id < {N_QUERIES}) q
            CROSS JOIN c1 c
        ) WHERE pr <= {IVF_NPROBE}
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(qv.vv, nv.vv), 6) AS cos
        FROM probes p
        JOIN asg a ON a.cluster = p.cell
        JOIN v qv ON qv.vec_id = p.query_id
        JOIN v nv ON nv.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
        FROM cand
    ) WHERE rank <= {TOP_K}
    """,
)
def sim_topk_ivf_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN with the DETERMINISTIC distributed quantizer: the
    same inverted-file probe topology as sim_topk_ivf, but the coarse
    centroids come from the hash-verified Lloyd round (_kmeans) instead
    of a seeded driver-side sample fit — which makes the ENTIRE index
    path value-checkable: quantizer training, cell assignment, probe
    selection, and the final ranked candidates all hash-match the
    DuckDB twin.  sim_topk_ivf stays as the FAISS-style sample-trained
    production variant (training cost bounded by the sample cap);
    this key is the auditable one.

    Plan shape (identical at any scale): centroids broadcast for
    assignment AND probe ranking (K rows); the inverted file is the
    localCheckpoint'd (vec_id, cell, v) table; candidate generation is
    an equi-join on cell against the broadcast probe list, touching
    nprobe/K of the corpus."""
    # builds its own K=IVF_CELLS quantizer: refresh (not reuse) the
    # cache entry so the bench number includes index construction
    key = (spark.sparkContext.applicationId, sf_dir, IVF_CELLS)
    _KMEANS_CACHE[key] = _kmeans_uncached(spark, sf_dir, IVF_CELLS)
    asg, cents = _KMEANS_CACHE[key]
    v = _emb(spark, sf_dir).select("vec_id", "v")
    corpus = (
        asg.select("vec_id", F.col("cluster").alias("cell"))
        .join(v, "vec_id")
        .localCheckpoint()  # index build: pin, don't re-derive per branch
    )
    q = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ccos = cosine(F.col("qv"), F.col("cv"))
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cell"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", F.col("cid").alias("cell"), ccos.alias("ccos"))
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= IVF_NPROBE)
        .select("query_id", "qv", "cell")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )

# --- deterministic product quantization (full value oracle) -----------------


def _d2_pinned(a, b):
    """Squared L2 distance as a pinned left fold rounded to 6 dp —
    every float op identical to the DuckDB twin (list_reduce over
    list_prepend(0.0, ...))."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _ip_pinned(a, b):
    """Inner product, same pinned-fold + 6 dp discipline."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _maxmin_seeds_subs(sub_sample: DataFrame, k: int) -> DataFrame:
    """Deterministic farthest-point (maxmin) codebook init per
    subspace — the RNG-free stand-in for k-means++ (Gonzalez 1985):
    seed 0 is the head of the hash-ordered sample; each next seed is
    the sample point with the LARGEST pinned-rounded d2 to its nearest
    seed so far (ties to the smaller vec_id).  Measured on the
    testdata this lifts PQ shortlist recall 0.28 -> 0.58 over naive
    hash-order seeds — spreading codewords is what makes a 16-entry
    codebook cover a subspace.

    Runs as ONE applyInPandas job over the sub groups (each group is
    the cap-bounded sample, so executor memory is bounded by the cap,
    never the corpus).  The k sequential argmax steps happen inside
    the Arrow batch in numpy — but with the squared-distance computed
    as a per-dimension LEFT FOLD (sequential IEEE adds in coordinate
    order), NOT numpy's pairwise-summed ``.sum()``, so every double
    is bit-identical to the DuckDB oracle's ``list_reduce`` fold and
    to Spark's ``F.aggregate``.  The maxmin chain compares RAW fold
    values (no rounding — identical bits need no rounding shield);
    ties break on the smaller vec_id in both engines.
    """
    import pandas as pd

    spark = sub_sample.sparkSession

    def fold_d2(X: "np.ndarray", c: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(len(X), dtype=np.float64)
        for d in range(X.shape[1]):
            t = X[:, d] - c[d]
            acc = acc + t * t
        return acc

    def maxmin(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["h", "vec_id"]).reset_index(drop=True)
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        vec_ids = pdf["vec_id"].to_numpy()
        chosen = [0]
        m = fold_d2(X, X[0])
        for _ in range(1, k):
            # argmax of m, ties to the smaller vec_id
            i = int(np.lexsort((vec_ids, -m))[0])
            chosen.append(i)
            m = np.minimum(m, fold_d2(X, X[i]))
        return pd.DataFrame(
            {
                "sub": [int(key[0])] * k,
                "cid": list(range(k)),
                "cv": [X[i].tolist() for i in chosen],
            }
        )

    return (
        sub_sample.select(
            "vec_id", "sub", "v", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .groupBy("sub")
        .applyInPandas(maxmin, "sub int, cid int, cv array<double>")
    )
    # NOT localCheckpoint'd: the seeds have exactly one consumer (the
    # broadcast inside the Lloyd round's assignment join), so pinning
    # them was one extra blocking job per call with nothing reused.


def _encode_codes_inline(
    vecs: DataFrame, centroids: DataFrame, vcol: str,
    normalize: bool = False,
) -> DataFrame:
    """Corpus ENCODE as one Arrow-batched vectorized pass (r8): the
    trained codebooks — K-bounded, PQ_SUBSPACES × PQ_CODEBOOK rows,
    the FAISS "load trained index" step — broadcast inside a
    ``mapInPandas`` closure, and every batch computes all four
    subspace argmins with numpy.  Zero shuffles, zero row fan-out:
    replaces the posexplode → ×K broadcast join → two groupBys round
    trip AND the interpreted higher-order-function fold it was first
    rewritten to (Spark HOFs are CodegenFallback — ~5µs per 16-dim
    lambda fold, 64 folds/vector; the vectorized pass is plain BLAS
    arithmetic).

    Bit-exactness with the DuckDB oracle is engineered, not assumed:
    the squared distance accumulates DIM BY DIM in a python loop of
    vectorized adds — the same left-fold order as _d2_pinned, IEEE
    doubles throughout — then rounds to 6 dp with HALF_UP
    (floor(x·1e6 + 0.5), valid for the non-negative d2; numpy's own
    round() is half-even and would diverge on exact .5 boundaries),
    and np.argmin's first-minimum rule matches the (d2, cid)
    struct-min's ties-to-lower-cid.

    ``normalize=True`` folds the L2 normalization into the same pass
    (sum of squares accumulated dim by dim, sqrt, elementwise divide —
    identical IEEE ops to the JVM expression) — feeding the encoder
    raw vectors instead of a normalize PROJECTION, whose interpreted
    lambda re-evaluated the captured norm fold per element (64×64
    fold-elements per row, the dominant cost of the first rewrite)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    by_sub: dict[int, list] = {}
    for r in centroids.collect():
        by_sub.setdefault(r["sub"], []).append((int(r["cid"]), list(r["cv"])))
    books = []
    for s in range(PQ_SUBSPACES):
        cands = sorted(by_sub[s])
        if [cid for cid, _ in cands] != list(range(len(cands))):
            raise ValueError(
                f"subspace {s} codebook cids are not contiguous: "
                f"{[cid for cid, _ in cands]}"
            )
        books.append(
            np.array([cv for _, cv in cands], dtype=np.float64)
        )

    out_schema = T.StructType(
        [T.StructField("vec_id", T.LongType())]
        + [
            T.StructField(f"code{s}", T.IntegerType())
            for s in range(PQ_SUBSPACES)
        ]
    )

    def _encode(batches):
        for pdf in batches:
            v = np.array(pdf[vcol].tolist(), dtype=np.float64)
            if normalize:
                acc = np.zeros(v.shape[0])
                for d in range(v.shape[1]):  # same left-fold order as
                    acc = acc + v[:, d] * v[:, d]  # the JVM expression
                v = v / np.sqrt(acc)[:, None]
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for s in range(PQ_SUBSPACES):
                sv = v[:, s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]
                book = books[s]
                d2 = np.zeros((sv.shape[0], book.shape[0]))
                for d in range(PQ_SUBDIM):  # left-fold order, per dim
                    diff = sv[:, d:d + 1] - book[None, :, d]
                    d2 = d2 + diff * diff
                d2 = np.floor(d2 * 1e6 + 0.5) / 1e6  # ROUND(x, 6) HALF_UP
                out[f"code{s}"] = np.argmin(d2, axis=1).astype("int32")
            yield pd.DataFrame(out)

    return vecs.select("vec_id", vcol).mapInPandas(_encode, out_schema)


def _encode_subs(subs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every (vec_id, sub) subvector to its nearest codebook
    entry — min of a (pinned-rounded d2, cid) struct, map-side
    combinable, ties to the lower cid.  Shared by codebook training
    (assigning the training set) and corpus ENCODING (assigning
    everything) so both run the exact same float ops as the DuckDB
    oracle's ROW_NUMBER-over-(d2, cid)."""
    pairs = subs.join(F.broadcast(centroids), "sub").select(
        "vec_id", "sub", "cid",
        _d2_pinned(F.col("v"), F.col("cv")).alias("d2"),
    )
    return (
        pairs.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(
            "vec_id", "sub",
            F.col("m.cid").alias("cid"),
            F.col("m.d2").alias("d2"),
        )
    )


def _kmeans_sub_fused(
    subs: DataFrame,
    k: int,
    seed_ids: list[int] | None = None,
    seeds: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One deterministic Lloyd round under the L2 metric over ALL
    subspaces AT ONCE — ``subs`` is the long-form (vec_id, sub, v)
    table, and every stage carries the subspace id as a grouping/join
    key, so the four per-subspace trainings that would otherwise run
    as 4 serial job chains collapse into one (measured ~2× on the
    bench key).  Per subspace: seeds = the k smallest vec_ids'
    subvectors, assignment = min (ROUND(d2,6), cid) as one
    map-side-combinable struct-min, centroid update on the 1e-6
    integer grid, final re-assign.  Returns (assignment(vec_id, sub,
    cid, d2), centroids(sub, cid, cv)) — numerically identical to
    training each subspace separately, which is what the unchanged
    per-subspace DuckDB oracle CTEs verify.

    Seed rules, in precedence order: an explicit ``seeds`` DataFrame
    (sub, cid, cv) — e.g. the maxmin init —, explicit ``seed_ids``
    (cid = position in the list), or the default k smallest vec_ids."""
    if seeds is None:
        if seed_ids is None:
            seed_ids = [
                r.vec_id
                for r in subs.select("vec_id")
                .distinct()
                .orderBy("vec_id")
                .limit(k)
                .collect()
            ]
        cid_map = F.create_map(
            *[F.lit(x) for pair in
              ((vid, idx) for idx, vid in enumerate(seed_ids)) for x in pair]
        )
        seeds = subs.filter(F.col("vec_id").isin(seed_ids)).select(
            "sub",
            F.element_at(cid_map, F.col("vec_id")).cast("int").alias("cid"),
            F.col("v").alias("cv"),
        )

    m1 = _encode_subs(subs, seeds)
    coords = (
        subs.join(m1.select("vec_id", "sub", "cid"), ["vec_id", "sub"])
        .select("sub", "cid", F.posexplode("v").alias("pos", "val"))
    )
    cm = coords.groupBy("sub", "cid", "pos").agg(
        (
            F.sum(F.round(F.col("val") * 1000000.0).cast("long")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0)
        ).alias("av")
    )
    c1 = cm.groupBy("sub", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "av"))), lambda t: t["av"]
        ).alias("cv")
    ).localCheckpoint()
    return _encode_subs(subs, c1), c1


def _pq_ip_sql(a: str, b: str) -> str:
    return (
        f"ROUND(list_reduce(list_prepend(0.0, "
        f"list_transform(range(1, {PQ_SUBDIM} + 1), "
        f"i -> {a}[i] * {b}[i])), (x, y) -> x + y), 6)"
    )


def _pq_flat_oracle() -> str:
    """DuckDB twin of the whole deterministic PQ path: per-subspace
    Lloyd round → codes → per-query IP lookup tables → ADC shortlist
    → exact cosine re-rank."""
    parts = [
        "WITH v AS MATERIALIZED (\n"
        "    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings\n"
        ")"
    ]
    for s in range(PQ_SUBSPACES):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        d2 = _pq_d2_sql("sv", "cv")
        parts.append(f"""
    sub{s} AS MATERIALIZED (SELECT vec_id, vv[{lo}:{hi}] AS sv FROM v),
    c0_{s} AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
               sv AS cv
        FROM (SELECT vec_id, sv FROM sub{s} ORDER BY vec_id LIMIT {PQ_CODEBOOK})
    ),
    m1_{s} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY {d2} ASC, cid) AS rn
            FROM sub{s} CROSS JOIN c0_{s}
        ) WHERE rn = 1
    ),
    cm_{s} AS (
        SELECT cid, pos,
               CAST(CAST(SUM(CAST(round(val * 1000000.0) AS BIGINT)) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) / 1000000.0 AS av
        FROM (SELECT m.cid, unnest(sv) AS val, unnest(range(0, len(sv))) AS pos
              FROM sub{s} JOIN m1_{s} m USING (vec_id))
        GROUP BY cid, pos
    ),
    c1_{s} AS (SELECT cid, list(av ORDER BY pos) AS cv FROM cm_{s} GROUP BY cid),
    codes_{s} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY {d2} ASC, cid) AS rn
            FROM sub{s} CROSS JOIN c1_{s}
        ) WHERE rn = 1
    ),
    dt_{s} AS (
        SELECT q.vec_id AS query_id, c.cid, {_pq_ip_sql("q.sv", "c.cv")} AS ip
        FROM (SELECT vec_id, sv FROM sub{s} WHERE vec_id < {N_QUERIES}) q
        CROSS JOIN c1_{s} c
    )""")
    code_joins = " ".join(
        f"JOIN codes_{s} c{s} USING (vec_id)" for s in range(1, PQ_SUBSPACES)
    )
    dt_joins = " ".join(
        f"JOIN dt_{s} ON dt_{s}.cid = n.code{s} "
        f"AND dt_{s}.query_id = dt_0.query_id"
        for s in range(1, PQ_SUBSPACES)
    )
    parts.append(f"""
    codes AS MATERIALIZED (
        SELECT c0.vec_id, c0.cid AS code0,
               {", ".join(f"c{s}.cid AS code{s}" for s in range(1, PQ_SUBSPACES))}
        FROM codes_0 c0 {code_joins}
    ),
    adc AS (
        SELECT dt_0.query_id, n.vec_id AS neighbor_id,
               ((dt_0.ip + dt_1.ip) + dt_2.ip) + dt_3.ip AS score
        FROM codes n
        JOIN dt_0 ON dt_0.cid = n.code0
        {dt_joins}
        WHERE n.vec_id <> dt_0.query_id
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rn
            FROM adc
        ) WHERE rn <= {PQ_SHORTLIST}
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT s.query_id, s.neighbor_id,
               ROUND(list_cosine_similarity(a.vv, b.vv), 6) AS cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
                    ORDER BY ROUND(list_cosine_similarity(a.vv, b.vv), 6) DESC,
                             s.neighbor_id) AS BIGINT) AS rank
        FROM short s
        JOIN v a ON a.vec_id = s.query_id
        JOIN v b ON b.vec_id = s.neighbor_id
    ) WHERE rank <= {TOP_K}""")
    return ",".join(parts)


@query("sim_topk_pq_flat", oracle=_pq_flat_oracle())
def sim_topk_pq_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN with the DETERMINISTIC distributed quantizer — the
    sim_topk_ivf_flat treatment applied to product quantization, so
    the ENTIRE index path is value-checkable: per-subspace codebook
    training (one L2 Lloyd round, seeds = smallest vec_ids), corpus
    encoding to {PQ_SUBSPACES} code bytes, the per-query inner-product
    lookup tables, the ADC shortlist, and the exact cosine re-rank
    all hash-match the DuckDB twin.  sim_topk_pq stays as the
    FAISS-style sample-trained production variant; this key is the
    auditable one.

    Plan shape (identical at any scale): codebooks are K-row
    broadcasts; encoding is one map over the corpus; the ADC join
    probes broadcast per-query lookup tables against 4-byte codes —
    the corpus never shuffles and full vectors are touched only for
    shortlist × queries rows."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    # long-form subvector table: ONE pass slices all subspaces
    subs = e.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("v", s * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for s in range(PQ_SUBSPACES)
                ]
            )
        ).alias("sub", "v"),
    )
    _asg, c1 = _kmeans_sub_fused(subs, PQ_CODEBOOK)
    # index build: one inline-codebook projection, 4 code bytes per
    # vector (r8 — the lazy _asg re-assign is never materialized; the
    # explode→regroup encode it represented cost two full-corpus
    # shuffles)
    # localCheckpoint measured faster than pipelining the encode into
    # the ADC job (same-box A/B; see sim_topk_pq)
    codes = _encode_codes_inline(e, c1, "v").localCheckpoint()
    subq = subs.filter(F.col("vec_id") < N_QUERIES)
    dt = subq.join(F.broadcast(c1), "sub").select(
        F.col("vec_id").alias("query_id"),
        "sub",
        "cid",
        _ip_pinned(F.col("v"), F.col("cv")).alias("ip"),
    ).localCheckpoint()  # tiny: queries × K × subspaces
    dts = [
        dt.filter(F.col("sub") == s).select(
            "query_id",
            F.col("cid").alias(f"code{s}"),
            F.col("ip").alias(f"ip{s}"),
        )
        for s in range(PQ_SUBSPACES)
    ]

    adc = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        *[f"code{s}" for s in range(PQ_SUBSPACES)],
    ).join(F.broadcast(dts[0]), "code0")
    for s in range(1, PQ_SUBSPACES):
        adc = adc.join(F.broadcast(dts[s]), ["query_id", f"code{s}"])
    score = (
        (F.col("ip0") + F.col("ip1")) + F.col("ip2")
    ) + F.col("ip3")
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    shortlist = (
        adc.filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qv = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


HARD_NEG_CEIL = 0.7   # semi-hard band: similar, but not a true neighbor
HARD_NEG_K = 5


@query(
    "sim_hard_negatives",
    oracle=f"""
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])), 6)
                 AS cos,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(
                                CAST(q.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])), 6) DESC,
                            c.vec_id) AS BIGINT) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERIES}
          AND ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                           CAST(c.embedding AS DOUBLE[])), 6)
              < {HARD_NEG_CEIL}
    ) WHERE rank <= {HARD_NEG_K}
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMI-HARD NEGATIVE MINING for contrastive training (the FaceNet
    recipe): per anchor, the k most-similar corpus vectors BELOW a
    similarity ceiling — close enough to be informative, far enough to
    be true negatives.  Same broadcast-anchors / corpus-never-shuffles
    plan as sim_topk_bruteforce with the ceiling filter fused before
    the ranking window, so the window ranks only the surviving band.
    At 100 TB the scale path swaps the scan for the IVF/LSH candidate
    generators upstream of the identical band-filter + top-k tail."""
    from datafusion_catalogprovider_glue_spark.operators.dedup import _parallelize

    e = _parallelize(_emb(spark, sf_dir), "vec_id")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
        .filter(F.col("cos") < HARD_NEG_CEIL)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= HARD_NEG_K)
    )


_KNN_K = 10


@query(
    "sim_knn_classify",
    oracle=f"""
    WITH ranked AS (
        SELECT q.vec_id AS query_id, q.label AS true_label,
               c.label AS neighbor_label,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(
                                q.embedding::DOUBLE[],
                                c.embedding::DOUBLE[]), 6) DESC,
                            c.vec_id) AS BIGINT) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id >= {N_QUERIES}
        WHERE q.vec_id < {N_QUERIES}
    ),
    votes AS (
        SELECT query_id, true_label, neighbor_label,
               CAST(COUNT(*) AS BIGINT) AS n_votes
        FROM ranked WHERE rank <= {_KNN_K}
        GROUP BY 1, 2, 3
    )
    SELECT query_id, true_label,
           neighbor_label AS predicted_label, n_votes
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY n_votes DESC, neighbor_label) AS vr
        FROM votes
    ) t WHERE vr = 1
    """,
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN CLASSIFICATION — the canonical consumer of similarity
    search: each query vector takes the majority label of its k=10
    nearest corpus neighbors (corpus = the non-query vectors,
    so the vote is held-out).  Ties break to the smallest label;
    neighbor rank ties break on vec_id — both engines see the same
    deterministic ordering because cosine is rounded to 6 dp BEFORE
    ranking (the sim_topk contract).

    Plan shape is the sim_topk_bruteforce one: the query set
    BROADCASTS (bounded by construction), the corpus never shuffles,
    per-query ranking and voting are window + groupBy over
    |queries|×k rows — driver-side nothing.  Swap the scoring join
    for sim_topk_ivf's bucketed shortlist at 100 TB and the voting
    tail is unchanged; that composability is the point of emitting
    ranked shortlists as DataFrames.
    """
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("label").alias("neighbor_label"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "true_label",
        "neighbor_label",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos"),
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    votes = (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= _KNN_K)
        .groupBy("query_id", "true_label", "neighbor_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_votes"))
    )
    vote_w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("neighbor_label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(vote_w))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("neighbor_label").alias("predicted_label"),
            "n_votes",
        )
    )


_SQ8_SHORTLIST = 20  # approximate candidates per query before exact re-rank


@query(
    "sim_topk_sq8",
    oracle=f"""
    WITH dims AS (
        SELECT i,
               MIN(embedding[i]::DOUBLE) AS mn,
               MAX(embedding[i]::DOUBLE) AS mx
        FROM embeddings, range(1, {_EMBED_DIM} + 1) t(i)
        GROUP BY i
    ),
    stats AS (
        SELECT list(mn ORDER BY i) AS mn,
               list(mx ORDER BY i) AS mx,
               list((mx - mn) / 255.0 ORDER BY i) AS stp
        FROM dims
    ),
    codes AS (
        SELECT c.vec_id AS neighbor_id,
               list_transform(range(1, {_EMBED_DIM} + 1), i ->
                   CASE WHEN s.mx[i] = s.mn[i] THEN 0
                        ELSE LEAST(255, CAST(floor(
                            ((c.embedding[i]::DOUBLE - s.mn[i])
                             / (s.mx[i] - s.mn[i])) * 255.0) AS INT))
                   END) AS code
        FROM embeddings c CROSS JOIN stats s
    ),
    approx AS (
        SELECT q.vec_id AS query_id, k.neighbor_id,
               ROUND(list_reduce(list_prepend(0.0,
                   list_transform(range(1, {_EMBED_DIM} + 1), i ->
                       q.embedding[i]::DOUBLE
                       * (s.mn[i] + CAST(k.code[i] AS DOUBLE) * s.stp[i]))),
                   (x, y) -> x + y), 6) AS adot
        FROM embeddings q
        CROSS JOIN stats s
        JOIN codes k ON k.neighbor_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    shortlist AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adot DESC, neighbor_id) AS ar
        FROM approx
    )
    SELECT query_id, neighbor_id, cos, rank
    FROM (
        SELECT sl.query_id, sl.neighbor_id,
               ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]), 6) AS cos,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY sl.query_id
                   ORDER BY ROUND(list_cosine_similarity(
                                q.embedding::DOUBLE[],
                                c.embedding::DOUBLE[]), 6) DESC,
                            sl.neighbor_id) AS BIGINT) AS rank
        FROM shortlist sl
        JOIN embeddings q ON q.vec_id = sl.query_id
        JOIN embeddings c ON c.vec_id = sl.neighbor_id
        WHERE sl.ar <= {_SQ8_SHORTLIST}
    ) t WHERE rank <= {TOP_K}
    """,
)
def sim_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR-QUANTIZED (SQ8) ANN — the FAISS ``SQ8`` index in Spark
    primitives: each corpus vector compresses to one byte per
    dimension against per-dimension [min, max] ranges (4× smaller
    than float32, 8× than float64), queries score candidates with an
    ASYMMETRIC dequantized dot product (query stays full-precision —
    the ADC trick, which roughly halves quantization error vs
    symmetric), and the top-{_SQ8_SHORTLIST} shortlist is re-ranked
    by exact cosine.

    Scale shape: the per-dimension stats are ONE corpus pass whose
    aggregate output is {_EMBED_DIM} rows (map-side combine does the
    heavy lifting), carried as a broadcast single-row frame — never a
    driver collect.  Encoding is row-local codegen; scoring is the
    same broadcast-queries/partitioned-corpus join as
    sim_topk_bruteforce but over BYTES, which is the point: at 100 TB
    the quantized corpus is what fits in memory/SSD, and the exact
    re-rank touches only |queries|×{_SQ8_SHORTLIST} full vectors.
    Everything is deterministic (floor quantization, left-fold dot
    rounded at 6 dp, ties on neighbor_id), so the full pipeline —
    stats, codes, approximate ranking, exact re-rank — hash-matches
    the DuckDB twin."""
    e = _emb(spark, sf_dir)
    dims = (
        e.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    stats = dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s.mn
        ).alias("mn"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s.mx
        ).alias("mx"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))),
            lambda s: (s.mx - s.mn) / F.lit(255.0),
        ).alias("stp"),
    )
    code_expr = F.expr(
        f"""transform(sequence(1, {_EMBED_DIM}), i ->
            CASE WHEN element_at(mx, i) = element_at(mn, i) THEN 0
                 ELSE least(255, cast(floor(
                     ((element_at(v, i) - element_at(mn, i))
                      / (element_at(mx, i) - element_at(mn, i))) * 255.0D)
                     as int))
            END)"""
    )
    codes = (
        e.crossJoin(F.broadcast(stats))
        .select(F.col("vec_id").alias("neighbor_id"), code_expr.alias("code"))
    )
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            "mn",
            "stp",
        )
    )
    adot = F.expr(
        f"""round(aggregate(sequence(1, {_EMBED_DIM}), 0.0D, (acc, i) ->
            acc + element_at(qv, i)
                * (element_at(mn, i)
                   + cast(element_at(code, i) as double) * element_at(stp, i)),
            acc -> acc), 6)"""
    )
    approx = codes.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id", adot.alias("adot"))
    aw = Window.partitionBy("query_id").orderBy(
        F.col("adot").desc(), F.col("neighbor_id")
    )
    shortlist = (
        approx.withColumn("ar", F.row_number().over(aw))
        .filter(F.col("ar") <= _SQ8_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qv = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    cv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    rw = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


_MMR_SHORTLIST = 10
_MMR_PICKS = 3
_MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    lam, om = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 6)
    base = f"""
    WITH shortlist AS MATERIALIZED (
        SELECT query_id, neighbor_id, rel FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]), 6) AS rel,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(
                                    q.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]), 6) DESC,
                                c.vec_id) AS rnk
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ) t WHERE rnk <= {_MMR_SHORTLIST}
    ),
    psim AS MATERIALIZED (
        SELECT a.query_id, a.neighbor_id AS cand, b.neighbor_id AS other,
               ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                            eb.embedding::DOUBLE[]), 6) AS sim
        FROM shortlist a
        JOIN shortlist b
          ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
        JOIN embeddings ea ON ea.vec_id = a.neighbor_id
        JOIN embeddings eb ON eb.vec_id = b.neighbor_id
    ),
    s1 AS (
        SELECT query_id, neighbor_id, rel,
               ROUND({lam} * CAST(rel AS DECIMAL(18,6)), 6)::DOUBLE AS mmr,
               1 AS pick_rank
        FROM (
            SELECT query_id, neighbor_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rel DESC, neighbor_id) AS rn
            FROM shortlist
        ) t WHERE rn = 1
    )"""
    prev_sel = "s1"
    for k in range(2, _MMR_PICKS + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT query_id, neighbor_id FROM s{j}" for j in range(1, k)
        )
        base += f""",
    sel{k} AS (SELECT * FROM ({sel_union})),
    s{k} AS (
        SELECT query_id, neighbor_id, rel, mmr, {k} AS pick_rank
        FROM (
            SELECT c.query_id, c.neighbor_id, c.rel,
                   ROUND({lam} * CAST(c.rel AS DECIMAL(18,6))
                         - {om} * CAST(MAX(p.sim) AS DECIMAL(18,6)),
                         6)::DOUBLE AS mmr,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY ROUND({lam} * CAST(c.rel AS DECIMAL(18,6))
                                      - {om} * CAST(MAX(p.sim)
                                                    AS DECIMAL(18,6)), 6)
                                DESC,
                                c.neighbor_id) AS rn
            FROM shortlist c
            JOIN psim p
              ON p.query_id = c.query_id AND p.cand = c.neighbor_id
            JOIN sel{k} s
              ON s.query_id = p.query_id AND s.neighbor_id = p.other
            WHERE NOT EXISTS (
                SELECT 1 FROM sel{k} x
                WHERE x.query_id = c.query_id
                  AND x.neighbor_id = c.neighbor_id)
            GROUP BY c.query_id, c.neighbor_id, c.rel
        ) t WHERE rn = 1
    )"""
    final = " UNION ALL ".join(
        f"SELECT query_id, neighbor_id, rel, mmr, CAST(pick_rank AS BIGINT)"
        f" AS pick_rank FROM s{j}"
        for j in range(1, _MMR_PICKS + 1)
    )
    return base + f"\n    {final}"


@query("sim_mmr_diversify", oracle=_mmr_oracle())
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE re-ranking — the diversity pass every
    retrieval stack runs after ANN: from each query's
    top-{_MMR_SHORTLIST} shortlist, greedily pick {_MMR_PICKS} results
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked
    (λ={_MMR_LAMBDA}).  Near-duplicate hits collapse to one
    representative; the oracle UNROLLS the greedy selection (the
    graph_pagerank discipline), so every pick — argmax, penalty, tie
    on neighbor_id — is hash-verified.

    Scale shape: relevance scoring is the brute-force broadcast join
    (swap in any ANN shortlist — the composability argument from
    sim_knn_classify); everything after operates on
    |queries|×{_MMR_SHORTLIST} rows: pairwise sims are
    {_MMR_SHORTLIST}² per query, selection rounds are joins over
    picked-set-sized tables.  The greedy loop is K fixed DataFrame
    rounds, never a driver collect."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id")
    )
    shortlist = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("rel"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _MMR_SHORTLIST)
        .select("query_id", "neighbor_id", "rel")
        .localCheckpoint()  # selection rounds reuse it; score once
    )
    sl_vec = shortlist.join(
        e.select(F.col("vec_id").alias("neighbor_id"), "v"), "neighbor_id"
    ).select("query_id", "neighbor_id", "v")
    a = sl_vec.select(
        "query_id", F.col("neighbor_id").alias("cand"), F.col("v").alias("va")
    )
    b = sl_vec.select(
        F.col("query_id").alias("qb"),
        F.col("neighbor_id").alias("other"),
        F.col("v").alias("vb"),
    )
    psim = (
        a.join(
            b,
            (F.col("query_id") == F.col("qb"))
            & (F.col("cand") != F.col("other")),
        )
        .select(
            "query_id",
            "cand",
            "other",
            cosine(F.col("va"), F.col("vb")).alias("sim"),
        )
        .localCheckpoint()
    )
    # λ·rel − (1−λ)·max_sim lives on the EXACT decimal grid: rel/sim
    # are 6-dp-rounded doubles, so casting them to decimal(18,6)
    # recovers the grid value exactly, the λ products are exact
    # scale-7 decimals, and the final 6-dp round is decimal HALF_UP —
    # identical in both engines even on .xxxxxx5 halves (a float
    # ROUND flipped one such cell before this).
    lamd = F.lit(str(_MMR_LAMBDA)).cast("decimal(2,1)")
    omd = F.lit(str(round(1 - _MMR_LAMBDA, 6))).cast("decimal(2,1)")
    first_w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id")
    )
    selected = (
        shortlist.withColumn("rn", F.row_number().over(first_w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "neighbor_id",
            "rel",
            F.round(lamd * F.col("rel").cast("decimal(18,6)"), 6)
            .cast("double")
            .alias("mmr"),
            F.lit(1).alias("pick_rank"),
        )
    )
    for k in range(2, _MMR_PICKS + 1):
        sel_keys = selected.select(
            F.col("query_id").alias("sq"), F.col("neighbor_id").alias("sn")
        )
        mmr = F.round(
            lamd * F.col("rel").cast("decimal(18,6)")
            - omd * F.col("max_sim").cast("decimal(18,6)"),
            6,
        ).cast("double")
        pick_w = Window.partitionBy("query_id").orderBy(
            F.col("mmr").desc(), F.col("neighbor_id")
        )
        next_pick = (
            shortlist.join(
                sel_keys,
                (F.col("query_id") == F.col("sq"))
                & (F.col("neighbor_id") == F.col("sn")),
                "left_anti",
            )
            .join(
                psim.join(
                    sel_keys,
                    (psim.query_id == F.col("sq"))
                    & (psim.other == F.col("sn")),
                    "left_semi",
                ).withColumnRenamed("query_id", "pq"),
                (F.col("pq") == F.col("query_id"))
                & (F.col("cand") == F.col("neighbor_id")),
            )
            .groupBy("query_id", "neighbor_id", "rel")
            .agg(F.max("sim").alias("max_sim"))
            .withColumn("mmr", mmr)
            .withColumn("rn", F.row_number().over(pick_w))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                "rel",
                "mmr",
                F.lit(k).alias("pick_rank"),
            )
        )
        selected = selected.unionByName(next_pick)
    return selected.select(
        "query_id",
        "neighbor_id",
        "rel",
        "mmr",
        F.col("pick_rank").cast("bigint").alias("pick_rank"),
    )
