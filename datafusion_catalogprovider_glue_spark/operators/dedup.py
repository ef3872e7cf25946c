"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2-D1/D2; BASELINE.json north_star).

Six strategies, all shuffle-conscious and collect-free:

* exact (hash-groupBy on full text, and on a 128-bit fingerprint —
  the form that scales: group 16-byte keys, not documents)
* MinHash + LSH banding (shingle → minhash signature → band-bucket
  join → exact-Jaccard verification of candidates only)
* SimHash (60-bit md5-derived signatures, JVM bit ops) + banded
  hamming-radius pair detection (exact within radius, Manku-style)
* word-n-gram Jaccard with length-ratio + log-size-bucket blocking
  (exact, oracle-checkable)
* embedding-cosine nearest neighbor within IVF-style label blocks
* connected-components cluster formation over the pair graph
  (hash-min propagation; keep-one-per-cluster)

100 TB design notes: every pair-generating join goes through a
*blocking key* (LSH band hash, simhash band, lang, label) so the
join is an equi-join Catalyst can shuffle-partition — never an
unblocked cross join.  Banding keys are md5-derived (JVM, codegen'd;
portable so the DuckDB oracles rebuild identical signatures — swap
xxhash64 in for raw throughput and the value checks degrade to
rows-only).  Skewed buckets (a band hash shared by millions of
docs) are handled by AQE skew-join splitting; in production you'd
additionally cap bucket sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_catalogprovider_glue_spark.functions import cosine, let, vec_double
from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

MINHASH_K = 32          # signature length
LSH_BANDS = 8           # bands × rows-per-band = K
LSH_ROWS = MINHASH_K // LSH_BANDS
SHINGLE_WORDS = 3
JACCARD_THRESHOLD = 0.5

# MinHash family over a folded 31-bit base hash: h_i(x) = (a_i*x + b_i)
# mod p with p = 2^31-1 (the same family MLlib's MinHashLSH uses).
# One string hash per shingle + k integer perms — vs k string hashes —
# is the difference between reading a shingle once or k times at 100 TB.
# Coefficients are fixed so signatures are deterministic across runs.
_MERSENNE_PRIME_31 = (1 << 31) - 1
_MASK_31 = (1 << 31) - 1


def _minhash_coeffs(k: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(0x5EED)
    return [
        (rng.randrange(1, _MERSENNE_PRIME_31), rng.randrange(0, _MERSENNE_PRIME_31))
        for _ in range(k)
    ]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return load_table(spark, sf_dir, "documents")


def _parallelize(d: DataFrame, *cols: str) -> DataFrame:
    """Spread rows across the cluster before CPU-heavy per-row compute.

    Our testdata is one single-row-group parquet file per table, so the
    scan stage is one task; anything computed before the first exchange
    would run serially.  A hash repartition on the row key costs one
    small shuffle (keys + text) and buys full-cluster parallelism for
    the shingling/hashing that follows.  On a real multi-file layout
    the scan is already parallel and this coalesces nothing away —
    defaultParallelism partitions of hashed keys are skew-free.
    """
    return d.repartition(d.sparkSession.sparkContext.defaultParallelism, *cols)


@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: exact dedup via hash-groupBy on the full text; keeps the
    smallest doc_id per group (deterministic, unlike dropDuplicates'
    arbitrary pick)."""
    d = _docs(spark, sf_dir)
    return d.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies")


@query(
    "dedup_fingerprint",
    oracle="""
    SELECT md5(lower(text)) AS fingerprint, MIN(doc_id) AS keep_doc,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(lower(text))
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 at scale: dedup on a 128-bit content fingerprint — the
    shuffle moves 16-byte keys instead of documents.  (Normalization
    here is just lowercasing; production adds whitespace/punct
    canonicalization before hashing.)"""
    d = _docs(spark, sf_dir)
    return d.groupBy(F.md5(F.lower("text")).alias("fingerprint")).agg(
        F.min("doc_id").alias("keep_doc"), F.count(F.lit(1)).alias("n_copies")
    )


def _shingles(words_col):
    """Distinct SHINGLE_WORDS-word shingles, computed JVM-side with
    higher-order functions (no Python, no explode until banding).
    ``words_col`` is let-bound so a caller passing split(text) pays
    the split ONCE per row, not once per window (functions.let)."""

    def _body(w):
        n = F.size(w)
        return F.array_distinct(
            F.when(
                n >= SHINGLE_WORDS,
                F.transform(
                    F.sequence(F.lit(1), n - (SHINGLE_WORDS - 1)),
                    lambda i: F.concat_ws(" ", F.slice(w, i, SHINGLE_WORDS)),
                ),
            ).otherwise(F.array(F.concat_ws(" ", w)))
        )

    return let(words_col, _body)


def minhash_signatures(
    d: DataFrame, k: int = MINHASH_K, family: str = "portable"
) -> DataFrame:
    """(doc_id, shingles, sig: array<bigint>[k]) — each shingle is
    string-hashed ONCE (folded to 31 bits), then the k family members
    are integer permutations (a*h+b mod p).  All JVM-side higher-order
    functions; a*h fits in 62 bits so the arithmetic is
    ANSI-overflow-safe.

    Two base-hash families behind the same banding:

    * ``portable`` — md5 prefix folded to 31 bits.  Engine-portable:
      DuckDB recomputes identical signatures, which is what lets
      dedup_minhash_lsh carry a full value oracle.
    * ``fast`` — xxhash64 (one JVM intrinsic per shingle vs an md5 +
      hex-conv chain).  The production default at 100 TB; JVM-only,
      so its gate check is rows-only — pair-set equality against the
      portable family is pinned in tests/test_dedup.py instead."""
    shingled = d.select(
        "doc_id", _shingles(F.split("text", " ")).alias("shingles")
    )

    if family == "fast":
        def _base(s):
            return F.xxhash64(s).bitwiseAND(F.lit(_MASK_31))
    else:
        def _base(s):
            return (
                F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
                .cast("long")
                .bitwiseAND(F.lit(_MASK_31))
            )

    hashed = shingled.select(
        "doc_id",
        "shingles",
        F.transform("shingles", _base).alias("hs"),
    )
    def _perm(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % _MERSENNE_PRIME_31

    sig = F.array(
        *[
            F.array_min(F.transform("hs", _perm(a, b)))
            for a, b in _minhash_coeffs(k)
        ]
    )
    return hashed.select("doc_id", "shingles", sig.alias("sig"))


_MINHASH_COEFF_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(_minhash_coeffs(MINHASH_K))
)


@query(
    "dedup_minhash_lsh",
    # Full value oracle: DuckDB recomputes the identical md5-based
    # 31-bit shingle hashes, the same (a*h+b) mod p permutation family
    # (coefficients inlined from _minhash_coeffs — one source of
    # truth), the same 8x4 banding, and the same exact-Jaccard verify.
    oracle=f"""
    WITH coeffs(ci, ca, cb) AS (VALUES {_MINHASH_COEFF_VALUES}),
    sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(w) >= {SHINGLE_WORDS}
                    THEN list_transform(
                      generate_series(1, len(w) - {SHINGLE_WORDS - 1}),
                      i -> array_to_string(w[i:i+{SHINGLE_WORDS - 1}], ' '))
                    ELSE [array_to_string(w, ' ')] END) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    hs AS MATERIALIZED (
      SELECT doc_id, shingles,
             list_transform(shingles,
               s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) & {_MASK_31}) AS hs
      FROM sh
    ),
    sig AS MATERIALIZED (
      SELECT doc_id,
             list(list_min(list_transform(hs, x -> (x * ca + cb) % {_MERSENNE_PRIME_31}))
                  ORDER BY ci) AS sig
      FROM hs CROSS JOIN coeffs
      GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, b,
             md5(concat_ws('-', sig[{LSH_ROWS}*b+1], sig[{LSH_ROWS}*b+2],
                                sig[{LSH_ROWS}*b+3], sig[{LSH_ROWS}*b+4])) AS bh
      FROM sig, generate_series(0, {LSH_BANDS - 1}) t(b)
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands l JOIN bands r
        ON l.b = r.b AND l.bh = r.bh AND l.doc_id < r.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b
    WHERE ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                / (len(a.shingles) + len(b.shingles)
                   - len(list_intersect(a.shingles, b.shingles))), 6)
          >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: MinHash+LSH near-duplicate pairs (portable md5 hash family
    — the full-value-oracle key; see _minhash_lsh_pairs)."""
    return _minhash_lsh_pairs(spark, sf_dir, family="portable")


@query("dedup_minhash_lsh_fast")  # rows-only: xxhash64 is JVM-internal
def dedup_minhash_lsh_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 production path: same shingling, banding, and exact-Jaccard
    verify as dedup_minhash_lsh, but the base shingle hash is ONE
    xxhash64 intrinsic and band bucket keys are multi-arg xxhash64
    longs (8 bytes on the shuffle wire vs md5's 32-hex string) — the
    family a 100 TB deployment defaults to.  No DuckDB oracle can
    recompute xxhash64, so this key is rows-only at the gate;
    tests/test_dedup.py pins pair-set equality against the
    value-oracled portable key on the planted-duplicate corpus."""
    return _minhash_lsh_pairs(spark, sf_dir, family="fast")


def _minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, family: str
) -> DataFrame:
    """shingle(3 words) → 32 minhashes → 8 bands × 4 rows → candidate
    pairs sharing any band bucket → exact Jaccard on shingle sets →
    keep pairs ≥ 0.5.  With these parameters the S-curve gives
    P(candidate) ≈ 1-(1-j^4)^8: ~0.99 at j=0.8, ~0.24 at j=0.4.

    The only shuffles are (a) the parallelizing repartition, (b) the
    band-bucket self-join (equi-join on (band, band_hash)) and (c) the
    signature re-join for verification.  Signatures are computed once
    and persisted (MEMORY_AND_DISK) because three plan branches reuse
    them — the cache is the in-session analog of the "persist
    signatures columnar first" step a 100 TB pipeline would run.
    """
    from pyspark import StorageLevel

    d = _docs(spark, sf_dir)
    sigs = minhash_signatures(_parallelize(d, "doc_id"), family=family).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    def _band_key(b: int):
        rows = [
            F.element_at("sig", b * LSH_ROWS + r + 1) for r in range(LSH_ROWS)
        ]
        if family == "fast":
            # one multi-arg xxhash64 → 8-byte long bucket key
            return F.xxhash64(*rows).cast("string")
        # md5 of the dash-joined band slice: 32-byte key, recomputable
        # in the DuckDB oracle (xxhash64 is not)
        return F.md5(F.concat_ws("-", *[r.cast("string") for r in rows]))

    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_key(b).alias("band_hash"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")

    left = bands.alias("l")
    right = bands.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )

    sh = sigs.select("doc_id", "shingles")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    jaccard = inter.cast("double") / union
    return (
        candidates.join(a, candidates.doc_a == F.col("a.doc_id"))
        .join(b, candidates.doc_b == F.col("b.doc_id"))
        .select("doc_a", "doc_b", F.round(jaccard, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@query(
    "dedup_ngram_jaccard",
    # The token sets are hoisted into a MATERIALIZED CTE so DuckDB
    # splits each document once, not O(n^2) times inside the pair join
    # — byte-identical results, ~20x faster oracle (gate-budget
    # hygiene).  The least/greatest size gate is the PPJoin bound the
    # Spark side also uses (J <= min/max) — result-preserving, skips
    # the O(|A|+|B|) intersection for pairs that cannot reach 0.8.
    oracle="""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, lang,
               list_distinct(string_split(text, ' ')) AS t,
               len(list_distinct(string_split(text, ' '))) AS n
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / (a.n + b.n - len(list_intersect(a.t, b.t))), 6) AS jaccard
    FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE least(a.n, b.n) * 1.0 / greatest(a.n, b.n) >= 0.8
      AND CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
          / (a.n + b.n - len(list_intersect(a.t, b.t))) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard ≥ 0.8 within a blocking key (lang) —
    the oracle-checkable exact baseline that LSH approximates.

    Candidate generation is COST-BASED with two result-identical
    strategies (the oracle recomputes the full unblocked semantics
    independently, so either path must hash-match it):

    * **log-size bucket blocking** (small corpora): docs within size
      ratio ≥ t differ by ≤ 1 log_{1.25} size bucket, so pairs form
      inside (lang, bucket) blocks.  Minimal stage count — fastest
      while blocks are small — but per-block pair volume grows
      QUADRATICALLY with the corpus (measured 16× cost at 10× data,
      SCALING_r02.json), so it is the below-cutover strategy only.
    * **prefix filtering** (AllPairs/PPJoin, Bayardo 2007 / Chaudhuri
      2006; large corpora): under any single global token order, a
      pair with J ≥ t must share a token within the first
      n − ⌈t·n⌉ + 1 tokens of each set, so candidates are the
      equi-join of rarest-first token prefixes — an inverted index
      that only materializes short rare-token posting lists and grows
      ~linearly (measured 3× cost at 10× data).  Hot prefix tokens
      are AQE skew-split; a df-cap on prefix membership is the 100 TB
      backstop.

    The cutover (PPJOIN_CUTOVER_DOCS) is the measured crossover where
    prefix-indexing's two extra shuffles (df + rarity regroup) repay
    themselves; the bench corpora sit below it, a production corpus
    sits far above.  Both strategies share:

    * **length filter** (PPJoin bound): J(A,B) ≤ min(|A|,|B|) /
      max(|A|,|B|) prunes pairs inside the join condition BEFORE the
      O(|A|+|B|) intersection runs.
    * **token-hash payload**: word sets travel as xxhash64 longs
      (8 bytes/token), not raw strings — intersection/union COUNTS are
      identical on hashed sets, the oracle recomputes from RAW words,
      and a hash match proves the swap result-preserving.

    This key deliberately BYPASSES the session pair cache and returns
    the lazy plan: its bench/scaling numbers must measure the BUILD
    (the cost a fresh pipeline pays), while index consumers
    (dedup_clusters) read the cached table via _ngram_pairs.
    """
    return _ngram_pairs_plan(spark, sf_dir)


# A near-dup pair table is an INDEX the same way a clustering is
# (similarity._KMEANS_CACHE): the first consumer in a session pays the
# candidate join (dedup_ngram_jaccard's bench key measures exactly that
# cost), later consumers (dedup_clusters' component formation) start
# from the checkpointed pairs the way a pipeline reads a persisted
# pair list.  Entries are per-session localCheckpoints.
_PAIR_CACHE: dict[tuple, DataFrame] = {}


def invalidate_pair_cache() -> None:
    """Drop every cached pair table.  REQUIRED before any blanket
    ``unpersist`` of the session's persistent RDDs (bench.py's per-key
    cleanup): entries are localCheckpointed DataFrames whose lineage IS
    their checkpoint blocks."""
    _PAIR_CACHE.clear()


def _ngram_pairs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAZY pair plan (tokenize → cost-based candidate strategy →
    exact verify).  The token-set frame is persisted because both join
    sides read it; the CBO doc count comes from parquet footer
    metadata, not d.count() — the row count is transform-invariant and
    counting d would run the whole tokenize pass just to pick a
    strategy."""
    d = _parallelize(_docs(spark, sf_dir), "doc_id").select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.transform(F.split("text", " "), lambda w: F.xxhash64(w))
        ).alias("wset"),
    ).withColumn("n", F.size("wset")).persist()
    n_docs = _docs(spark, sf_dir).count()
    return (
        _jaccard_pairs_blocked(d, JACCARD_SIM_THRESHOLD)
        if n_docs <= PPJOIN_CUTOVER_DOCS
        else _jaccard_pairs_prefix(d, JACCARD_SIM_THRESHOLD)
    )


def _ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PAIR_CACHE:
        pairs = _ngram_pairs_plan(spark, sf_dir)
        # persist + eager count so every consumer reads the pair BLOCKS,
        # not the candidate join plan — before this, dedup_clusters'
        # symmetric edge union referenced the plan twice and the
        # O(n·candidates) join executed twice per materialization.
        # persist (NOT localCheckpoint): the df→RDD checkpoint path
        # compiles the join non-adaptively, losing AQE's skew split and
        # post-shuffle coalescing (measured 12.9 s vs 4.2 s for the
        # same pair build at sf0.1)
        pairs = pairs.persist()
        pairs.count()
        _PAIR_CACHE[key] = pairs
    return _PAIR_CACHE[key]


JACCARD_SIM_THRESHOLD = 0.8
# Measured crossover (this box, 32 threads; re-measured round 3 with a
# 50k-doc corpus): bucket blocking wins at 5k docs (0.96s vs 5.2s —
# fewer stages), prefix indexing wins at 50k (9s vs 35s — candidate
# volume grows ~linearly instead of quadratically with block size).
# The geometric midpoint keeps both regimes on their winning side.
PPJOIN_CUTOVER_DOCS = 20_000


def _jaccard_pairs_blocked(d: DataFrame, t: float) -> DataFrame:
    """Pairs via (lang, log-size-bucket) block join — see
    dedup_ngram_jaccard docstring for when this is the right plan.

    Shape note: candidates are generated on a SLIM projection
    (doc_id, lang, n, bucket — ~25 bytes/row) and the token sets are
    re-attached afterwards by doc_id broadcast joins, the same
    verify shape _minhash_lsh_pairs uses.  Carrying the multi-KB wset
    arrays through the exploded block join doubled its shuffle volume
    and measured ~2x slower for identical output.  Broadcasting the
    payload is priced in: this is the below-cutover (small-corpus)
    arm — above PPJOIN_CUTOVER_DOCS the prefix path runs instead."""
    import math

    _LOG_BASE = math.log(1.25)
    d = d.withColumn(
        "bucket", F.floor(F.log(F.col("n").cast("double")) / _LOG_BASE)
    )
    slim = d.select("doc_id", "lang", "n", "bucket")
    a = slim.alias("a")
    b = slim.select(
        "doc_id",
        "lang",
        "n",
        F.explode(F.array(F.col("bucket") - 1, F.col("bucket"))).alias("bucket"),
    ).alias("b")
    sa, sb = F.col("a.n"), F.col("b.n")
    # canonical orientation: the pair is generated at the smaller doc's
    # bucket only (size tie → smaller doc_id), so no pair is duplicated
    canonical = (sa < sb) | ((sa == sb) & (F.col("a.doc_id") < F.col("b.doc_id")))
    cand = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") != F.col("b.doc_id"))
        & canonical
        & (F.least(sa, sb) * F.lit(1.0) / F.greatest(sa, sb) >= t),
    ).select(
        F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
        F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
    )
    wa = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("wset").alias("wset_a"),
        F.col("n").alias("na"),
    )
    wb = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("wset").alias("wset_b"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect(F.col("wset_a"), F.col("wset_b")))
    union = F.col("na") + F.col("nb") - inter
    jaccard = inter.cast("double") / union
    return (
        cand.join(F.broadcast(wa), "doc_a")
        .join(F.broadcast(wb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )


def _jaccard_pairs_prefix(d: DataFrame, t: float) -> DataFrame:
    """Pairs via PPJoin rarest-first prefix postings — see
    dedup_ngram_jaccard docstring for the bound and when this wins.

    The candidate join applies its pruning BEFORE pair enumeration,
    not in the join condition (a condition prunes rows a sort-merge
    join has already enumerated — measured Σ df² ≈ 1.7e9 enumerations
    for 787k true pairs on the 500k-doc scaled corpus, the superlinear
    term in the round-4 scaling audit):

    * the smaller document of every pair is INDEXED with the Xiao et
      al. (PPJoin, WWW'08) shortened index prefix
      n − ⌈2t/(1+t)·n⌉ + 1 (valid because the canonical orientation
      makes the probe the LARGER document, so overlap ≥ 2t/(1+t)·n_y);
    * the larger document PROBES with the standard prefix
      n − ⌈t·n⌉ + 1, and each probe posting carries its PARTNER-SIZE
      WINDOW: a token at rarity position pos can only witness a pair
      whose overlap bound α(n_x, n_y) = ⌈t/(1+t)(n_x+n_y)⌉ satisfies
      α ≤ n_x + 1 − pos, i.e. n_y ≤ (1+t)/t·(n_x+1−pos) − n_x; the
      window [⌈t·n_x⌉ .. that bound] is exploded into the JOIN KEY
      (lang, tok, n_y), so deep prefix positions physically cannot
      reach large partners and the per-token enumeration splits by
      partner size.

    All bounds use exact integer arithmetic on the rational threshold
    (t = p/q), so no float-ceil epsilon can over- or under-prune.
    Every true pair survives: its smallest-α prefix (length n−α+1) is
    contained in both sides' prefixes, and the witnessing token's
    position respects the window by construction."""
    from fractions import Fraction

    frac = Fraction(t).limit_denominator(10**6)
    P, Q = frac.numerator, frac.denominator  # t = P/Q exactly

    def ceil_div(a, b):  # Column ceil(a/b) for positive ints
        return F.floor((a + b - 1) / b).cast("int")

    d = d.localCheckpoint()  # read once: postings, df, and verify reuse it
    post = d.select("doc_id", "lang", "n", F.explode("wset").alias("tok"))
    dfreq = post.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("df"))
    # probe prefix: n - ceil(t*n) + 1;  index prefix: n - ceil(2t/(1+t)*n) + 1
    probe_len = (F.col("n") - ceil_div(F.lit(P) * F.col("n"), F.lit(Q)) + 1).cast("int")
    index_len = (
        F.col("n")
        - ceil_div(F.lit(2 * P) * F.col("n"), F.lit(P + Q))
        + 1
    ).cast("int")
    ranked = post.join(dfreq, ["lang", "tok"]).groupBy(
        "doc_id", "lang", "n"
    ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("df", "tok"))),
            lambda s: s["tok"],
        ).alias("by_rarity")
    ).localCheckpoint(eager=False)  # rank once; probe and index reuse it
    pre = ranked.select(
        "doc_id",
        "lang",
        "n",
        F.posexplode(F.slice(F.col("by_rarity"), F.lit(1), probe_len)).alias(
            "pos", "tok"
        ),
    ).withColumn("pos", F.col("pos") + 1)  # 1-based prefix position
    # partner-size window for each probe posting: n_y in
    # [ceil(t*n_x) .. min(n_x, floor((Q+P)/P * (n_x+1-pos)) - n_x)]
    s_lo = ceil_div(F.lit(P) * F.col("n"), F.lit(Q))
    s_hi = F.least(
        F.col("n"),
        F.floor(F.lit(Q + P) * (F.col("n") + 1 - F.col("pos")) / F.lit(P)).cast("int")
        - F.col("n"),
    )
    probe = pre.select(
        F.col("doc_id").alias("x_id"),
        "lang",
        F.col("n").alias("nx"),
        F.col("pos").alias("px"),
        "tok",
        F.explode(
            F.when(s_lo <= s_hi, F.sequence(s_lo, s_hi)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("ny"),
    )
    index = ranked.select(
        F.col("doc_id").alias("y_id"),
        "lang",
        F.col("n").alias("ny"),
        F.posexplode(F.slice(F.col("by_rarity"), F.lit(1), index_len)).alias(
            "py", "tok"
        ),
    ).withColumn("py", F.col("py") + 1)
    alpha = ceil_div(
        F.lit(P) * (F.col("nx") + F.col("ny")), F.lit(P + Q)
    )
    # COST-BASED join strategy (r10): when the shortened-index posting
    # table and the per-doc token payloads are both broadcastable, the
    # whole candidate→pre-verify→prune pipeline fuses into ONE wide
    # map stage (probe explode → broadcast-hash joins → row-local
    # filters) and the only big exchange left is the distinct over the
    # ~2% of enumerations that survive the rank-split bound — measured
    # 54→31 s on the 500k-doc dense-vocabulary corpus, where the 93M
    # candidate enumeration made every extra 93M-row shuffle (distinct
    # + two pre-verify joins) the dominant cost.  Above the size guard
    # (true 100 TB corpora: long docs, growing vocabulary) the SMJ arm
    # below runs unchanged — both arms are result-identical and the
    # sf0.1 sweep hash-verifies the broadcast arm against the oracle.
    nd, ntok = d.agg(
        F.count(F.lit(1)), F.sum("n")
    ).collect()[0]  # metadata-sized: two numbers off the persisted frame
    ntok = int(ntok or 0)
    # index postings ≈ Σ (n − ⌈2t/(1+t)·n⌉ + 1) ≤ 0.12·Σn + nd rows of
    # ~48 B; wset/wlo payloads ≈ 8 B/token + per-doc overhead
    est_index_bytes = (0.12 * ntok + nd) * 48
    est_payload_bytes = ntok * 8 + nd * 48
    bcast = (
        est_index_bytes < _PREFIX_BCAST_LIMIT
        and est_payload_bytes < _PREFIX_BCAST_LIMIT
    )
    global _LAST_PREFIX_STRATEGY  # observable for the plan-shape pins
    _LAST_PREFIX_STRATEGY = "broadcast" if bcast else "smj"
    raw = (
        probe.join(
            F.broadcast(index) if bcast else index, ["lang", "tok", "ny"]
        )
        # canonical orientation: probe is the strictly larger side, or
        # same size with the larger doc_id — each unordered pair is
        # generated from exactly one direction
        .filter(
            (F.col("ny") < F.col("nx"))
            | ((F.col("ny") == F.col("nx")) & (F.col("y_id") < F.col("x_id")))
        )
        # pair-specific positional residuals (cheap row filters on the
        # already-windowed enumeration)
        .filter(
            (1 + F.col("nx") - F.col("px") >= alpha)
            & (1 + F.col("ny") - F.col("py") >= alpha)
        )
    )
    cand = None
    if not bcast:
        cand = raw.select(
            F.least("x_id", "y_id").alias("doc_a"),
            F.greatest("x_id", "y_id").alias("doc_b"),
        ).distinct()  # a pair may share several prefix tokens
    # RANK-SPLIT pre-verify — an EXACT cheap bound that kills the
    # candidates prefix filtering cannot (pairs sharing one rare token
    # but far below t overall; the scaled-corpus audit measured 93M of
    # them against 787k true pairs).  Partition each document's tokens
    # by document frequency at the per-language posting-mass median
    # (df is a property of (lang, tok), so a SHARED token lands on the
    # same side for both docs): |A∩B| = |A_lo∩B_lo| + |A_hi∩B_hi|
    # <= |A_lo∩B_lo| + min(|A_hi|, |B_hi|).  Stage A joins only the
    # small lo-arrays (~half the tokens), prunes pairs whose bound
    # cannot reach alpha, and ONLY survivors pay the full-array verify
    # join — both the shuffle bytes and the intersect CPU of the
    # verify drop with the prune rate.  Any cutoff is result-exact;
    # the posting-mass median just balances the split.
    from pyspark.sql import Window

    wdf = Window.partitionBy("lang").orderBy("df", "tok")
    tot = dfreq.groupBy("lang").agg(F.sum("df").alias("tot"))
    cut = (
        dfreq.withColumn("cum", F.sum("df").over(wdf))
        .join(tot, "lang")
        .filter(F.col("cum") * 2 <= F.col("tot"))
        .groupBy("lang")
        .agg(F.max("df").alias("rare_df"))
    )
    rare = dfreq.join(cut, "lang").filter(
        F.col("df") <= F.col("rare_df")
    ).select("lang", "tok")
    lo = (
        post.join(rare, ["lang", "tok"])
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("tok")).alias("wlo"))
    )
    dlo = (
        d.select("doc_id", "n")
        .join(lo, "doc_id", "left")
        .select(
            "doc_id",
            "n",
            F.coalesce("wlo", F.array().cast("array<bigint>")).alias("wlo"),
        )
    )
    i_lo = F.size(F.array_intersect("wlo_a", "wlo_b"))
    if bcast:
        # fused arm: pre-verify runs BEFORE any distinct, row-local on
        # the raw enumeration (the duplicate factor is ~1.1, so the
        # extra half-array intersects cost less than the 93M-row
        # exchange the distinct-first order pays), and the distinct
        # only ever sees the rank-split survivors
        la = dlo.select(
            F.col("doc_id").alias("x_id"), F.col("wlo").alias("wlo_a")
        )
        lb = dlo.select(
            F.col("doc_id").alias("y_id"), F.col("wlo").alias("wlo_b")
        )
        hi_bound = F.least(
            F.col("nx") - F.size("wlo_a"), F.col("ny") - F.size("wlo_b")
        )
        cand = (
            raw.join(F.broadcast(la), "x_id")
            .join(F.broadcast(lb), "y_id")
            .filter(i_lo + hi_bound >= alpha)
            .select(
                F.least("x_id", "y_id").alias("doc_a"),
                F.greatest("x_id", "y_id").alias("doc_b"),
            )
            .distinct()
        )
    else:
        la = dlo.select(
            F.col("doc_id").alias("doc_a"),
            F.col("n").alias("na"),
            F.col("wlo").alias("wlo_a"),
        )
        lb = dlo.select(
            F.col("doc_id").alias("doc_b"),
            F.col("n").alias("nb"),
            F.col("wlo").alias("wlo_b"),
        )
        alpha_ab = ceil_div(
            F.lit(P) * (F.col("na") + F.col("nb")), F.lit(P + Q)
        )
        hi_bound = F.least(
            F.col("na") - F.size("wlo_a"), F.col("nb") - F.size("wlo_b")
        )
        cand = (
            cand.join(la, "doc_a")
            .join(lb, "doc_b")
            .filter(i_lo + hi_bound >= alpha_ab)
            .select("doc_a", "doc_b")
        )
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("wset").alias("wa"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("wset").alias("wb"))
    if bcast:
        da, db = F.broadcast(da), F.broadcast(db)
    inter = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    union = F.size("wa") + F.size("wb") - inter
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )


# both the shortened-index postings and the token payload tables must
# fit under this to take the fused broadcast arm — sized well inside
# spark.sql.autoBroadcastJoinThreshold territory for a 32-thread
# local executor while leaving the SMJ arm for genuinely large corpora
_PREFIX_BCAST_LIMIT = 256 << 20
# last cost-based decision _jaccard_pairs_prefix took ("broadcast" /
# "smj") — read by tests/test_plans.py to pin the arm selection
_LAST_PREFIX_STRATEGY: str = ""



SIMHASH_BITS = 60  # 15 hex chars of md5: positive bigint, 4 clean bands


_SIMHASH_SIG_SQL = f"""
    tok AS MATERIALIZED (
      SELECT doc_id, CAST('0x' || substr(md5(w), 2, 15) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    ),
    bits AS (
      SELECT doc_id, i,
             SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM tok, generate_series(0, {SIMHASH_BITS - 1}) t(i)
      GROUP BY doc_id, i
    ),
    sig AS MATERIALIZED (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << i)
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    )
"""


@query(
    "dedup_simhash",
    # Full value oracle: the signature family is md5-derived, so DuckDB
    # rebuilds bit-identical 60-bit signatures from scratch.
    oracle=f"WITH {_SIMHASH_SIG_SQL} SELECT doc_id, simhash FROM sig",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures: per doc, each of 60 bits is the sign of the
    sum over tokens of ±1 (bit i of an md5-derived 60-bit token hash).
    All JVM bit arithmetic via explode + groupBy(doc_id) with 60
    conditional sums — one shuffle keyed by doc_id, no skew (docs are
    the keys).  The token hash is md5-based (not xxhash64) so the
    signatures — and therefore the banded pair detection downstream —
    are engine-portable and fully value-oracled; swap xxhash64 back
    for raw throughput and the checks degrade to rows-only."""
    d = _parallelize(_docs(spark, sf_dir), "doc_id")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 2, 15), 16, 10).cast("long").alias("h"),
    )
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") >= 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return bit_sums.select("doc_id", sig.alias("simhash"))


@query(
    "dedup_embedding_nn",
    oracle="""
    SELECT vec_id, nn_id, cos AS nn_cos, (cos >= 0.9) AS is_near_dup
    FROM (
        SELECT a.vec_id,
               b.vec_id AS nn_id,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                                         b.embedding::DOUBLE[]), 6) DESC,
                            b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ) t WHERE rn = 1
    """,
)
def dedup_embedding_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, IVF-style: pairs are only
    formed *within a coarse partition* (the ``label`` column stands in
    for a cluster assignment), so the join is an equi-join on label —
    the same shape as IVF probing, and the only way pairwise cosine
    survives 100 TB.  Emits each vector's nearest neighbor + dup flag
    (cosine rounded before ranking so ordering is engine-stable)."""
    apply_engine_conf(spark)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", vec_double(F.col("embedding")).alias("v")
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("nn_id"),
        cos.alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("nn_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "nn_id",
            F.col("cos").alias("nn_cos"),
            (F.col("cos") >= 0.9).alias("is_near_dup"),
        )
    )


@query(
    "dedup_clusters",
    # Token sets and the near-dup pair set are MATERIALIZED so the
    # O(n^2) Jaccard join runs once (the old inline form evaluated it
    # twice — once per edge direction — and re-split strings per pair:
    # 81 s -> 0.5 s at sf0.01, identical fixpoint).
    oracle="""
    WITH RECURSIVE toks AS MATERIALIZED (
        SELECT doc_id, lang,
               list_distinct(string_split(text, ' ')) AS t,
               len(list_distinct(string_split(text, ' '))) AS n
        FROM documents
    ),
    p AS MATERIALIZED (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE least(a.n, b.n) * 1.0 / greatest(a.n, b.n) >= 0.8
          AND CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
              / (a.n + b.n - len(list_intersect(a.t, b.t))) >= 0.8
    ),
    edges AS MATERIALIZED (
        SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p
    ),
    walk(node, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        -- monotone prune: a root >= dst can never beat dst's own init
        -- row, and the true min root m reaches every node through
        -- pairs with m < dst — so dropping non-improving pairs halves
        -- the closure on dense components (108 s -> 49 s at sf0.1,
        -- identical fixpoint)
        SELECT e.dst, w.root FROM walk w
        JOIN edges e ON e.src = w.node AND w.root < e.dst
    )
    SELECT node AS doc_id,
           MIN(root) AS cluster_id,
           (MIN(root) = node) AS keep
    FROM walk GROUP BY node
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation: connected components over the exact
    near-dup pair graph, then keep-one-per-cluster — the step that
    turns pairwise similarity into an actual dedup decision.

    Implemented as hash-min CONTRACTION with map doubling (the
    large-star/small-star family, Kiveris et al. 2014): each round
    every super-node takes min(self, min neighbor) as its new label,
    the label map composes with itself once (doubling — so chains
    collapse in O(log diameter), not O(diameter)), and THE EDGE SET
    ITSELF CONTRACTS: endpoints remap through the round's label map,
    self-loops and duplicate edges drop.  On the near-dup workload's
    characteristic clique-heavy graphs (this corpus: ~760k pairs over
    5k duplicate docs at sf0.1) the first round contracts every
    clique to its min node and the edge table goes EMPTY — later
    rounds cost nothing, where plain label propagation re-joined the
    full million-edge table every round.  Termination is exact: no
    edges left ⇔ every component is a single super-node, and since
    labels only ever decrease, that super-node is the component min.
    Rounds are driver-side LOOP CONTROL only (one count() per round —
    never data); per-round state is localCheckpoint()ed so lineage
    stays flat.  If the 20-round bound is ever hit first, a residual
    warning reports the live edge count instead of silently returning
    a half-contracted labeling.  The DuckDB twin computes components
    with a recursive CTE — an independent algorithm, same fixpoint.

    The iteration runs ONLY over nodes that appear in the pair graph;
    singletons (most of any real corpus) join back exactly once at
    the end with cluster_id = doc_id.  At 100 TB this is the
    difference between iterating over duplicate groups and iterating
    over the whole corpus 20 times.
    """
    import warnings

    # cached pair table (shared session index — _PAIR_CACHE): consumers
    # read materialized pair blocks, not the candidate-join plan
    pairs = _ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # CANONICAL edges (src < dst), never symmetrized: hash-min only
    # needs the dst side (a node whose neighbors are all larger keeps
    # its own label, which least(self, ·) already encodes), and every
    # loop job below — the min-aggregation, the remap joins, the
    # distinct — runs on HALF the rows a symmetric edge list carries
    cur = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).persist()
    labels = (
        cur.select(F.col("src").alias("doc_id"))
        .unionByName(cur.select(F.col("dst").alias("doc_id")))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .persist()
    )
    n_edges = cur.count()
    # Checkpoint materializations are RIGHT-SIZED from the measured
    # edge count (optimization r10, guide §2.2/§2.6): localCheckpoint
    # runs the plan through the RDD path, which AQE's byte-based
    # reducer coalescing never touches — left alone, every round
    # materialized 32+ near-empty tasks per checkpoint (and every
    # consumer job re-scanned that many partitions), pure scheduler
    # overhead on a KB-sized label map.  |upd| <= live nodes <=
    # 2*n_edges and |contracted cur| <= n_edges, so ~1M edge-rows per
    # partition (~tens of MB) sizes every intermediate into the
    # advisory band; the session's shuffle parallelism caps it so a
    # cluster-scale first round still fans out.
    def _parts(n: int) -> int:
        # some managed platforms set this conf to a non-numeric value
        # (e.g. "auto"); fall back to the live parallelism rather than
        # failing the whole query on the int() parse (r10 advice item 2)
        try:
            cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        except ValueError:
            cap = spark.sparkContext.defaultParallelism
        return max(1, min(cap, n // 1_000_000 + 1))

    # labels is NODE-count sized and never shrinks with contraction —
    # size it once from the initial bound (|nodes| <= 2*n_edges), not
    # the per-round edge count (which at scale would squeeze a
    # billion-row label table into one task by round 3)
    labels_parts = _parts(2 * n_edges)

    for rnd in range(20):  # hard bound; contraction converges in O(log diameter)
        if n_edges == 0:
            break
        n_parts = _parts(n_edges)
        # this round's label map over current super-nodes: min(self,
        # min neighbor) — one map-side-combinable aggregation over the
        # (contracted) edge set.
        # eagerly checkpointed: THREE consumers reference this map
        # (labels remap, src contraction, dst contraction) — left as a
        # plan, the groupBy over the full edge set would run three
        # times a round, and checkpoint (not persist) TRUNCATES the
        # lineage, which the self-referencing round structure needs to
        # keep plan trees from growing exponentially
        upd = (
            cur.groupBy(F.col("dst").alias("node"))
            .agg(F.min("src").alias("m"))
            .select("node", F.least("node", "m").alias("new"))
            .coalesce(n_parts)
            .localCheckpoint()
        )
        # Round 1 skips pointer jumping entirely: on the clique-heavy
        # graphs near-dup detection produces, hash-min alone contracts
        # every clique to its min node and the edge table goes empty —
        # the doubling self-joins would be pure scheduling overhead
        # (measured 8.9 s -> target <4 s at sf0.1, identical fixpoint).
        # Rounds 2+ keep the FULL six compositions: plain hash-min only
        # shifts a chain's labels by ONE per round (the contracted
        # edge set is the same chain re-rooted), so chains genuinely
        # need the doubling — six hops square the map to a 2^6-step
        # jump, closing a 60-doc chain in one doubled round (pinned in
        # test_dedup_clusters_long_chain_converges).
        for _ in range(0 if rnd == 0 else 6):
            hop = upd.select(
                F.col("node").alias("h_node"), F.col("new").alias("h_new")
            )
            # lazy checkpoint each composition: the self-join references
            # upd twice, so an unbroken lineage would double the plan
            # tree per iteration
            upd = (
                upd.join(hop, upd.new == hop.h_node, "left")
                .select("node", F.coalesce("h_new", "new").alias("new"))
                .coalesce(n_parts)
                .localCheckpoint(eager=False)
            )
        # docs remap through the round map (labels always hold current
        # super-node ids, so the join is total for non-fixed labels);
        # same size-gated broadcast as the contraction below
        upd_hint = F.broadcast(upd) if n_edges <= 2_000_000 else upd
        labels = (
            labels.join(upd_hint, labels.cluster_id == upd.node, "left")
            .select(
                "doc_id", F.coalesce("new", "cluster_id").alias("cluster_id")
            )
            .coalesce(labels_parts)
            .localCheckpoint(eager=False)
        )
        # CONTRACT the edges: both endpoints through the map (LEFT
        # joins — canonical edges leave component minima out of upd,
        # they keep their own id), re-canonicalize, drop self-loops and
        # duplicates — this is what makes round 2+ cheap
        src_map = upd.select(F.col("node").alias("src"), F.col("new").alias("src_new"))
        dst_map = upd.select(F.col("node").alias("dst"), F.col("new").alias("dst_new"))
        # size-gated broadcast: a checkpointed map's stats are unknown
        # to Catalyst, so without the hint both remap joins SHUFFLE the
        # full edge set.  |upd| <= |live nodes| <= 2*n_edges, which
        # n_edges bounds exactly — broadcast while that fits an
        # executor (~16 B/row), shuffle-join above it.  Contraction
        # shrinks edges geometrically, so at 100 TB only the first
        # round or two ever take the shuffle path.
        if n_edges <= 2_000_000:
            src_map, dst_map = F.broadcast(src_map), F.broadcast(dst_map)
        cur = (
            cur.join(src_map, "src", "left")
            .join(dst_map, "dst", "left")
            .select(
                F.coalesce("src_new", "src").alias("a"),
                F.coalesce("dst_new", "dst").alias("b"),
            )
            .select(
                F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .coalesce(n_parts)
            .localCheckpoint()
        )
        n_edges = cur.count()
    if n_edges:
        warnings.warn(
            f"dedup_clusters: round cap hit with {n_edges} edges still "
            "live — component diameter exceeds ~8^19?! result is not a "
            "fixpoint",
            RuntimeWarning,
            stacklevel=2,
        )
    # singletons (no near-dup edge) re-enter once: their own id is
    # their cluster — the labels side broadcasts (it is pair-sized)
    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(F.broadcast(labels), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .select(
            "doc_id",
            "cluster_id",
            (F.col("cluster_id") == F.col("doc_id")).alias("keep"),
        )
    )


@query(
    "pipeline_dedup_keep_best",
    oracle="""
    WITH RECURSIVE toks AS MATERIALIZED (
        SELECT doc_id, lang,
               list_distinct(string_split(text, ' ')) AS t,
               len(list_distinct(string_split(text, ' '))) AS n
        FROM documents
    ),
    p AS MATERIALIZED (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE least(a.n, b.n) * 1.0 / greatest(a.n, b.n) >= 0.8
          AND CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
              / (a.n + b.n - len(list_intersect(a.t, b.t))) >= 0.8
    ),
    edges AS MATERIALIZED (
        SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p
    ),
    walk(node, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.root FROM walk w
        JOIN edges e ON e.src = w.node AND w.root < e.dst
    ),
    cl AS (
        SELECT node AS doc_id, MIN(root) AS cluster_id
        FROM walk GROUP BY node
    ),
    q AS (
        SELECT doc_id,
               len(list_distinct(string_split(text, ' '))) * 1.0
                 / len(string_split(text, ' ')) AS dr
        FROM documents
    )
    SELECT cl.doc_id AS doc_id, cl.cluster_id AS cluster_id,
           ROUND(q.dr, 6) AS quality,
           ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                              ORDER BY q.dr DESC, cl.doc_id) = 1 AS keep
    FROM cl JOIN q ON cl.doc_id = q.doc_id
    """,
)
def pipeline_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster formation composed with a QUALITY-AWARE keep
    policy — the production refinement of dedup_clusters' keep-min-id:
    within each duplicate cluster the member with the best quality
    score survives (FineWeb/CCNet-style pipelines do exactly this so
    dedup never throws away the cleanest copy).  Quality here is the
    distinct-token ratio (one of the Gopher measures, integer-exact);
    ties break on doc_id so the selection is deterministic.

    Plan shape: the cluster map comes from the shared CC machinery
    (pair-graph blocked join + size-gated broadcast label rounds — see
    dedup_clusters); the policy itself is one join of the cluster map
    against a scan-stage quality projection plus one window argmax
    PARTITIONED BY cluster_id — per-cluster state, never a global
    sort.  At 100 TB the added cost over dedup_clusters is one
    combinable join + a bounded window."""
    from pyspark.sql.window import Window

    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    d = _docs(spark, sf_dir).select(
        "doc_id",
        let(
            F.split("text", " "),
            lambda t: F.size(F.array_distinct(t)) / F.size(t),
        ).alias("dr"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("dr").desc(), F.col("doc_id")
    )
    return (
        clusters.join(d, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            F.round("dr", 6).alias("quality"),
            (F.col("_rn") == 1).alias("keep"),
        )
    )


SIMHASH_BANDS = 4       # Manku-style: r=3 differing bits can't touch all 4 bands
SIMHASH_RADIUS = 3      # near-dup iff hamming(simhash_a, simhash_b) <= 3


@query(
    "dedup_simhash_pairs",
    # Full value oracle: identical md5-based signatures, identical
    # 4x15-bit banding, identical xor+bit_count verification.
    oracle=f"""
    WITH {_SIMHASH_SIG_SQL},
    bands AS (
      SELECT doc_id, b, (simhash >> (b * 15)) & 32767 AS chunk
      FROM sig, generate_series(0, {SIMHASH_BANDS - 1}) t(b)
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands l JOIN bands r
        ON l.b = r.b AND l.chunk = r.chunk AND l.doc_id < r.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN sig a ON a.doc_id = c.doc_a
    JOIN sig b ON b.doc_id = c.doc_b
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_RADIUS}
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: band the 60-bit signature into 4
    chunks; any pair within hamming radius 3 leaves at least one band
    untouched (pigeonhole, Manku et al.'s web-dedup design), so the
    band-bucket equi-join finds EVERY such pair — banding is a lossless
    index for the radius, unlike MinHash-LSH's probabilistic recall.
    Candidates are then verified with one xor+bit_count.  Shuffles
    carry (doc_id, band, 16-bit chunk) only; signature re-attachment is
    an equi-join on doc_id."""
    sigs = dedup_simhash(spark, sf_dir)  # (doc_id, simhash), persisted plan below
    from pyspark import StorageLevel

    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    band_width = SIMHASH_BITS // SIMHASH_BANDS  # 15 bits per band
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * band_width).bitwiseAND(
                        F.lit((1 << band_width) - 1)
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "chunk"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    candidates = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_RADIUS)
    )


@query(
    "dedup_keep_latest",
    oracle="""
    SELECT user_id, event_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts,
           event_type
    FROM (
        SELECT user_id, event_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 variant every pipeline needs: keep the LATEST record per key
    (CDC compaction, snapshot-of-append-log).  One window shuffle on
    the key; ties broken by event_id so the pick is deterministic.  At
    100 TB this is the standard row_number()=1 pattern — partial
    aggregation doesn't apply, but the shuffle carries only the
    selected columns."""
    e = load_table(spark, sf_dir, "events")
    apply_engine_conf(spark)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_type",
        )
    )


@query(
    "dedup_edit_distance",
    oracle="""
    WITH keys AS (
        SELECT c_name,
               unnest(list_distinct(list_prepend(c_name,
                   [substr(c_name, 1, CAST(i AS INT) - 1)
                    || substr(c_name, CAST(i AS INT) + 1, length(c_name))
                    FOR i IN range(1, length(c_name) + 1)]))) AS k
        FROM customer
    )
    SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b
    FROM keys a JOIN keys b ON a.k = b.k
    WHERE a.c_name < b.c_name
      AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 near-duplicate pairs via POSITION-ENHANCED
    FastSS deletion neighborhoods (Bocek et al. 2007 / the SymSpell
    index, with the deleted POSITION kept in the blocking key).  Exact
    by construction, case split on how lev(a,b)=1 can happen:

    * SUBSTITUTION (equal length): a and b differ at exactly one
      position p ⇔ deleting p from both yields the same key — the
      equi-join on ``(key, position)`` finds exactly these, and two
      DIFFERENT names sharing (key, position) provably differ only at
      that position, so no verify is needed.
    * INSERT/DELETE (length ±1): the shorter name IS one of the
      longer's deletion keys — an equi-join of deletion keys against
      the name set, again exact by construction.

    r9 re-plan: the original joined on the deletion key ALONE with a
    ``levenshtein ≤ 1`` verify.  On dense sequential identifiers
    (zero-padded numbers — every real ID column) the plain-key buckets
    collapse: at 1.5M customer names the measured candidate volume was
    2.18e10 pairs (max bucket 3800), hours of levenshtein grinding.
    Keeping the position in the key bounds a bucket by the alphabet
    size (all strings equal except one position), so candidate volume
    IS the true output volume — the operator becomes output-bound,
    the only cost floor an exact pair generator can have.

    Scale: index rows are (L+1)× the distinct names; both joins are
    hash-partitioned equi-joins with alphabet-bounded buckets; no
    verify stage exists to grind.  The distance-k generalization
    raises fan-out to O(L^k) — k=1..2 is the practical envelope,
    exactly why SymSpell ships k≤2 defaults."""
    apply_engine_conf(spark)
    names = (
        load_table(spark, sf_dir, "customer").select("c_name").distinct()
    )
    dels = names.select(
        "c_name",
        F.explode(
            F.expr(
                "transform(sequence(1, length(c_name)), i -> "
                "struct(concat(substring(c_name, 1, i - 1), "
                "substring(c_name, i + 1, length(c_name) - i)) AS k, "
                "i AS pos))"
            )
        ).alias("d"),
    ).select("c_name", F.col("d.k").alias("k"), F.col("d.pos").alias("pos"))
    a, b = dels.alias("a"), dels.alias("b")
    subs = (
        a.join(b, ["k", "pos"])
        .filter(F.col("a.c_name") < F.col("b.c_name"))
        .select(
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
    )
    n = names.alias("n")
    ins_del = (
        dels.alias("x")
        .join(n, F.col("x.k") == F.col("n.c_name"))
        .select(
            F.least(F.col("x.c_name"), F.col("n.c_name")).alias("name_a"),
            F.greatest(F.col("x.c_name"), F.col("n.c_name")).alias(
                "name_b"
            ),
        )
    )
    return subs.unionByName(ins_del).distinct()


@query(
    "dedup_incremental",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(lower(text)) AS fingerprint,
             (doc_id % 5 = 0) AS incoming
      FROM documents
    ),
    existing AS (SELECT DISTINCT fingerprint FROM fp WHERE NOT incoming),
    batch AS (SELECT doc_id, fingerprint FROM fp WHERE incoming)
    SELECT b.fingerprint AS fingerprint,
           MIN(b.doc_id) AS keep_doc,
           COUNT(*) AS n_in_batch
    FROM batch b
    WHERE b.fingerprint NOT IN (SELECT fingerprint FROM existing)
    GROUP BY b.fingerprint
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1c: incremental-ingestion dedup — the shape every daily
    pipeline actually runs: dedup a NEW batch both against itself and
    against the fingerprints of everything already ingested, without
    re-scanning the corpus text.  (Fixture: doc_id % 5 == 0 plays the
    incoming batch, the rest the existing corpus.)

    Plan: the batch collapses per-fingerprint first (keep-min + batch
    count — the within-batch dedup), THEN anti-joins the existing
    fingerprint set on the 16-byte key.  Per-ingest cost is
    O(batch + matched keys): the corpus side contributes only its
    fingerprint column (in production a persisted, bucketed
    fingerprint table — pay-the-shuffle-once, `join_bucketed`'s
    layout), text never moves, and nothing rescans history.  The
    anti join is a hash join on uniformly-distributed hashes: no
    skew by construction.
    """
    fp = _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.lower("text")).alias("fingerprint"),
        (F.col("doc_id") % 5 == 0).alias("incoming"),
    )
    existing = fp.filter(~F.col("incoming")).select("fingerprint").distinct()
    batch = (
        fp.filter(F.col("incoming"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc"),
            F.count(F.lit(1)).alias("n_in_batch"),
        )
    )
    return batch.join(existing, "fingerprint", "left_anti")


# ---------------------------------------------------------------------------
# continuation-overlap stitching (crawl-record reassembly)
# ---------------------------------------------------------------------------

_STITCH_K = 8        # boundary tokens that must match exactly
_STITCH_PAD = 4      # overlap half-width in the derived record fixture


@query(
    "dedup_stitch_records",
    # The derived "records" fixture (each >=20-token doc split into two
    # halves sharing an 8-token overlap) is rebuilt identically in SQL,
    # so the stitch detection is fully value-oracled.
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, w, len(w) AS n, (len(w) + 1) // 2 AS cut
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= 20
    ),
    recs AS MATERIALIZED (
      SELECT doc_id * 2 AS rec_id, w[1:cut+{_STITCH_PAD}] AS toks FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS rec_id, w[cut-{_STITCH_PAD - 1}:n] AS toks FROM base
    ),
    keys AS MATERIALIZED (
      SELECT rec_id,
             toks[len(toks)-{_STITCH_K - 1}:len(toks)] AS suf,
             toks[1:{_STITCH_K}] AS pre
      FROM recs
    )
    SELECT s.rec_id AS rec_a, p.rec_id AS rec_b,
           md5(array_to_string(s.suf, ' ')) AS overlap_key
    FROM keys s JOIN keys p
      ON md5(array_to_string(s.suf, ' ')) = md5(array_to_string(p.pre, ' '))
     AND s.rec_id <> p.rec_id
    WHERE s.suf = p.pre
    """,
)
def dedup_stitch_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuation-overlap stitching: find record pairs where one
    record's trailing {K} tokens equal another's leading {K} tokens —
    the reassembly step for crawl archives (WARC/WET) that split long
    pages across fetch records, and the guard against training on the
    same passage twice at a shard boundary.

    The testdata has no naturally split records, so the op derives a
    deterministic fixture from `documents` (each >=20-token doc becomes
    two records sharing an 8-token overlap) — the same construction is
    rebuilt in the oracle, so detection is value-checked end-to-end.

    Plan shape for 100 TB: each record contributes ONE suffix key and
    ONE prefix key (md5 of the 8-token boundary) — the join is an
    equi-join on near-unique 32-byte keys (no skew, no pair explosion,
    AQE-safe), and only the 8-token boundary slices travel through the
    shuffle, never record bodies.  The exact-equality re-check after
    the hash match is row-local (md5-collision guard).
    """
    d = _docs(spark, sf_dir)
    t = F.split("text", " ")
    base = (
        d.select("doc_id", t.alias("w"), F.size(t).alias("n"))
        .filter(F.col("n") >= 20)
        .withColumn("cut", F.floor((F.col("n") + 1) / 2).cast("int"))
    )
    rec_a = base.select(
        (F.col("doc_id") * 2).alias("rec_id"),
        F.slice("w", 1, F.col("cut") + _STITCH_PAD).alias("toks"),
    )
    rec_b = base.select(
        (F.col("doc_id") * 2 + 1).alias("rec_id"),
        F.slice(
            "w", F.col("cut") - (_STITCH_PAD - 1), F.col("n") - F.col("cut") + _STITCH_PAD
        ).alias("toks"),
    )
    recs = rec_a.unionByName(rec_b)
    keys = recs.select(
        "rec_id",
        F.slice("toks", F.size("toks") - (_STITCH_K - 1), _STITCH_K).alias("suf"),
        F.slice("toks", 1, _STITCH_K).alias("pre"),
    )
    s, p = keys.alias("s"), keys.alias("p")
    skey = F.md5(F.concat_ws(" ", F.col("s.suf")))
    pkey = F.md5(F.concat_ws(" ", F.col("p.pre")))
    return (
        s.join(
            p,
            (skey == pkey) & (F.col("s.rec_id") != F.col("p.rec_id")),
        )
        .filter(F.col("s.suf") == F.col("p.pre"))
        .select(
            F.col("s.rec_id").alias("rec_a"),
            F.col("p.rec_id").alias("rec_b"),
            F.md5(F.concat_ws(" ", F.col("s.suf"))).alias("overlap_key"),
        )
    )


SPAN_TOKENS = 8  # repeated-span window length (tokens)


@query(
    "dedup_substring_spans",
    # Token lists are MATERIALIZED so each document splits once; the
    # span table is built engine-side with list_transform over an
    # integer range (same unroll the Spark side does with
    # transform(sequence(...))).
    oracle=f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    spans AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, n - {SPAN_TOKENS - 2}),
                   i -> array_to_string(t[i:i+{SPAN_TOKENS - 1}], ' ')
               )) AS span
        FROM toks
        WHERE n >= {SPAN_TOKENS}
    )
    SELECT span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS first_doc
    FROM spans
    GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring detection (the ExactSubstr
    pass of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): every {SPAN_TOKENS}-token sliding window
    that occurs in 2+ distinct documents, with its occurrence counts —
    the span table a removal pass anti-joins against to cut memorized
    boilerplate out of a training corpus.

    Plan (the 100 TB span-hash formulation, wired r8): tokenize →
    unroll the sliding windows JVM-side (transform(sequence(...)) +
    slice, whole-stage codegen) → project each window to a 128-bit
    composite key (xxhash64(span), xxhash64('ss2', span)) IN THE SAME
    MAP STAGE — the span string is materialized transiently in codegen
    and never leaves the scan task; only 16 bytes/window cross the
    shuffle (vs ~50-byte k-token strings before).  One map-side-
    combined groupBy on the hash pair finds the repeated spans; a
    second window pass over the (cheap, already-cached-by-OS) corpus
    recovers the text for the survivors only, via a BROADCAST join on
    the 16-byte survivor keys — only survivor text ever shuffles, and
    the min(span) partial-aggregates map-side so each partition ships
    at most one witness string per surviving span.

    Collision safety: two distinct spans colliding would merge their
    counts.  A single xxhash64 gives 2^-64 per pair (~1e-7 birthday
    risk at 10^9 distinct spans); the independent second hash pushes
    the pair probability to ~2^-128, i.e. no realistic corpus reaches
    it.  The witness min(span) makes any residual collision visible
    (the gate hash would diverge from the string-keyed oracle).

    The text-recovery join carries NO broadcast hint: the survivor-key
    set is corpus-proportional in boilerplate-heavy data, so forcing a
    broadcast would force a driver-side collect that OOMs at exactly
    the 100 TB scale this targets.  AQE broadcasts it at runtime when
    the flagged side measures small (the common case) and falls back
    to a 16-byte-keyed shuffle join when it doesn't — span text still
    shuffles at most once, output-bound.  The suffix-array machinery
    of the paper finds VARIABLE-length repeats; the fixed-k
    formulation here is the one that distributes.
    """
    k = SPAN_TOKENS
    d = _parallelize(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    d = d.localCheckpoint()  # both window passes reuse the tokenized corpus

    def _windows(frame: DataFrame) -> DataFrame:
        return frame.where(F.size("t") >= k).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, k)),
                )
            ).alias("span"),
        )

    hashed = _windows(d).select(
        "doc_id",
        F.xxhash64("span").alias("h1"),
        F.xxhash64(F.lit("ss2"), F.col("span")).alias("h2"),
    )
    flagged = (
        hashed.groupBy("h1", "h2")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )
    rescan = _windows(d).select(
        "span",
        F.xxhash64("span").alias("h1"),
        F.xxhash64(F.lit("ss2"), F.col("span")).alias("h2"),
    )
    return (
        rescan.join(flagged, ["h1", "h2"])
        .groupBy("h1", "h2", "n_docs", "n_occurrences", "first_doc")
        .agg(F.min("span").alias("span"))
        .select("span", "n_docs", "n_occurrences", "first_doc")
    )


@query(
    "dedup_remove_spans",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    wins AS MATERIALIZED (
      SELECT doc_id, w['i'] AS i, w['s'] AS s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, n - {SPAN_TOKENS - 2}),
                   i -> {{'i': i,
                         's': array_to_string(t[i:i+{SPAN_TOKENS - 1}], ' ')}}))
                 AS w
        FROM toks WHERE n >= {SPAN_TOKENS})
    ),
    flagged AS MATERIALIZED (
      SELECT s, MIN(doc_id) AS first_doc FROM wins GROUP BY s
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    cov AS (
      SELECT doc_id, list(DISTINCT p) AS cov FROM (
        SELECT w.doc_id, unnest(range(w.i, w.i + {SPAN_TOKENS})) AS p
        FROM wins w JOIN flagged f ON w.s = f.s
        WHERE w.doc_id <> f.first_doc
      ) GROUP BY doc_id
    ),
    rebuilt AS (
      SELECT tk.doc_id, tk.n,
             list_filter(list_transform(range(1, tk.n + 1),
                 idx -> CASE WHEN cov.cov IS NULL
                                  OR NOT list_contains(cov.cov, idx)
                             THEN tk.t[idx] END), x -> x IS NOT NULL) AS kept
      FROM toks tk LEFT JOIN cov ON tk.doc_id = cov.doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(n - len(kept) AS BIGINT) AS n_removed,
           md5(COALESCE(array_to_string(kept, ' '), '')) AS new_md5
    FROM rebuilt
    """,
)
def dedup_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL stage downstream of dedup_substring_spans (Lee et
    al. 2022 keep-first semantics): every {SPAN_TOKENS}-token window
    repeated across 2+ docs is cut from every document EXCEPT the one
    that saw it first (min doc_id), by deleting the token positions
    any flagged occurrence covers.  Emits per-doc removal accounting
    plus an md5 of the rebuilt text (the gate-hashable witness that
    the surgery is byte-identical cross-engine).

    Plan (span-hash shuffle, wired r8): window table projected to
    (doc_id, position, 128-bit span hash) in the map stage — the
    k-token string is materialized transiently in codegen and hashed
    before the first exchange, so the shuffle wire carries 24-byte
    fixed-width rows instead of raw span strings (~k× the corpus text
    previously).  One groupBy(h1, h2) builds the flagged table →
    hits = windows ⋈ flagged (equi-join on the hash pair; flagged is
    small, AQE broadcasts it) → covered positions collapse per doc
    (collect_set of at most n positions) → rebuild is a row-local
    indexed filter in codegen.  Docs without hits never join, never
    rebuild state — the left join keeps them verbatim.  Span TEXT is
    never needed downstream of detection (removal is positional), so
    unlike dedup_substring_spans no recovery pass exists here at all.
    Collision safety: the independent hash pair gives ~2^-128 per
    span pair (see dedup_substring_spans); a collision would remove a
    non-repeated span and break the md5 witness loudly.
    """
    k = SPAN_TOKENS
    d = _parallelize(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", F.split("text", " ").alias("t")
    ).withColumn("n", F.size("t"))
    d = d.localCheckpoint()  # windows, flagged and rebuild all reuse it
    wins = d.where(F.col("n") >= k).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, k)),
            )
        ).alias("i0", "s"),
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        F.xxhash64("s").alias("h1"),
        F.xxhash64(F.lit("ss2"), F.col("s")).alias("h2"),
    )
    flagged = (
        wins.groupBy("h1", "h2")
        .agg(
            F.countDistinct("doc_id").alias("nd"), F.min("doc_id").alias("first_doc")
        )
        .where(F.col("nd") >= 2)
        .select("h1", "h2", "first_doc")
    )
    cov = (
        wins.join(flagged, ["h1", "h2"])
        .where(F.col("doc_id") != F.col("first_doc"))
        .select("doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + (k - 1))).alias("p"))
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("cov"))
    )
    kept = F.filter(
        F.col("t"),
        lambda x, idx: F.coalesce(
            ~F.array_contains(F.coalesce(F.col("cov"), F.array().cast("array<int>")),
                              (idx + 1).cast("int")),
            F.lit(True),
        ),
    )
    return (
        d.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            (F.col("n") - F.size(kept)).cast("long").alias("n_removed"),
            F.md5(F.concat_ws(" ", kept)).alias("new_md5"),
        )
    )


@query(
    "pipeline_corpus_diff",
    # fixture split: "old" snapshot = docs with doc_id % 3 != 0 plus a
    # SIMULATED stale text for ids % 7 == 0 (lowercased); "new"
    # snapshot = docs with doc_id % 3 != 1.  The diff classifies every
    # id: added (new only), removed (old only), changed (both, text
    # fingerprint differs), unchanged.
    oracle="""
    WITH old AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN lower(text) ELSE text END)
               AS fp
      FROM documents WHERE doc_id % 3 <> 0
    ), new AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 3 <> 1
    )
    SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed'
                ELSE 'unchanged' END AS change,
           COUNT(*) AS n_docs,
           CAST(MIN(COALESCE(n.doc_id, o.doc_id)) AS BIGINT) AS min_doc,
           CAST(MAX(COALESCE(n.doc_id, o.doc_id)) AS BIGINT) AS max_doc
    FROM old o FULL OUTER JOIN new n USING (doc_id)
    GROUP BY 1
    """,
)
def pipeline_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1d: corpus SNAPSHOT DIFF — the incremental-ingestion audit
    step: classify every doc_id across two corpus versions as added /
    removed / changed / unchanged, comparing 16-byte content
    fingerprints so document text never crosses the join.

    One full-outer join on doc_id between two fingerprint projections
    (each a scan-stage md5), then one aggregation.  At 100 TB both
    sides shuffle only (id, 16-byte fp) — the diff costs the same as
    a count, whatever the documents weigh.  dedup_incremental is the
    ingest-time twin (anti join of new fingerprints); this is the
    audit-time one."""
    d = _docs(spark, sf_dir)
    old = d.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        F.md5(
            F.when(F.col("doc_id") % 7 == 0, F.lower("text")).otherwise(
                F.col("text")
            )
        ).alias("fp_old"),
    )
    new = d.filter(F.col("doc_id") % 3 != 1).select(
        "doc_id", F.md5("text").alias("fp_new")
    )
    joined = old.join(new, "doc_id", "full")
    change = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select("doc_id", change.alias("change"))
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )


# Bloom prefilter geometry: m = 2^16 bits in 2048 32-bit words, k = 3
# probes.  Positions come from the proven cross-engine fold (ascii
# polynomial over md5 substrings, mod 2^31-1 — the
# text_rolling_fingerprint hash), so both engines compute identical
# (32-bit words keep every shift < 2^31 — DuckDB checks signed
# left-shift overflow where Spark silently wraps)
# bit layouts with zero engine-specific hashing.
_BLOOM_BITS = 1 << 16
_BLOOM_K = 3
_BLOOM_FOLD_MOD = (1 << 31) - 1


def _bloom_pos_spark(md5col, j: int):
    seg = F.substring(md5col, 1 + 8 * j, 8)
    fold = F.aggregate(
        F.filter(F.split(seg, ""), lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % _BLOOM_FOLD_MOD,
    )
    return fold % _BLOOM_BITS


def _bloom_pos_sql(md5expr: str, j: int) -> str:
    return (
        f"(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substr({md5expr}, {1 + 8 * j}, 8), ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {_BLOOM_FOLD_MOD})) % {_BLOOM_BITS}"
    )


@query(
    "dedup_bloom_prefilter",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, md5(lower(text)) AS h, (doc_id % 5 = 0) AS incoming
        FROM documents
    ),
    base_pos AS (
        SELECT pos FROM (
            SELECT unnest([{", ".join(_bloom_pos_sql("h", j) for j in range(_BLOOM_K))}]) AS pos
            FROM fp WHERE NOT incoming
        )
    ),
    bloom AS (
        SELECT pos // 32 AS word, bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
        FROM base_pos GROUP BY pos // 32
    ),
    probe AS (
        SELECT doc_id, h,
               unnest([{", ".join(_bloom_pos_sql("h", j) for j in range(_BLOOM_K))}]) AS pos
        FROM fp WHERE incoming
    ),
    hits AS (
        SELECT p.doc_id, p.h,
               SUM(CASE WHEN b.bits IS NOT NULL
                         AND (b.bits & (1::BIGINT << CAST(p.pos % 32 AS INT))) <> 0
                        THEN 1 ELSE 0 END) AS n_set
        FROM probe p LEFT JOIN bloom b ON b.word = p.pos // 32
        GROUP BY p.doc_id, p.h
    ),
    exact AS (SELECT DISTINCT h FROM fp WHERE NOT incoming)
    SELECT hits.doc_id, hits.n_set = {_BLOOM_K} AS bloom_hit,
           exact.h IS NOT NULL AS exact_dup
    FROM hits LEFT JOIN exact ON exact.h = hits.h
    """,
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER membership prefilter for incremental dedup — the
    standard trick that lets a daily ingest skip the full anti-join
    for the (vast) majority of genuinely-new documents: build a
    {_BLOOM_BITS}-bit / k={_BLOOM_K} filter over the existing corpus'
    fingerprints, probe each incoming doc, and only bloom-POSITIVE
    docs proceed to the exact check.  Output per incoming doc:
    ``bloom_hit`` (filter says maybe-seen) and ``exact_dup`` (ground
    truth) — no false negatives by construction (pinned in
    tests/test_extensions.py), false positives bounded by the
    (k, m, n) geometry.

    Scale shape: the filter is an aggregation to AT MOST
    {_BLOOM_BITS // 32} words (one groupBy of 3 positions per base
    doc — map-side bit_or does nearly all of it), small enough to
    BROADCAST to the probe side no matter how big the corpus; probing
    is a broadcast join + bitwise AND, corpus text never moves.  At
    100 TB you'd size m up and shard the filter by key range; the
    word-table representation here IS that sharded layout.
    Determinism: positions derive from an ascii polynomial fold over
    md5 substrings — cross-engine identical, zero engine-specific
    hash functions."""
    d = _docs(spark, sf_dir)
    fp = d.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("h"),
        (F.col("doc_id") % 5 == 0).alias("incoming"),
    )
    pos_arr = F.array(
        *[_bloom_pos_spark(F.col("h"), j) for j in range(_BLOOM_K)]
    )
    base_pos = (
        fp.filter(~F.col("incoming"))
        .select(F.explode(pos_arr).alias("pos"))
    )
    bloom = base_pos.groupBy(
        (F.col("pos") / 32).cast("long").alias("word")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(1L, cast(pos % 32 as int))")
        ).alias("bits")
    )
    probe = fp.filter(F.col("incoming")).select(
        "doc_id", "h", F.explode(pos_arr).alias("pos")
    )
    hits = (
        probe.join(
            F.broadcast(bloom),
            (F.col("pos") / 32).cast("long") == F.col("word"),
            "left",
        )
        .groupBy("doc_id", "h")
        .agg(
            F.sum(
                F.when(
                    F.col("bits").isNotNull()
                    & (
                        F.col("bits").bitwiseAND(
                            F.expr("shiftleft(1L, cast(pos % 32 as int))")
                        )
                        != 0
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_set")
        )
    )
    exact = (
        fp.filter(~F.col("incoming")).select("h").distinct()
        .withColumnRenamed("h", "eh")
    )
    return (
        hits.join(F.broadcast(exact), hits.h == F.col("eh"), "left")
        .select(
            "doc_id",
            (F.col("n_set") == _BLOOM_K).alias("bloom_hit"),
            F.col("eh").isNotNull().alias("exact_dup"),
        )
    )
