"""Corpus-curation operators for LLM training-data pipelines
(SURVEY.md §2-D extensions; BASELINE.json north_star).

Three classic curation stages re-expressed Spark-first:

* Gopher-style heuristic quality gating (Rae et al. 2021, §A1.1) —
  word-count / mean-word-length / repetition / stopword rules as one
  row-local codegen stage, zero shuffle.
* RefinedWeb-style repeated-n-gram profiling (Penedo et al. 2023) —
  the fraction of a document's distinct 5-grams that occur in other
  documents, the signal behind cross-document boilerplate stripping.
* Dictionary + regex PII redaction (emails, long digit runs, entity
  dictionary) — a row-local regexp_replace chain that stays inside
  whole-stage codegen; the counts come from the *original* text so
  the three measures are independent of chain order.

At 100 TB: the quality gate and the redaction are embarrassingly
parallel scan-stage maps (no shuffle at all); the n-gram profile is
the tf/df pattern — one shuffle keyed by n-gram (hot boilerplate
n-grams are exactly the skew case AQE's skew-join splitting handles;
a stopword-style frequency cap on the df table is the manual swap),
one shuffle back on doc_id.  Nothing holds state proportional to
anything but its own partition.

The reference has no text operators at all — this whole module is a
north-star extension beyond the catalog surface
(/root/reference/src/catalog_provider/glue.rs has no query operators;
see SURVEY.md §0 for how its capability set decomposes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_catalogprovider_glue_spark.functions import let
from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

# Same function-word list as operators/text.py's language-ID heuristic;
# repeated literally in the SQL oracles.
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")
_SQL_STOPWORDS = ", ".join(f"'{w}'" for w in _STOPWORDS)

# Gopher-adapted thresholds, tuned to the synthetic corpus so every
# rule actually discriminates (word counts run 10..99, mean word
# lengths 3.7..5.3, distinct ratios 0.27..1.0 at sf0.01).
_MIN_WORDS, _MAX_WORDS = 30, 90
_MIN_MWL, _MAX_MWL = 3.9, 5.1
_MAX_WORD_LEN = 10
_MIN_DISTINCT_RATIO = 0.4
_MIN_STOPWORDS = 2

# PII patterns restricted to the Java∩RE2 regular subset (same
# portability rule as text_extract_regex): no backreferences, ASCII
# word boundaries only.
_EMAIL_PAT = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_NUM_PAT = "[0-9]{4,}"
_ENT_PAT = "\\b(customer|vector)\\b"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return load_table(spark, sf_dir, "documents")



def _grams5():
    """Distinct 5-gram strings of the ``text`` column, LET-BOUND so
    the split evaluates once per row (functions.let): Spark HOFs run
    interpreted and re-evaluate captured expressions per element, so
    an unbound split(text) inside the window transform costs O(n²)
    splits per document.  Guard: F.sequence(1, 0) would produce a
    DESCENDING [1, 0] (not an empty list), so short docs need the
    explicit empty branch."""

    def _body(w):
        n = F.size(w)
        return F.when(
            n >= 5,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - 4),
                    lambda i: F.array_join(F.slice(w, i, 5), " "),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(F.split(F.col("text"), " "), _body)


@query(
    "quality_gopher_filters",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS wc,
             len(replace(text, ' ', '')) AS letters
      FROM documents
    ), m AS (
      SELECT doc_id, wc,
             CAST(letters AS DOUBLE) / wc AS mwl,
             list_max(list_transform(w, x -> len(x))) AS max_wl,
             CAST(len(list_distinct(w)) AS DOUBLE) / wc AS dr,
             len(list_intersect(list_distinct(w), [{_SQL_STOPWORDS}])) AS n_stop
      FROM t
    )
    SELECT doc_id,
           wc AS word_count,
           ROUND(mwl, 6) AS mean_word_len,
           max_wl AS max_word_len,
           ROUND(dr, 6) AS distinct_ratio,
           n_stop AS n_stopwords,
           (wc BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}) AS pass_word_count,
           (mwl >= {_MIN_MWL} AND mwl <= {_MAX_MWL}) AS pass_mean_word_len,
           (max_wl <= {_MAX_WORD_LEN}) AS pass_max_word_len,
           (dr >= {_MIN_DISTINCT_RATIO}) AS pass_distinct_ratio,
           (n_stop >= {_MIN_STOPWORDS}) AS pass_stopwords,
           (wc BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
            AND mwl >= {_MIN_MWL} AND mwl <= {_MAX_MWL}
            AND max_wl <= {_MAX_WORD_LEN}
            AND dr >= {_MIN_DISTINCT_RATIO}
            AND n_stop >= {_MIN_STOPWORDS}) AS keep
    FROM m
    """,
)
def quality_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality gate: five rules, each surfaced
    as its own flag plus the conjunction, so downstream ablations can
    re-weight rules without re-scanning.

    Every measure is one integer aggregate over the token array plus
    at most one double divide, so the booleans are bit-identical
    across engines (no float accumulation order anywhere).  The whole
    operator is a single scan-stage projection — at 100 TB it
    pipelines with the parquet read and shuffles nothing.
    """
    d = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    wc = F.size(w)
    mwl = F.length(F.translate("text", " ", "")).cast("double") / wc
    max_wl = F.array_max(F.transform(w, F.length))
    dr = F.size(F.array_distinct(w)).cast("double") / wc
    n_stop = F.size(
        F.array_intersect(F.array_distinct(w), F.array(*[F.lit(s) for s in _STOPWORDS]))
    )
    d = d.select(
        "doc_id",
        wc.cast("long").alias("word_count"),
        mwl.alias("_mwl"),
        max_wl.cast("long").alias("max_word_len"),
        dr.alias("_dr"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    pass_wc = F.col("word_count").between(_MIN_WORDS, _MAX_WORDS)
    pass_mwl = (F.col("_mwl") >= _MIN_MWL) & (F.col("_mwl") <= _MAX_MWL)
    pass_max = F.col("max_word_len") <= _MAX_WORD_LEN
    pass_dr = F.col("_dr") >= _MIN_DISTINCT_RATIO
    pass_stop = F.col("n_stopwords") >= _MIN_STOPWORDS
    return d.select(
        "doc_id",
        "word_count",
        F.round("_mwl", 6).alias("mean_word_len"),
        "max_word_len",
        F.round("_dr", 6).alias("distinct_ratio"),
        "n_stopwords",
        pass_wc.alias("pass_word_count"),
        pass_mwl.alias("pass_mean_word_len"),
        pass_max.alias("pass_max_word_len"),
        pass_dr.alias("pass_distinct_ratio"),
        pass_stop.alias("pass_stopwords"),
        (pass_wc & pass_mwl & pass_max & pass_dr & pass_stop).alias("keep"),
    )


@query(
    "quality_doc_repetition",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS wc
      FROM documents
    ), ok AS (
      SELECT doc_id, t, wc FROM base WHERE wc >= 3
    ), c2 AS (
      SELECT doc_id, wc, MAX(c) AS m FROM (
        SELECT doc_id, wc, g, COUNT(*) AS c FROM (
          SELECT doc_id, wc,
                 unnest([array_to_string(t[i:i+1], ' ')
                         FOR i IN range(1, len(t))]) AS g
          FROM ok)
        GROUP BY doc_id, wc, g)
      GROUP BY doc_id, wc
    ), c3 AS (
      SELECT doc_id, MAX(c) AS m FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM (
          SELECT doc_id,
                 unnest([array_to_string(t[i:i+2], ' ')
                         FOR i IN range(1, len(t) - 1)]) AS g
          FROM ok)
        GROUP BY doc_id, g)
      GROUP BY doc_id
    )
    SELECT c2.doc_id AS doc_id, CAST(c2.wc AS BIGINT) AS word_count,
           ROUND(c2.m * 2.0 / c2.wc, 6) AS top2_cov,
           ROUND(c3.m * 3.0 / c2.wc, 6) AS top3_cov,
           c2.m * 2.0 / c2.wc <= 0.20 AS pass_rep2,
           c3.m * 3.0 / c2.wc <= 0.18 AS pass_rep3,
           (c2.m * 2.0 / c2.wc <= 0.20 AND c3.m * 3.0 / c2.wc <= 0.18)
             AS keep
    FROM c2 JOIN c3 ON c2.doc_id = c3.doc_id
    """,
)
def quality_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition signals (Gopher / Rae et al. 2021
    §A1.2 "repetition removal" — the rule family quality_gopher_filters
    deliberately omits): the fraction of the document covered by its
    single most frequent 2-gram and 3-gram, with Gopher's 0.20 / 0.18
    rejection thresholds (adapted to word fraction; Gopher measures
    character fraction — same signal, integer-deterministic here).
    Templated/spammy documents repeat one phrase hundreds of times and
    sail through word-level filters; this is the standard gate that
    catches them.

    Plan shape: grams explode to (doc_id, xxhash64(gram)) pairs —
    fixed-width rows, gram TEXT never keys an exchange (the span-hash
    contract) — then two hash aggregations with map-side partial
    combine (per-(doc, gram) count, max per doc).  Per-doc keys mean
    skew is bounded by document length; both n-gram passes join back
    on doc_id.  At 100 TB this is explode + combinable aggs, no
    all-pairs anything."""
    apply_engine_conf(spark)
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", F.split("text", " ").alias("t"))
        .where(F.size("t") >= 3)
        .select("doc_id", F.size("t").alias("wc"), "t")
    )

    def _top_cov(n: int, alias: str) -> DataFrame:
        grams = d.select(
            "doc_id",
            "wc",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(F.col("t"), i, n))
                    ),
                )
            ).alias("h"),
        )
        return (
            grams.groupBy("doc_id", "wc", "h")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id", "wc")
            .agg(F.max("c").alias(alias))
        )
    c2 = _top_cov(2, "m2")
    c3 = _top_cov(3, "m3").drop("wc")
    out = c2.join(c3, "doc_id")
    cov2 = F.col("m2") * 2.0 / F.col("wc")
    cov3 = F.col("m3") * 3.0 / F.col("wc")
    return out.select(
        "doc_id",
        F.col("wc").cast("long").alias("word_count"),
        F.round(cov2, 6).alias("top2_cov"),
        F.round(cov3, 6).alias("top3_cov"),
        (cov2 <= 0.20).alias("pass_rep2"),
        (cov3 <= 0.18).alias("pass_rep3"),
        ((cov2 <= 0.20) & (cov3 <= 0.18)).alias("keep"),
    )


@query(
    "text_dup_ngram_fraction",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 4),
               i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')))) AS ng
      FROM documents
    ), df AS (
      SELECT ng, count(*) AS df FROM g GROUP BY ng
    )
    SELECT g.doc_id,
           count(*) AS n_ngrams,
           CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           ROUND(CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_fraction
    FROM g JOIN df ON g.ng = df.ng
    GROUP BY g.doc_id
    """,
)
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style repeated-n-gram profile: per document, the
    fraction of its distinct 5-grams that also appear in at least one
    other document (document frequency >= 2; each document contributes
    a 5-gram once, so df counts documents).

    Plan (r8, join-back): grams project to a 128-bit xxhash64 pair in
    the map stage (the dedup_substring_spans treatment — gram text is
    never needed downstream; ~2^-128 collision safety), the df table
    aggregates on the hash pair, and per-doc attribution is ONE
    equi-join of the persisted gram table against it — a hot
    boilerplate gram is an ordinary skewed join key that AQE splits.
    The previous group-join (collect_list postings + re-explode)
    carried every hot gram's full posting list in a single
    UNSPLITTABLE aggregation buffer; after the hash/let rewrites the
    join-back measures faster at every scale probed (11.6→3.8 s at
    5k docs, 28.9→19.6 s at 500k) and removes the skew cliff.  A
    doc_id repartition first spreads the CPU-heavy gram build across
    the cluster.  The fraction is one integer divide, rounded once —
    engine-exact.
    """
    from datafusion_catalogprovider_glue_spark.operators.dedup import _parallelize

    d = _parallelize(_docs(spark, sf_dir), "doc_id")
    grams = _grams5()
    g = d.select("doc_id", F.explode(grams).alias("ng")).select(
        "doc_id",
        F.xxhash64("ng").alias("h1"),
        F.xxhash64(F.lit("ng2"), F.col("ng")).alias("h2"),
    ).persist()  # df aggregation and the attribution join both read it
    dfreq = g.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("df"))
    shared = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        g.join(dfreq, ["h1", "h2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            shared.cast("long").alias("n_shared"),
            F.round(shared.cast("double") / F.count(F.lit(1)), 6).alias("dup_fraction"),
        )
    )


@query(
    "text_pii_redact",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS n_email,
           len(regexp_extract_all(text, '{_NUM_PAT}')) AS n_number,
           len(regexp_extract_all(text, '{_ENT_PAT}')) AS n_entity,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
               '{_NUM_PAT}', '<NUM>', 'g'),
             '{_ENT_PAT}', '<ENT>', 'g') AS redacted
    FROM documents
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails, long digit runs, and a dictionary
    of entity terms are replaced with typed placeholders; per-doc hit
    counts are measured on the ORIGINAL text so the three counters are
    independent of the replacement order.

    Patterns stay in the Java∩RE2 regular subset so Spark and DuckDB
    agree byte-for-byte.  Row-local regexp chain → scan-stage codegen,
    zero shuffle, trivially parallel at any scale; the synthetic
    corpus has no emails/digits (those patterns exercise the
    no-match path) and real dictionary hits for the entity rule.
    """
    d = _docs(spark, sf_dir)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_PAT, "<EMAIL>"),
            _NUM_PAT,
            "<NUM>",
        ),
        _ENT_PAT,
        "<ENT>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_PAT), 0)).cast("long").alias(
            "n_email"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_NUM_PAT), 0)).cast("long").alias(
            "n_number"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_ENT_PAT), 0)).cast("long").alias(
            "n_entity"
        ),
        redacted.alias("redacted"),
    )


@query(
    "text_strip_boilerplate_prefix",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, text, string_split(text, ' ') AS t,
             array_to_string(string_split(text, ' ')[1:8], ' ') AS pre
      FROM documents
    ),
    counts AS (
      SELECT source, pre, COUNT(*) AS n
      FROM toks WHERE len(t) >= 8 GROUP BY source, pre
    ),
    top AS (
      SELECT source, pre FROM (
        SELECT source, pre, n,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n DESC, pre) AS rn
        FROM counts WHERE n >= 2
      ) WHERE rn = 1
    )
    SELECT k.doc_id,
           (top.pre IS NOT NULL) AS stripped,
           CASE WHEN top.pre IS NOT NULL
                THEN array_to_string(k.t[9:len(k.t)], ' ')
                ELSE k.text END AS out_text
    FROM toks k LEFT JOIN top
      ON k.source = top.source AND k.pre = top.pre
    """,
)
def text_strip_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix stripping (the C4/CCNet header-removal move):
    per source, the most frequent 8-token leading prefix — if it
    repeats at all (count >= 2, ties broken by prefix text) — is
    removed from documents that start with it.  This is the REMOVAL
    stage downstream of `text_dup_ngram_fraction`'s profiling.

    Plan: prefix extraction is scan-stage; the (source, prefix) count
    and per-source top-1 aggregate to O(sources) rows, which broadcast
    back onto the corpus — the fact table never shuffles for the join.
    The strip itself is a row-local token-slice.  At 100 TB the count
    table is the only shuffle and it collapses by the duplication
    factor; everything else pipelines with the scan.
    """
    d = _docs(spark, sf_dir)
    from pyspark.sql import Window

    t = F.split(F.col("text"), " ")
    toks = d.select(
        "doc_id",
        "source",
        "text",
        t.alias("t"),
        F.array_join(F.slice(t, 1, 8), " ").alias("pre"),
    )
    # prefix candidates must come from docs that actually have 8 tokens:
    # a shorter doc's "prefix" is the whole doc, and stripping it would
    # both empty the row and drive the slice length below zero.
    counts = (
        toks.filter(F.size("t") >= 8)
        .groupBy("source", "pre")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("pre"))
    top = (
        counts.filter(F.col("n") >= 2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "pre", F.lit(True).alias("is_top"))
    )
    joined = toks.join(F.broadcast(top), ["source", "pre"], "left")
    stripped = F.col("is_top").isNotNull()
    return joined.select(
        "doc_id",
        stripped.alias("stripped"),
        F.when(
            stripped,
            F.array_join(
                F.slice(F.col("t"), 9, F.greatest(F.size("t") - 8, F.lit(0))), " "
            ),
        )
        .otherwise(F.col("text"))
        .alias("out_text"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination / LM-frequency bucketing / source mixing
# ---------------------------------------------------------------------------

# Decontamination n-gram order.  Production pipelines use 8-13-gram
# overlap (GPT-3 appendix C; Lee et al. 2022); the synthetic corpus has
# no shared phrases that long, so the knob is 3 here — the plan shape
# (explode -> broadcast semi vs the benchmark set -> per-doc rollup) is
# identical at any n.
_DECON_N = 3
_BENCH_MOD, _BENCH_REM = 97, 3  # doc_id % 97 == 3 -> the "benchmark" set


@query(
    "pipeline_decontaminate",
    oracle=f"""
    WITH g AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - {_DECON_N - 1}),
               i -> array_to_string(string_split(text, ' ')[i:i+{_DECON_N - 1}], ' ')))) AS ng
      FROM documents
    ),
    bench AS MATERIALIZED (
      SELECT DISTINCT ng FROM g WHERE doc_id % {_BENCH_MOD} = {_BENCH_REM}
    ),
    hit AS (
      SELECT g.doc_id, count(*) AS n
      FROM g JOIN bench USING (ng)
      WHERE g.doc_id % {_BENCH_MOD} <> {_BENCH_REM}
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_overlap_ngrams,
           COALESCE(h.n, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {_BENCH_MOD} <> {_BENCH_REM}
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a held-out benchmark/eval set (the GPT-3 /
    Lee et al. 2022 contamination rule).  The benchmark here is the
    deterministic hash-slice ``doc_id % 97 == 3`` standing in for an
    external eval suite.

    Plan: each side's distinct n-grams are one explode; the benchmark
    gram set is tiny BY CONSTRUCTION (eval suites are a few thousand
    documents no matter how big the corpus is), so the candidate
    filter is a broadcast hash join against it — the 100 TB corpus
    side never shuffles, and the per-doc rollup shuffles only
    (doc_id, hit) pairs for contaminated docs.  Output is the full
    train-doc roster with an exact overlap count, left-join-complete
    so clean docs report 0 rather than vanishing.
    """
    d = _docs(spark, sf_dir)

    # n-grams travel as xxhash64 longs of the token-array slice (the
    # dedup_ngram_jaccard token-hash trick): no joined gram strings are
    # ever built, the broadcast hash table holds 8-byte keys, and
    # overlap COUNTS are hash-identical (64-bit collisions are
    # negligible at eval-suite sizes).  The oracle recomputes from RAW
    # gram strings — a hash match proves the swap result-preserving.
    # The token array is LET-BOUND (functions.let): the interpreted
    # window lambda would otherwise re-split the text per window.
    def _gram_hashes(t):
        return F.array_distinct(
            F.when(
                F.size(t) >= _DECON_N,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - F.lit(_DECON_N - 1)),
                    lambda i: F.xxhash64(F.slice(t, i, _DECON_N)),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        )

    grams = d.select(
        "doc_id",
        F.explode(
            let(F.split(F.col("text"), " "), _gram_hashes)
        ).alias("ng"),
    )
    is_bench = F.col("doc_id") % _BENCH_MOD == _BENCH_REM
    bench = grams.filter(is_bench).select("ng").distinct()
    hits = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        d.filter(~is_bench)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_overlap_ngrams"),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


@query(
    "quality_unigram_lm",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY tok),
    doc AS (
      SELECT doc_id, CAST(sum(t.tf) AS BIGINT) AS s, count(*) AS n
      FROM tok JOIN tf t USING (tok) GROUP BY doc_id
    )
    SELECT doc_id,
           ROUND(s / n, 6) AS lm_score,
           CASE ntile(3) OVER (ORDER BY s / n DESC, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS lm_bucket
    FROM doc
    """,
)
def quality_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al.
    2020) with the corpus itself as the unigram LM: each document is
    scored by the mean corpus frequency of its token occurrences
    (the log-free stand-in for unigram log-likelihood — monotone in
    it for the bucketing's purpose, and exactly reproducible where
    log() is not), then split into head/middle/tail thirds, the
    buckets CCNet uses to stage training data.

    Plan: token tf is one map-side-combined shuffle; the per-doc score
    re-uses the exploded tokens (tf/df pattern shared with
    text_tfidf); bucketing is NTILE over (score, doc_id) — a unique
    ordering, so the split is deterministic cross-engine.  The NTILE
    is the one global order statistic: at 100 TB swap the exact
    terciles for sampled thresholds (or the hierarchical prefix-sum
    from pipeline_pack_sequences) — noted rather than hidden.
    score = SUM(tf)/COUNT(*) is an int/int IEEE divide: bit-identical
    on both engines, rounded once for display.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    tf = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    doc = (
        tok.join(tf, "tok")
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    score = F.col("s") / F.col("n")
    w = Window.orderBy(score.desc(), F.col("doc_id"))
    tile = F.ntile(3).over(w)
    return doc.select(
        "doc_id",
        F.round(score, 6).alias("lm_score"),
        F.when(tile == 1, "head").when(tile == 2, "middle").otherwise("tail").alias(
            "lm_bucket"
        ),
    )


_MIX_HEX_SCALE = 16777216  # 16^6: md5 prefix as a 24-bit uniform draw


@query(
    "pipeline_mix_sources",
    oracle=f"""
    WITH stats AS MATERIALIZED (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
             sum(CAST(ROUND(sqrt(chars), 6) AS DECIMAL(38,6))) AS wsum
      FROM stats
    ),
    rates AS (
      SELECT s.source,
             ROUND(LEAST(1.0,
               CAST(CAST(ROUND(sqrt(s.chars), 6) AS DECIMAL(38,6)) AS DOUBLE)
               / CAST(t.wsum AS DOUBLE)
               * (t.n_total // 2) / s.n_docs), 6) AS sample_rate
      FROM stats s CROSS JOIN tot t
    )
    SELECT d.doc_id, d.source, r.sample_rate
    FROM documents d JOIN rates r USING (source)
    WHERE CASE WHEN r.sample_rate >= 1.0 THEN TRUE
          ELSE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)
               < lpad(lower(to_hex(CAST(floor(r.sample_rate * {_MIX_HEX_SCALE}) AS BIGINT))), 6, '0')
          END
    """,
)
def pipeline_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing — the data-mixing step that
    turns raw per-source corpus sizes into training sampling rates
    (the multinomial-with-temperature rule from XLM-R / mT5, tau=0.5):
    source weight w_s = sqrt(total_chars_s), target share p_s = w_s /
    sum(w), per-source accept rate r_s = min(1, p_s * M / n_s) for a
    target of M = N/2 sampled docs.  Rows are accepted by a
    deterministic md5 draw, so the SAME sample comes back on any
    engine, any cluster size, any run (the sample_hash contract).

    Cross-engine numerics, carefully: sqrt is IEEE-correctly-rounded
    on both engines (unlike pow — hence tau=1/2, not 0.7); each
    rounded weight goes onto a DECIMAL(38,6) grid so the SUM is exact
    and order-free (double summation order differs across engines);
    the remaining divides/multiplies are correctly-rounded doubles in
    a pinned evaluation order; the accept test compares 24-bit
    integers (Spark) against the equivalent lexicographic hex compare
    (DuckDB) — no float on the accept boundary.

    Plan: per-source stats are one map-side-combined agg over ~10^1-2
    groups; rates broadcast back; the accept filter runs in the scan's
    codegen stage.  Corpus rows never shuffle.
    """
    d = _docs(spark, sf_dir)
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    w_dec = F.round(F.sqrt(F.col("chars")), 6).cast("decimal(38,6)")
    stats = stats.select("source", "n_docs", w_dec.alias("w"))
    tot = stats.agg(
        F.sum("n_docs").alias("n_total"), F.sum("w").alias("wsum")
    )
    rates = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("w").cast("double")
                    / F.col("wsum").cast("double")
                    * F.expr("n_total DIV 2")
                    / F.col("n_docs"),
                ),
                6,
            ).alias("sample_rate"),
        )
    )
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    thr = F.floor(F.col("sample_rate") * _MIX_HEX_SCALE).cast("long")
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .filter((F.col("sample_rate") >= 1.0) | (u < thr))
        .select("doc_id", "source", "sample_rate")
    )


@query(
    "pipeline_repeat_upsample",
    # Epochs are exact integer arithmetic on per-source stats; the
    # repeat fan-out is generate_series — fully value-oracled.
    oracle="""
    WITH stats AS MATERIALIZED (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(max(chars) AS BIGINT) AS c_max FROM stats),
    epochs AS (
      SELECT s.source,
             CAST(LEAST((t.c_max + s.chars - 1) // s.chars, 4) AS BIGINT) AS n_epochs
      FROM stats s CROSS JOIN tot t
    )
    SELECT d.doc_id, d.source, e.n_epochs, CAST(r.epoch AS BIGINT) AS epoch
    FROM documents d
    JOIN epochs e USING (source)
    CROSS JOIN LATERAL (SELECT unnest(generate_series(1, e.n_epochs)) AS epoch) r
    """,
)
def pipeline_repeat_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-style up-sampling — the other half of data mixing next to
    `pipeline_mix_sources`' down-sampling: under-represented sources
    are repeated for multiple epochs (the LLaMA/Gopher recipe reports
    epochs per subset, e.g. Wikipedia 2.4 epochs), here with
    n_epochs = ceil(max_source_chars / source_chars) capped at 4 — a
    char (token-proxy) budget, the unit mixing recipes actually
    balance.  Every
    output row carries its epoch index so a downstream shuffle/pack
    stage can interleave repeats instead of emitting them back-to-back.

    Plan: per-source counts are a map-side-combined agg over O(sources)
    groups; the epoch table broadcasts back; the fan-out is a row-local
    explode(sequence) in the scan stage — the corpus never shuffles,
    and the fan-out factor is bounded by the epoch cap, not by skew.
    Integer ceil-divide everywhere: no float anywhere in the row set.
    """
    d = _docs(spark, sf_dir)
    stats = d.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    c_max = stats.agg(F.max("chars").alias("c_max"))
    epochs = stats.crossJoin(F.broadcast(c_max)).select(
        "source",
        # integer ceil-divide via DIV (exact BIGINT arithmetic, same as
        # DuckDB's // — a double divide could misround at 100 TB char
        # counts where the quotient sits within an ulp of an integer)
        F.least(
            F.expr("(c_max + chars - 1) DIV chars"),
            F.lit(4),
        )
        .cast("long")
        .alias("n_epochs"),
    )
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(epochs), "source")
        .select(
            "doc_id",
            "source",
            "n_epochs",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_epochs"))).alias(
                "epoch"
            ),
        )
    )


_TOKEN_BUDGET_CHARS = 4000  # per-source char (token-proxy) budget


@query(
    "pipeline_token_budget",
    # Hash-ordered prefix selection: deterministic on any engine, any
    # cluster, any run — the sample_hash contract applied to budgeted
    # corpus selection.
    oracle=f"""
    WITH c AS (
      SELECT doc_id, source, n_chars,
             CAST(SUM(n_chars) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
      FROM documents
    )
    SELECT doc_id, source, n_chars, cum_chars
    FROM c WHERE cum_chars <= {_TOKEN_BUDGET_CHARS}
    """,
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus selection: keep documents per source until a
    char (token-proxy) budget fills — how a mixing recipe's per-source
    token quotas actually materialize into a concrete document list.
    Docs are consumed in md5(doc_id) order, i.e. a deterministic
    unbiased shuffle: the SAME prefix is selected on any engine, any
    cluster size, any run (no randomSplit partitioning dependence).

    Plan: one window per source — the prefix sum parallelizes across
    sources, and a single source's doc list is the only serial unit
    (the same bound any per-source quota has).  The budget filter is
    a plain comparison on the running BIGINT sum — integers
    throughout.  At 100 TB with few giant sources, swap in the
    hierarchical prefix sum from pipeline_pack_sequences — noted, not
    hidden.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.sum("n_chars").over(w).cast("long").alias("cum_chars"),
        )
        .filter(F.col("cum_chars") <= _TOKEN_BUDGET_CHARS)
    )


@query(
    "pipeline_dataset_card",
    oracle=f"""
    WITH d AS (
      SELECT source, lang, text, n_chars,
             len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS n_words
      FROM documents
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_words) AS BIGINT) AS min_words,
           CAST(MAX(n_words) AS BIGINT) AS max_words,
           CAST(CAST(SUM(n_words) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mean_words,
           COUNT(DISTINCT md5(text)) AS n_unique_docs,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
             AS n_exact_dups
    FROM d GROUP BY source, lang
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset DATASHEET: per-(source, lang) composition stats a
    training run records next to its corpus — doc/word/char volumes,
    length envelope, and the exact-duplicate rate (datasheet-for-
    datasets practice; every mixture decision in pipeline_mix_sources
    starts from exactly this table).

    One pass, one shuffle: word counts are computed in the scan
    projection (JVM higher-order filter+size, no Python), and
    everything — including the dup rate, via COUNT(DISTINCT md5) on
    16-byte fingerprints rather than full texts — aggregates in a
    single map-side-combined groupBy.  At 100 TB this is the cheapest
    honest summary of a corpus: documents are read once and never
    shuffled."""
    d = _docs(spark, sf_dir)
    words = F.filter(F.split("text", " "), lambda w: w != "")
    return (
        d.select(
            "source",
            "lang",
            "n_chars",
            F.size(words).alias("n_words"),
            F.md5("text").alias("fp"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_words").cast("bigint").alias("min_words"),
            F.max("n_words").cast("bigint").alias("max_words"),
            (F.sum("n_words").cast("double") / F.count(F.lit(1))).alias(
                "mean_words"
            ),
            F.countDistinct("fp").alias("n_unique_docs"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_exact_dups"),
        )
    )


@query(
    "agg_entropy",
    oracle="""
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS n_xy
        FROM documents GROUP BY lang, source
    ),
    g AS (
        SELECT lang, SUM(n_xy) AS n,
               list(CAST(n_xy AS DOUBLE) ORDER BY source) AS xs
        FROM cells GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           ROUND(-list_reduce(list_prepend(0.0,
               list_transform(xs, x ->
                   (x / CAST(n AS DOUBLE)) * ln(x / CAST(n AS DOUBLE)))),
               (a, b) -> a + b), 9) AS source_entropy
    FROM g
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHANNON ENTROPY of the source distribution per language — the
    diversity measure behind data-mixing dashboards (a lang whose
    docs all come from one source is a contamination/skew smell).

    One corpus aggregation produces the (lang, source) cell counts;
    entropy folds over the per-lang cell list SORTED BY SOURCE — the
    pinned left-fold discipline (float addition is not associative,
    so both engines visit terms in the same order; the ln() calls see
    bit-identical ratios of exact counts and the result rounds at
    9 dp like agg_pmi_association).  At 100 TB: cells are
    |langs|x|sources| rows — the corpus contributes exactly one
    map-side-combined groupBy."""
    d = _docs(spark, sf_dir)
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_xy"))
    g = cells.groupBy("lang").agg(
        F.sum("n_xy").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("source", "n_xy"))),
            lambda s: s["n_xy"].cast("double"),
        ).alias("xs"),
    )
    n_d = F.col("n").cast("double")
    ent = -F.aggregate(
        F.transform(F.col("xs"), lambda x: (x / n_d) * F.log(x / n_d)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return g.select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(ent, 9).alias("source_entropy"),
    )


@query(
    "agg_gini",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS i
        FROM documents
    ),
    g AS (
        SELECT source, COUNT(*) AS n, SUM(n_chars) AS s1,
               SUM(i * n_chars) AS s2
        FROM ranked GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(s1 AS BIGINT) AS sum_chars,
           ROUND((2.0 * CAST(s2 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE))
                 - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 9) AS gini
    FROM g
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of document length per source — the
    concentration measure curation dashboards use to spot sources
    whose token mass hides in a few huge documents (sampling and
    packing behave differently there).

    Exact arithmetic throughout the heavy part: the rank-weighted sum
    Sum(i * n_chars) and Sum(n_chars) are BIGINT aggregates over a
    deterministic (n_chars, doc_id) ranking, so both engines hold
    identical integers and the final Gini formula is a handful of
    identical IEEE ops rounded at 9 dp.  One shuffle to rank within
    source, one aggregation — at 100 TB the rank is the standard
    per-group sort Spark already distributes."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source", "n_chars", F.row_number().over(w).cast("long").alias("i")
    )
    g = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s1"),
        F.sum(F.col("i") * F.col("n_chars")).alias("s2"),
    )
    gini = (
        (2.0 * F.col("s2").cast("double"))
        / (F.col("n").cast("double") * F.col("s1").cast("double"))
        - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
    )
    return g.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("s1").cast("bigint").alias("sum_chars"),
        F.round(gini, 9).alias("gini"),
    )


@query(
    "pipeline_curriculum_order",
    oracle="""
    WITH idx AS (
        SELECT source,
               CAST(DENSE_RANK() OVER (ORDER BY source) AS BIGINT) - 1
                   AS src_idx,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_sources
        FROM (SELECT DISTINCT source FROM documents)
    ),
    ranked AS (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY n_chars, doc_id)
                    AS BIGINT) - 1 AS rank_in_source
        FROM documents
    )
    SELECT r.doc_id, r.source, r.n_chars,
           r.rank_in_source * i.n_sources + i.src_idx AS global_pos
    FROM ranked r JOIN idx i USING (source)
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM ORDERING — a deterministic global training order
    that is easy-to-hard (short documents first, length as the
    difficulty proxy) while staying source-interleaved, so no shard of
    the resulting stream is ever single-source.

    The trick is that the global position is ARITHMETIC, not sorted:
    rank documents within each source by (n_chars, doc_id), give each
    source a dense index, and emit global_pos = rank * n_sources +
    src_idx — a perfect round-robin interleave with no global sort, no
    single-partition window, no driver collect.  The only shuffles are
    one per-source window (keyed by source; AQE splits a skewed giant
    source) and a broadcast of the |sources|-row index table, which
    carries n_sources as a full-frame window count over itself — a
    separate countDistinct aggregate would make Catalyst scan the
    corpus a third time (CTEs aren't materialized).  The
    consumer writes with write.partitionBy on global_pos ranges or
    sorts WITHIN partitions — either way the 100 TB plan never needs
    a total-order exchange, which is what makes curriculum emission
    feasible at all at that scale.
    """
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    full = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                F.dense_rank().over(Window.orderBy("source")).cast("bigint")
                - 1
            ).alias("src_idx"),
            F.count(F.lit(1)).over(full).cast("bigint").alias("n_sources"),
        )
    )
    rank_w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.row_number().over(rank_w).cast("bigint") - 1).alias(
            "rank_in_source"
        ),
    )
    return ranked.join(F.broadcast(idx), "source").select(
        "doc_id",
        "source",
        "n_chars",
        (
            F.col("rank_in_source") * F.col("n_sources") + F.col("src_idx")
        ).alias("global_pos"),
    )


@query(
    "text_ngram_novelty",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 4),
               i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))))
                 AS ng
      FROM documents
    ),
    fd AS (
      SELECT ng, MIN(doc_id) AS first_doc FROM g GROUP BY ng
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN fd.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(CAST(CAST(SUM(CASE WHEN fd.first_doc = g.doc_id
                               THEN 1 ELSE 0 END) AS VARCHAR) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM g JOIN fd ON g.ng = fd.ng
    GROUP BY g.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOVELTY SCORING — per document, the fraction of its distinct
    5-grams that no EARLIER document (smaller doc_id = earlier in the
    stream) contains; the dedup-adjacent signal curation pipelines use
    to rank crawl snapshots and decide what a new batch actually adds
    on top of the corpus so far.

    Same group-join shape as text_dup_ngram_fraction: the n-gram-keyed
    aggregation computes the first-introducing doc AND carries the
    posting list in one pass, then re-explodes for the per-doc rollup
    — and the min-doc table is O(1) state per gram under a streaming
    min (no posting lists anywhere).  Counts are exact integers; the
    fraction is one divide rounded at 6 dp.
    """
    from datafusion_catalogprovider_glue_spark.operators.dedup import _parallelize

    d = _parallelize(_docs(spark, sf_dir), "doc_id")
    # r8 join-back (see text_dup_ngram_fraction): hash-pair gram keys,
    # min-doc table, one AQE-splittable attribution join — hot
    # boilerplate grams no longer build unsplittable posting buffers
    g = d.select("doc_id", F.explode(_grams5()).alias("ng")).select(
        "doc_id",
        F.xxhash64("ng").alias("h1"),
        F.xxhash64(F.lit("ng2"), F.col("ng")).alias("h2"),
    ).persist()
    first = g.groupBy("h1", "h2").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0))
    return (
        g.join(first, ["h1", "h2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            novel.cast("bigint").alias("n_novel"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("novelty"),
        )
    )


@query(
    "pipeline_tokenizer_fertility",
    # Ratios of exact integer sums, one double divide each, rounded
    # at 6 dp — engine-deterministic.
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_words,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
                AS BIGINT) AS bpe_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_bytes,
           ROUND(CAST(CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS VARCHAR) AS DOUBLE)
                 / SUM(len(string_split(text, ' '))), 6) AS fertility,
           ROUND(CAST(CAST(SUM(length(text)) AS VARCHAR) AS DOUBLE)
                 / SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))),
                 6) AS bytes_per_token
    FROM documents GROUP BY lang, source
    """,
)
def pipeline_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY audit — tokens-per-word and bytes-per-token
    per (lang, source) slice under the BPE-ish pre-tokenizer (the
    pipeline_bpe_* pre-tokenization).  Fertility is THE
    tokenizer-equity metric: a slice whose fertility runs hot pays
    more compute per word and gets shorter effective context, so
    multilingual data mixes are rebalanced on exactly this table.

    Plan: one scan, all counting row-local in codegen (split + regexp
    extraction), one low-cardinality groupBy with map-side combine —
    the text_stats shape, embarrassingly parallel at any scale."""
    d = _docs(spark, sf_dir)
    ws = F.size(F.split("text", " "))
    bpe = F.size(
        F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    )
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(ws).cast("bigint").alias("ws_words"),
        F.sum(bpe).cast("bigint").alias("bpe_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_bytes"),
        F.round(
            F.sum(bpe).cast("double") / F.sum(ws), 6
        ).alias("fertility"),
        F.round(
            F.sum(F.length("text")).cast("double") / F.sum(bpe), 6
        ).alias("bytes_per_token"),
    )


_GATE_STAGES_SQL = """
    WITH feat AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ('the','a','of','and','to','in','is','on')))
                    AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
               CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
                 / length(text) AS punct_ratio
        FROM documents
    ),
    c AS MATERIALIZED (
        SELECT COUNT(*) AS n0,
               SUM(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN n_tokens >= 20 AND stop_ratio >= 0.02
                        THEN 1 ELSE 0 END) AS n2,
               SUM(CASE WHEN n_tokens >= 20 AND stop_ratio >= 0.02
                             AND punct_ratio <= 0.3
                        THEN 1 ELSE 0 END) AS n3
        FROM feat
    )
"""


@query(
    "pipeline_quality_gate_report",
    oracle=_GATE_STAGES_SQL
    + """
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage, 'min_length' AS gate,
               CAST(n0 AS BIGINT) AS n_in, CAST(n1 AS BIGINT) AS n_out,
               ROUND(CAST(n0 - n1 AS DOUBLE) / n0, 6) AS drop_rate
        FROM c
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'stopword_ratio', CAST(n1 AS BIGINT),
               CAST(n2 AS BIGINT), ROUND(CAST(n1 - n2 AS DOUBLE) / n1, 6)
        FROM c
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'punct_ratio', CAST(n2 AS BIGINT),
               CAST(n3 AS BIGINT), ROUND(CAST(n2 - n3 AS DOUBLE) / n2, 6)
        FROM c
    ) t
    """,
)
def pipeline_quality_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-GATE FUNNEL report: the per-stage survivor counts of a
    filtering cascade (length → stopword-ratio → punctuation) — the
    observability table that tells a curation team WHICH gate is
    eating their corpus before they ship a mix.  Stages apply
    cumulatively, exactly as the production filter would.

    Plan: one scan computes all per-doc features row-local, one
    global aggregation emits every stage's counter simultaneously
    (no per-stage re-scan — the CASE tower is map-side combined),
    and the 3-row funnel is assembled from that single counter row.
    At 100 TB this is the cheapest shape a funnel report can have:
    scan once, count everything in one pass."""
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n_tokens = F.size(words)
    stop_ratio = (
        F.size(
            F.filter(
                words,
                lambda w: w.isin(
                    "the", "a", "of", "and", "to", "in", "is", "on"
                ),
            )
        ).cast("double")
        / n_tokens
    )
    punct_ratio = (
        F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0)).cast(
            "double"
        )
        / F.length("text")
    )
    g1 = n_tokens >= 20
    g2 = g1 & (stop_ratio >= 0.02)
    g3 = g2 & (punct_ratio <= 0.3)
    c = d.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(g1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(g2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(g3, 1).otherwise(0)).alias("n3"),
    )
    stages = [
        (1, "min_length", "n0", "n1"),
        (2, "stopword_ratio", "n1", "n2"),
        (3, "punct_ratio", "n2", "n3"),
    ]
    # ONE row explodes into the funnel — selecting each stage from the
    # aggregate separately and unioning would re-run the corpus scan
    # per stage
    funnel = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(stage).cast("bigint").alias("stage"),
                    F.lit(gate).alias("gate"),
                    F.col(ci).cast("bigint").alias("n_in"),
                    F.col(co).cast("bigint").alias("n_out"),
                )
                for stage, gate, ci, co in stages
            ]
        )
    )
    return c.select(funnel.alias("s")).select(
        F.col("s.stage").alias("stage"),
        F.col("s.gate").alias("gate"),
        F.col("s.n_in").alias("n_in"),
        F.col("s.n_out").alias("n_out"),
        F.round(
            (F.col("s.n_in") - F.col("s.n_out")).cast("double")
            / F.col("s.n_in"),
            6,
        ).alias("drop_rate"),
    )


RESAMPLE_CHARS_CAP = 4000  # weight = min(n_chars, cap) / cap
_U48 = 1 << 48             # md5-derived uniform resolution


@query(
    "pipeline_importance_resample",
    # keep iff u < w, decided in EXACT integer arithmetic:
    # u48 * cap < min(n_chars, cap) * 2^48 — no float compare, no
    # boundary drift; md5 hex parses identically in both engines
    oracle=f"""
    SELECT doc_id, n_chars,
           CAST(LEAST(n_chars, {RESAMPLE_CHARS_CAP}) AS DOUBLE)
             / {RESAMPLE_CHARS_CAP} AS keep_weight
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
            * {RESAMPLE_CHARS_CAP}
          < LEAST(n_chars, {RESAMPLE_CHARS_CAP}) * CAST({_U48} AS BIGINT)
    """,
)
def pipeline_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling: keep each document with probability
    proportional to a quality weight (here min(n_chars, cap)/cap — in
    production a model-based quality score), decided by a DETERMINISTIC
    per-document coin: the first 48 bits of md5(doc_id) as a uniform
    draw.  This is the DoReMi/quality-resampling primitive — reweights
    a corpus toward its long documents without a shuffle, a sort, or a
    random() that would make reruns disagree.

    The accept test u < w runs in exact integer arithmetic
    (u48·cap < min(n_chars,cap)·2^48), so both engines keep exactly
    the same roster — hash-checkable, and at 100 TB the operator is a
    stateless scan-stage filter: no aggregation, no join, perfectly
    parallel, and reproducible across reruns and cluster sizes (the
    property sample()/rand() surrenders)."""
    d = _docs(spark, sf_dir)
    u48 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    w_num = F.least(F.col("n_chars"), F.lit(RESAMPLE_CHARS_CAP))
    return (
        d.filter(u48 * RESAMPLE_CHARS_CAP < w_num * F.lit(_U48))
        .select(
            "doc_id",
            "n_chars",
            (w_num.cast("double") / RESAMPLE_CHARS_CAP).alias("keep_weight"),
        )
    )
