"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md §2-D4; BASELINE.json north_star).

Everything is built from JVM-side ``pyspark.sql.functions`` —
tokenization, regex counting, higher-order array functions — so the
hot path stays inside whole-stage codegen with zero Python.  At
100 TB these are embarrassingly parallel per-row transforms followed
by (for the rollups) a partial-aggregated groupBy on low-cardinality
keys: one small shuffle, no skew risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.functions import let
from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

# tiny English function-word list for the language-ID heuristic;
# identical literal list in the SQL oracles
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")
_SQL_STOPWORDS = ", ".join(f"'{w}'" for w in STOPWORDS)

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return load_table(spark, sf_dir, "documents")


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


@query(
    "text_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(len(string_split(text, ' '))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_tokens,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: per-(lang, source) corpus rollup.  Integer sums are exact,
    the average is one double divide — engine-deterministic."""
    d = _docs(spark, sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum(F.size(_words())).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex pre-tokenizer
    (letter runs / digit runs / single symbols)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(_words()).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).cast("long").alias(
            "bpe_tokens"
        ),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                                      w -> w IN ({_SQL_STOPWORDS}))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS en_ratio,
           CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                          w -> w IN ({_SQL_STOPWORDS}))) AS DOUBLE)
                     / len(string_split(text, ' ')) >= 0.05
                THEN 'en' ELSE 'other' END AS pred_lang
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: share of tokens that are English function
    words (an n-gram/stopword detector's core signal).  The testdata
    vocabulary is synthetic so the prediction itself is boring — the
    point is the deterministic, fully-vectorized plumbing."""
    d = _docs(spark, sf_dir)
    words = _words()
    hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    ratio = hits.cast("double") / F.size(words)
    return d.select(
        "doc_id",
        "lang",
        F.round(ratio, 6).alias("en_ratio"),
        F.when(ratio >= 0.05, "en").otherwise("other").alias("pred_lang"),
    )


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           ROUND(CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
                 / length(text), 6) AS punct_ratio,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                                      w -> w IN ({_SQL_STOPWORDS}))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND(0.4 * (CAST(len(list_filter(string_split(text, ' '),
                                             w -> w IN ({_SQL_STOPWORDS}))) AS DOUBLE)
                        / len(string_split(text, ' ')))
                 + 0.3 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0)
                 + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
                                / length(text)), 6) AS quality_score
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword-ratio features
    combined into one score — the standard cheap pre-filter before
    expensive model-based quality classifiers."""
    d = _docs(spark, sf_dir)
    words = _words()
    n_tokens = F.size(words)
    punct = F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0))
    punct_ratio = punct.cast("double") / F.length("text")
    stop_ratio = (
        F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast("double") / n_tokens
    )
    score = (
        0.4 * stop_ratio
        + 0.3 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
    )
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


# Rabin-Karp rolling-hash fingerprinting: polynomial hash of every
# w-char window, base 31 mod 2^31-1.  The declarative form recomputes
# each window (the O(1) rolling update needs imperative state), but the
# VALUES are exactly a rolling hasher's output, so the fingerprints are
# portable — and the oracle recomputes them independently in DuckDB.
FP_WINDOW = 8
_FP_MOD = (1 << 31) - 1
_FP_BASE = 31


def _window_hashes(text_col):
    def _rh(strcol):
        return F.aggregate(
            F.split(strcol, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * _FP_BASE + F.ascii(c)) % _FP_MOD,
        )

    starts = F.sequence(
        F.lit(1), F.greatest(F.length(text_col) - (FP_WINDOW - 1), F.lit(1))
    )
    return F.transform(starts, lambda i: _rh(text_col.substr(i, F.lit(FP_WINDOW))))


@query(
    "text_rolling_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_min([list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                                    list_transform(string_split(substr(text, CAST(i AS INT), {FP_WINDOW}), ''),
                                                   c -> CAST(ascii(c) AS BIGINT))),
                       (acc, c) -> (acc * {_FP_BASE} + c) % {_FP_MOD})
                     FOR i IN range(1, GREATEST(length(text) - {FP_WINDOW - 1}, 1) + 1)])
             AS min_fingerprint,
           CAST(GREATEST(length(text) - {FP_WINDOW - 1}, 1) AS INT) AS n_windows
    FROM documents
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via rolling hash (winnowing-lite: the
    minimum window hash is the document's fingerprint — robust to
    small edits anywhere except around the minimizing window, which is
    the property winnowing builds on).  All JVM-side higher-order
    functions; at 100 TB this is a pure map stage."""
    from datafusion_catalogprovider_glue_spark.operators.dedup import _parallelize

    d = _parallelize(_docs(spark, sf_dir), "doc_id")
    # the window-hash array is referenced once (array_min); n_windows
    # re-derives from the text length so the array is never computed
    # twice per row (r8 — it previously fed both projections)
    return d.select(
        "doc_id",
        F.array_min(_window_hashes(F.col("text"))).alias("min_fingerprint"),
        F.greatest(
            F.length("text") - (FP_WINDOW - 1), F.lit(1)
        ).cast("int").alias("n_windows"),
    )


@query(
    "text_ngrams",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                        i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w)
    SELECT bigram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM g GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram LIMIT 50
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram extraction (word bigrams): the vocabulary /
    phrase-mining step of a training-data pipeline.  Bigram expansion
    is a JVM ``transform`` over index sequences (no Python, no UDF);
    the count is one map-side-combined groupBy on the bigram string.
    At 100 TB the bigram key space is Zipf-skewed — AQE's skew-join
    handling and partial aggregation absorb it; the final top-50 is
    TakeOrderedAndProject, never a global sort."""
    d = _docs(spark, sf_dir)
    # token array LET-BOUND (functions.let): the interpreted window
    # lambda would otherwise re-split the text per bigram
    bigrams = let(
        F.split(F.lower(F.col("text")), " "),
        lambda ws: F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat(
                F.element_at(ws, i), F.lit(" "), F.element_at(ws, i + 1)
            ),
        ),
    )
    return (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram"))
        .limit(50)
    )


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (lowercase, strip non-alphanumerics, collapse
    whitespace) — the canonicalization step before exact/near dedup.
    Pure codegen regex chain, row-local, zero shuffle.  Spark's
    regexp_replace is global by default; the oracle passes DuckDB the
    'g' flag for the same semantics."""
    d = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select("doc_id", norm.alias("norm_text"))


@query(
    "text_tfidf",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT t.doc_id, t.term, t.tf,
               t.tf * (n.n_docs + 1.0) / (d.df_docs + 1.0) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY t.doc_id
                   ORDER BY t.tf * (n.n_docs + 1.0) / (d.df_docs + 1.0) DESC,
                            t.term
               ) AS rnk
        FROM tf t JOIN dfreq d ON t.term = d.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, score, CAST(rnk AS BIGINT) AS rnk
    FROM scored WHERE rnk <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: top-3 characteristic terms per document by tf-idf.

    Three distributed stages: (1) tokenize + per-(doc, term) counts —
    one shuffle on (doc_id, term); (2) document frequency per term —
    a second, smaller aggregation reusing the tf relation (no second
    corpus scan); (3) join tf with df on term and rank per document.
    The term join is zipf-skewed (stopwords hit every doc) — AQE's
    skew-join splitting handles the hot terms; at 100 TB add a
    frequency-capped stopword pre-filter (df above ~50% of corpus
    carries no signal) to shrink the join's hot side by orders of
    magnitude before it shuffles.

    Determinism: the idf factor is the LOG-FREE ratio
    (N + 1) / (df + 1) — Java's Math.log and DuckDB's libm log are not
    guaranteed to agree in the last ulp, while multiply/divide are
    exactly-rounded IEEE ops that match bit-for-bit.  Ranking breaks
    score ties by the term itself, so top-3 is stable across engines
    and partitionings."""
    d = _docs(spark, sf_dir)
    tokens = d.select("doc_id", F.explode(_words()).alias("term"))
    tf = tokens.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    ndocs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (
        F.col("tf") * (F.col("n_docs") + F.lit(1.0)) / (F.col("df_docs") + F.lit(1.0))
    )
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn("score", score)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "score", "rnk")
    )


@query(
    "pipeline_clean_corpus",
    oracle="""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS norm_text
        FROM documents
    ),
    gated AS (
        SELECT doc_id, norm_text, len(string_split(norm_text, ' ')) AS n_tokens
        FROM norm
        WHERE len(string_split(norm_text, ' ')) >= 20
    ),
    dedup AS (
        SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens,
               md5(norm_text) AS fingerprint
        FROM gated GROUP BY norm_text
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, fingerprint
    FROM dedup
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          IN ('0', '1', '2', '3', '4', '5', '6', '7')
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composite: the canonical training-corpus cleaning
    pipeline as ONE dataflow — normalize → length gate → exact dedup
    (keep lowest doc_id) → stable 50% hash sample.  Because every
    stage is an operator this engine already proves individually
    (text_normalize, text_quality's gate, dedup_exact, sample_hash),
    the composite's oracle is plain SQL over the whole chain.

    Plan economics at 100 TB: normalize + gate + the sample predicate
    are all row-local codegen (the sample could run before dedup, but
    then near-identical docs straddling the sample boundary would
    survive — order matters semantically, so the one shuffle is the
    dedup groupBy on the normalized-text hash).  Everything before it
    is map-side; everything after is a projection.  One shuffle for a
    four-stage pipeline."""
    d = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    gated = d.select("doc_id", norm.alias("norm_text")).withColumn(
        "n_tokens", F.size(F.split("norm_text", " ")).cast("long")
    ).filter(F.col("n_tokens") >= 20)
    deduped = gated.groupBy("norm_text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return deduped.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3", "4", "5", "6", "7"
        )
    ).select("doc_id", "n_tokens", F.md5("norm_text").alias("fingerprint"))


@query(
    "text_containment",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang,
               list_distinct(string_split(text, ' ')) AS wset
        FROM documents
    )
    SELECT a.doc_id AS src_id, b.doc_id AS dst_id,
           ROUND(CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
                 / len(a.wset), 6) AS containment
    FROM w a
    JOIN w b ON a.lang = b.lang AND a.doc_id <> b.doc_id
    WHERE len(a.wset) * 2 <= len(b.wset)
      AND CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
          / len(a.wset) >= 0.9
    """,
)
def text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment |A∩B| / |A| ≥ 0.9 — catches a short doc
    embedded inside a much longer one (quotation, boilerplate reuse,
    excerpting), which symmetric Jaccard misses by construction: a
    100-word doc fully contained in a 10,000-word doc has Jaccard
    ~0.01 but containment 1.0.  Blocking: lang equi-join plus the
    directional size gate |A|·2 ≤ |B| (containment hunting only makes
    sense into strictly larger docs), which also orients each pair
    once — no canonical-pair dedup needed.  Same intersection kernel
    and AQE-skew playbook as dedup_ngram_jaccard — including its
    token-hash payload: the word sets travel the shuffle and hit the
    per-pair intersection as xxhash64 longs (8 B/token, long equality)
    instead of raw strings; distinct/intersect COUNTS are identical on
    the hashed sets, so containment values don't change (measured
    25.7 s -> ~3 s at sf0.1 — string array_intersect per pair was the
    whole cost).

    Candidate generation is PREFIX-FILTERED (the asymmetric AllPairs
    bound): C(A→B) ≥ t means B misses at most ⌊(1−t)·|A|⌋ of A's
    tokens, so B must contain at least one of ANY
    (|A| − ⌈t·|A|⌉ + 1)-subset of A — in particular A's rarest
    tokens under the corpus document-frequency order.  Probing only
    those rare tokens against a full inverted index of the larger
    docs keeps the candidate count ~linear in corpus size where the
    plain lang-blocked all-pairs join (the old plan) grew
    quadratically: the 2× size gate alone leaves Θ(n²) candidate
    pairs, each paying an O(|A|+|B|) intersection (measured 8.7 s →
    ~2 s at sf0.1; at 100 TB the all-pairs form is simply not
    runnable).  Verification recomputes exact containment on the
    full hashed word sets, so the prefix filter is
    result-preserving by the bound above — and the oracle still
    computes the unblocked quadratic semantics independently.  At
    100 TB swap the word sets for minhash-of-shingles and this
    becomes approximate containment (Broder), same plan shape."""
    t = 0.9
    d = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.transform(
                F.array_distinct(F.split("text", " ")), lambda s: F.xxhash64(s)
            ).alias("wset"),
        )
        .withColumn("n", F.size("wset"))
        .localCheckpoint()  # read once: postings, df, and verify reuse it
    )
    post = d.select("doc_id", "lang", "n", F.explode("wset").alias("tok"))
    dfreq = post.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("df"))
    # prefix length |A| − ⌈t·|A|⌉ + 1: the pigeonhole bound — if B
    # shared none of these, it would miss more than ⌊(1−t)|A|⌋ tokens
    prefix_len = (F.col("n") - F.ceil(F.col("n") * t) + 1).cast("int")
    pre = (
        post.join(dfreq, ["lang", "tok"])
        .groupBy("doc_id", "lang", "n")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("by_rarity")
        )
        .select(
            "doc_id",
            "lang",
            "n",
            F.explode(F.slice(F.col("by_rarity"), F.lit(1), prefix_len)).alias(
                "tok"
            ),
        )
        .alias("pa")
    )
    pb = post.alias("pb")
    cand = (
        pre.join(
            pb,
            (F.col("pa.lang") == F.col("pb.lang"))
            & (F.col("pa.tok") == F.col("pb.tok"))
            & (F.col("pa.doc_id") != F.col("pb.doc_id"))
            # directional size gate: containment hunting only into docs
            # at least twice as large (also orients each pair once)
            & (F.col("pa.n") * 2 <= F.col("pb.n")),
        )
        .select(
            F.col("pa.doc_id").alias("src_id"),
            F.col("pb.doc_id").alias("dst_id"),
        )
        .distinct()  # a pair may share several prefix tokens
    )
    da = d.select(F.col("doc_id").alias("src_id"), F.col("wset").alias("wa"))
    db = d.select(F.col("doc_id").alias("dst_id"), F.col("wset").alias("wb"))
    containment = (
        F.size(F.array_intersect(F.col("wa"), F.col("wb"))).cast("double")
        / F.size(F.col("wa"))
    )
    return (
        cand.join(da, "src_id")
        .join(db, "dst_id")
        .withColumn("containment", F.round(containment, 6))
        .filter(F.col("containment") >= t)
        .select("src_id", "dst_id", "containment")
    )


REGEX_DIGRAPH = "[a-z]*(?:oo|ee|ll|ss)[a-z]*"


@query(
    "text_extract_regex",
    oracle=f"""
    SELECT m AS token, COUNT(*) AS n_occurrences
    FROM (
        SELECT unnest(regexp_extract_all(text, '{REGEX_DIGRAPH}')) AS m
        FROM documents
    ) GROUP BY m
    """,
)
def text_extract_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25 depth: corpus-wide regex extraction — every token containing
    a double-letter digraph, exploded and counted.  The pattern avoids
    backreferences deliberately: Java regex (Spark) would accept them
    but RE2 (DuckDB) has none, and a portable extraction pipeline
    sticks to the regular subset both engines compile identically
    (greedy runs + non-capturing alternation).  Extraction and the
    explode run in the scan's codegen stage; the only shuffle is the
    final token rollup, whose cardinality is vocabulary-, not
    corpus-sized."""
    d = _docs(spark, sf_dir)
    return (
        d.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(REGEX_DIGRAPH), 0)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


BM25_TERMS = ("data", "table", "query")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


@query(
    "text_bm25_search",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), stats AS (
        SELECT COUNT(*) AS n, SUM(len(w)) * 1.0 / COUNT(*) AS avgdl FROM d
    ), tf AS (
        SELECT doc_id, len(w) AS dl,
               len(list_filter(w, x -> x = 'data'))  AS tf1,
               len(list_filter(w, x -> x = 'table')) AS tf2,
               len(list_filter(w, x -> x = 'query')) AS tf3
        FROM d
    ), df AS (
        SELECT SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
               SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
               SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
        FROM tf
    )
    SELECT doc_id,
           ROUND(
             tf1 * {BM25_K1 + 1} / (tf1 + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * dl / avgdl)) * (n + 1.0) / (df1 + 1.0)
           + tf2 * {BM25_K1 + 1} / (tf2 + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * dl / avgdl)) * (n + 1.0) / (df2 + 1.0)
           + tf3 * {BM25_K1 + 1} / (tf3 + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * dl / avgdl)) * (n + 1.0) / (df3 + 1.0)
           , 6) AS score
    FROM tf, stats, df
    ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25-style top-k for a fixed 3-term query —
    the inverted-index half of a RAG stack, next to the embedding
    similarity family (D3).  The idf is the LOG-FREE ratio
    (N+1)/(df+1), same trick as text_tfidf: rational arithmetic in a
    fixed evaluation order is bit-identical across engines, where
    log() differs in the last ulp and poisons a hash compare.  Scores
    round to 6 dp BEFORE the (score, doc_id) top-k so boundary ties
    break by key, not by engine.

    Plan: per-doc term frequencies are JVM ``filter`` higher-order
    fns in the scan stage (no posting-list shuffle at all for a fixed
    query); corpus stats (N, avgdl, per-term df) are ONE tiny
    aggregate broadcast back; the top-k is TakeOrderedAndProject.  At
    100 TB with ad-hoc queries the swap is a materialized inverted
    index (term → postings), which is `text_tfidf`'s tf table reused
    — this key pins the scoring math and the no-shuffle scorer."""
    d = _docs(spark, sf_dir).select("doc_id", _words().alias("w"))

    def _tf(term: str):
        # factory closure, NOT a default-arg lambda: a second lambda
        # parameter makes pyspark bind the (element, index) HOF form
        return F.size(F.filter("w", lambda x: x == term))

    tf_cols = [_tf(t).alias(f"tf{i + 1}") for i, t in enumerate(BM25_TERMS)]
    tf = d.select("doc_id", F.size("w").alias("dl"), *tf_cols)
    stats = tf.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i + 1}") > 0).cast("bigint")).alias(f"df{i + 1}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))
    k1, b = BM25_K1, BM25_B
    parts = [
        F.col(f"tf{i}")
        * (k1 + 1)
        / (F.col(f"tf{i}") + k1 * ((1 - b) + b * F.col("dl") / F.col("avgdl")))
        * (F.col("n") + 1.0)
        / (F.col(f"df{i}") + 1.0)
        for i in (1, 2, 3)
    ]
    return (
        scored.select(
            "doc_id", F.round(parts[0] + parts[1] + parts[2], 6).alias("score")
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


_COVERAGE_KS = (100, 1000, 10000)


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word
    ), ranked AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rnk,
             SUM(cnt) OVER () AS total
      FROM wc
    ), cum AS (
      SELECT rnk, total,
             SUM(cnt) OVER (ORDER BY rnk ROWS UNBOUNDED PRECEDING) AS cw
      FROM ranked
    )
    SELECT k,
           CAST(MAX(CASE WHEN rnk <= k THEN cw END) AS BIGINT)
             AS covered_tokens,
           CAST(MAX(total) AS BIGINT) AS total_tokens,
           CAST(MAX(CASE WHEN rnk <= k THEN cw END) AS DOUBLE)
             / MAX(total) AS coverage
    FROM cum, (SELECT UNNEST([{", ".join(str(k) for k in _COVERAGE_KS)}]) AS k)
    WHERE rnk <= k
    GROUP BY k
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY COVERAGE curve: what fraction of corpus tokens the
    top-k most frequent words cover, for several k — the measurement
    that sizes a tokenizer vocabulary (pipeline_bpe_train's K and
    VOCAB_WORDS knobs are chosen off exactly this curve).

    One corpus pass (word count), then rank + cumulative windows over
    the word table only; the k grid fans out from a literal array.
    Deterministic: ranks tie-break on the word, coverage is one double
    division of exact counts.  At 100 TB the word table is the only
    shuffled object, and it is Zipf-small relative to the corpus."""
    apply_engine_conf(spark)
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), "word")
    w_cum = Window.orderBy("rnk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = wc.select(
        "cnt",
        F.row_number().over(w_rank).alias("rnk"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    ).withColumn("cw", F.sum("cnt").over(w_cum))
    ks = F.explode(F.array(*[F.lit(k) for k in _COVERAGE_KS])).alias("k")
    return (
        ranked.select("rnk", "cw", "total", ks)
        .filter(F.col("rnk") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.max(F.when(F.col("rnk") <= F.col("k"), F.col("cw")))
            .cast("bigint")
            .alias("covered_tokens"),
            F.max("total").cast("bigint").alias("total_tokens"),
            (
                F.max(
                    F.when(F.col("rnk") <= F.col("k"), F.col("cw"))
                ).cast("double")
                / F.max("total")
            ).alias("coverage"),
        )
    )


@query(
    "text_readability",
    oracle="""
    WITH d AS (
        SELECT lang, source,
               len(string_split(text, ' ')) AS n_words,
               len(regexp_extract_all(text, '[aeiou]+')) AS n_sylls,
               (len(string_split(text, ' ')) + 14) // 15 AS n_sents
        FROM documents
    ),
    scored AS (
        SELECT lang, source,
               ROUND(206.835
                     - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
                     - 84.6 * (CAST(n_sylls AS DOUBLE) / CAST(n_words AS DOUBLE)),
                     4) AS flesch
        FROM d
    )
    SELECT lang, source,
           CAST(floor(flesch / 10.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(CAST(flesch AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*)
             AS avg_flesch
    FROM scored GROUP BY lang, source, bucket
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READABILITY scoring — Flesch reading-ease over a deterministic
    syllable proxy (vowel-group count) and fixed 15-word
    pseudo-sentences (the corpus is depunctuated, so sentence
    segmentation must be convention, not heuristics).  Quality
    pipelines bucket documents by readability to balance web-scraped
    corpora; the output is the (lang, source, decile-bucket)
    histogram plus the exact in-bucket mean.

    All counting is row-local codegen (split + regexp count — no
    Python); the only shuffle is the final low-cardinality groupBy.
    Determinism: the score is three exact integers pushed through ONE
    identical double expression, rounded to 4 dp BEFORE bucketing and
    averaging; the in-bucket mean is an exact decimal sum over those
    rounded values divided once."""
    d = _docs(spark, sf_dir)
    n_words = F.size(_words())
    n_sylls = F.size(F.expr("regexp_extract_all(text, '[aeiou]+', 0)"))
    n_sents = F.expr("(size(split(text, ' ')) + 14) DIV 15")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6) * (n_sylls.cast("double") / n_words.cast("double")),
        4,
    )
    return (
        d.select("lang", "source", flesch.alias("flesch"))
        .groupBy(
            "lang",
            "source",
            F.floor(F.col("flesch") / F.lit(10.0)).cast("bigint").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (
                F.sum(F.col("flesch").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_flesch"),
        )
    )


_ZIPF_TOP = 100  # ranks entering the log-log fit


@query(
    "text_zipf_fit",
    # ln() is not cross-engine bit-identical (JVM Math.log vs libm);
    # each log is rounded to 9 dp and lifted onto an exact decimal
    # grid, so the OLS component sums are EXACT and the closed-form
    # slope/r2 arithmetic is one identical double expression tree.
    # The DECIMAL(38,18)->DOUBLE cast of the sums is NOT identically
    # rounded across engines (measured: 1-ulp skew), so the outputs
    # are rounded at 9 dp — 6 orders above the ulp noise.
    oracle=f"""
    WITH tf AS (
        SELECT source, term, COUNT(*) AS freq
        FROM (SELECT source, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY source, term
    ),
    ranked AS (
        SELECT source, freq,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY freq DESC, term) AS rnk
        FROM tf
    ),
    pts AS (
        SELECT source,
               CAST(ROUND(ln(CAST(rnk AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lx,
               CAST(ROUND(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ly
        FROM ranked WHERE rnk <= {_ZIPF_TOP}
    ),
    s AS (
        SELECT source,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(lx) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(ly) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(lx * ly) AS VARCHAR) AS DOUBLE) AS sxy,
               CAST(CAST(SUM(lx * lx) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(ly * ly) AS VARCHAR) AS DOUBLE) AS syy
        FROM pts GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_terms,
           ROUND(((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)), 9)
             AS zipf_slope,
           ROUND((((n * sxy) - (sx * sy)) * ((n * sxy) - (sx * sy)))
             / (((n * sxx) - (sx * sx)) * ((n * syy) - (sy * sy))), 9) AS r2
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW fit per source: OLS slope of ln(freq) on ln(rank) over
    the top-{_ZIPF_TOP} terms — natural text sits near slope −1, and a
    corpus slice that deviates hard (templated spam, tables,
    boilerplate floods) is exactly what curation wants flagged.  r²
    reports how clean the power law is.

    Scale shape: one corpus tokenize + (source, term) count shuffle —
    shared shape with text_tfidf — then a per-source top-{_ZIPF_TOP}
    window over the term-frequency table (tiny after aggregation),
    and a sufficient-statistics fold of {_ZIPF_TOP} points per source.
    Raw tokens never reach the fit; at 100 TB the window input is
    |vocab| rows, not corpus rows."""
    d = _docs(spark, sf_dir)
    tf = (
        d.select("source", F.explode(_words()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.col("freq").desc(), F.col("term"))
    pts = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ZIPF_TOP)
        .select(
            "source",
            F.round(F.log(F.col("rnk").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("lx"),
            F.round(F.log(F.col("freq").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("ly"),
        )
    )
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lx").cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("double").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("double").alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = (n * sxy) - (sx * sy)
    var_n = (n * sxx) - (sx * sx)
    return s.select(
        "source",
        n.cast("bigint").alias("n_terms"),
        F.round(cov_n / var_n, 9).alias("zipf_slope"),
        F.round(
            (cov_n * cov_n) / (var_n * ((n * syy) - (sy * sy))), 9
        ).alias("r2"),
    )


FREQ_TERM_PHI = 0.002     # support threshold: count >= ceil(phi * N_tokens)
_MG_COUNTERS = 4096       # per-partition Misra-Gries budget (>= 1/phi x8)


def _mg_candidates(tokens, n_counters: int):
    """Per-partition Misra-Gries pass over a token stream via
    Arrow-batched mapInPandas: O(n_counters) state, emits the counter
    survivors per partition PLUS one (tok=NULL, np=<partition token
    count>) row, so ONE job yields both the candidate roster and the
    exact global token total (r6: previously a separate count() over a
    persisted cache).  Guarantee: any token with global count
    >= phi*N has, in at least one partition, local count >= phi*n_p >
    n_p/(n_counters+1), so it survives that partition's counters —
    the union of survivors is a SUPERSET of the true heavy hitters.
    The decrement step makes per-partition counts unreliable, which is
    why the exact recount pass exists; only MEMBERSHIP (and the one
    count) leaves Python."""
    import pandas as pd

    def mg(batches):
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            n += len(pdf["tok"])
            for tok in pdf["tok"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < n_counters:
                    counters[tok] = 1
                else:
                    dead = [k for k in counters if counters[k] == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame(
            {
                "tok": list(counters.keys()) + [None],
                "np": [0] * len(counters) + [n],
            }
        )

    return tokens.mapInPandas(mg, "tok string, np long")


@query(
    "text_frequent_terms",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    n AS (SELECT COUNT(*) AS total FROM toks)
    SELECT tok, COUNT(*) AS n_occurrences
    FROM toks, n
    GROUP BY tok, n.total
    HAVING COUNT(*) >= CEIL({FREQ_TERM_PHI} * n.total)
    """,
)
def text_frequent_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent terms (support >= {phi} of all tokens) via the
    two-phase sketch-then-verify plan — the shape that finds heavy
    hitters WITHOUT shuffling the full key space:

    * phase 1: per-partition Misra-Gries counters (bounded state,
      Arrow-batched) emit a candidate SUPERSET — the long Zipf tail
      never leaves its partition, so the shuffle after this pass is
      |candidates| x |partitions| rows instead of one row per token
      occurrence key.  Word frequencies are Zipfian (text_zipf_fit
      measures this corpus), so candidates are a tiny fraction of the
      vocabulary.
    * phase 2: exact recount of candidate members only (broadcast hash
      semi-join against the candidate roster), then the exact
      ceil(phi*N) support filter.  Result is EXACT — the sketch only
      prunes, the oracle recomputes the full groupBy independently.

    At 100 TB this is the canonical frequent-items plan (MG/SpaceSaving
    then verify); the exact one-pass groupBy alternative shuffles every
    distinct token."""
    toks = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    # ONE sketch job yields the candidate roster AND the exact token
    # total (the per-partition MG pass counts as it sketches — r6 fix:
    # the previous persist + count() + collect() pair cost a second
    # pass and a cache round trip); the roster (bounded: <= counters x
    # partitions) comes to the driver so the returned lazy plan
    # carries it as a broadcast literal instead of re-running the
    # sketch at execution
    sketch = _mg_candidates(toks, _MG_COUNTERS).collect()
    n_total = sum(r.np for r in sketch if r.tok is None)
    cand_rows = sorted({r.tok for r in sketch if r.tok is not None})
    support = -(-FREQ_TERM_PHI * n_total // 1)  # ceil
    roster = spark.createDataFrame([(t,) for t in cand_rows], "tok string")
    # the returned plan re-explodes the corpus exactly once (the
    # recount) — the honest cold cost of phase 2
    return (
        toks.join(F.broadcast(roster), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= F.lit(int(support)))
    )


text_frequent_terms.__doc__ = text_frequent_terms.__doc__.format(
    phi=FREQ_TERM_PHI
)
