"""Distributed BPE merge training (Sennrich et al. 2016) — the
tokenizer-training step of an LLM data pipeline, built Spark-first and
fully value-oracled.

Byte-pair encoding training is an iterative greedy algorithm: start
from character-level symbol sequences, repeatedly find the most
frequent ADJACENT symbol pair (weighted by word frequency) and merge
it into one symbol.  The trained artifact is the ordered merge list.

Scale shape — the part that matters at 100 TB:

* The corpus-sized work is ONE pass: tokenize + word count (hash
  groupBy; shuffles (word, count) pairs, never documents).  Every real
  BPE trainer (subword-nmt, HuggingFace tokenizers) runs its merge
  loop over this word-frequency table, not the corpus.
* The vocabulary is capped deterministically (top VOCAB_WORDS by
  count, ties by word) so the loop's working set is bounded no matter
  the corpus size.
* Each merge round is one small aggregation over the capped word
  table (pair explode → weighted count → argmax) plus one literal
  string rewrite.  K rounds = K tiny jobs after the single big pass —
  the same fixed-iteration discipline as graph_pagerank.

Determinism scheme (what makes the full value oracle possible): the
symbol sequence is a string with DOUBLE unit-separator boundaries
("\\x1f\\x1f s1 \\x1f\\x1f s2 \\x1f\\x1f"), so a merge of pair
(a, b) is a LITERAL non-overlapping leftmost replace of
"\\x1fa\\x1f\\x1fb\\x1f" with "\\x1fab\\x1f" — the pattern
consumes only the INNER half of each boundary, leaving the outer
halves for the adjacent pair, which reproduces BPE's greedy
left-to-right merge order exactly (a single-separator encoding gets
"aaaa" wrong: the first merge eats the separator the second needs).
Semantics are identical in Spark `replace` and DuckDB `replace`; ties
on pair count break lexicographically.  The DuckDB twin unrolls the
same K rounds as generated CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.functions import let
from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

BPE_MERGES = 6        # merge rounds trained (fixed-iteration loop)
VOCAB_WORDS = 2000    # deterministic word-table cap (top by count, word)
_US = "\x1f"          # unit separator — never occurs in corpus text


def _seq_pairs_sql(seq: str) -> str:
    """DuckDB: adjacent symbol pairs of one US-delimited sequence."""
    syms = f"list_filter(string_split({seq}, chr(31) || chr(31)), x -> x <> '')"
    return (
        f"list_transform(range(1, len({syms})), "
        f"i -> struct_pack(a := {syms}[i], b := {syms}[i + 1]))"
    )


def _bpe_oracle() -> str:
    """The K-round merge loop unrolled as generated CTEs."""
    parts = [f"""
    WITH words AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY cnt DESC, word LIMIT {VOCAB_WORDS}
    ),
    w0 AS MATERIALIZED (
        SELECT word, cnt,
               chr(31) || chr(31) || array_to_string(
                   list_transform(range(1, strlen(word) + 1),
                                  i -> substr(word, i, 1)),
                   chr(31) || chr(31))
               || chr(31) || chr(31) AS seq
        FROM words
    )"""]
    for k in range(1, BPE_MERGES + 1):
        prev = f"w{k - 1}"
        parts.append(f"""
    p{k} AS (
        SELECT pr.a AS pa, pr.b AS pb, SUM(cnt) AS n
        FROM (SELECT cnt, unnest({_seq_pairs_sql("seq")}) AS pr FROM {prev})
        GROUP BY pr.a, pr.b
    ),
    best{k} AS (
        SELECT pa, pb, n FROM p{k} ORDER BY n DESC, pa, pb LIMIT 1
    ),
    w{k} AS MATERIALIZED (
        SELECT w.word, w.cnt,
               replace(w.seq,
                       chr(31) || b.pa || chr(31) || chr(31) || b.pb || chr(31),
                       chr(31) || b.pa || b.pb || chr(31)) AS seq
        FROM {prev} w CROSS JOIN best{k} b
    )""")
    union = "\n        UNION ALL\n".join(
        f"        SELECT {k} AS merge_idx, pa AS left_sym, pb AS right_sym, "
        f"n AS pair_count FROM best{k}"
        for k in range(1, BPE_MERGES + 1)
    )
    parts.append(f"""
    merges AS (
{union}
    )
    SELECT CAST(merge_idx AS INT) AS merge_idx, left_sym, right_sym,
           CAST(pair_count AS BIGINT) AS pair_count
    FROM merges""")
    return ",".join(parts)


def _train_merges(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """The K-round training loop; returns [(idx, left, right, count)]."""
    apply_engine_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(VOCAB_WORDS)
    )
    chars = F.filter(F.split("word", ""), lambda c: c != "")
    w = words.select(
        "word",
        "cnt",
        F.concat(
            F.lit(_US + _US),
            F.array_join(chars, _US + _US),
            F.lit(_US + _US),
        ).alias("seq"),
    ).localCheckpoint()  # the loop re-reads this tiny table K times

    merges = []
    for k in range(1, BPE_MERGES + 1):
        # symbol array LET-BOUND (functions.let): the interpreted pair
        # lambda would otherwise re-split+filter the sequence per pair
        # guard: Spark's sequence(1, 0) DESCENDS for 1-symbol words
        pairs = let(
            F.filter(F.split("seq", _US + _US), lambda s: s != ""),
            lambda syms: F.when(
                F.size(syms) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("a"),
                        F.element_at(syms, i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>")),
        )
        best = (
            w.select("cnt", F.explode(pairs).alias("pr"))
            .groupBy(F.col("pr.a").alias("pa"), F.col("pr.b").alias("pb"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "pa", "pb")
            .limit(1)
            .first()
        )
        if best is None:  # vocabulary exhausted (every word one symbol)
            break
        merges.append((k, best.pa, best.pb, int(best.n)))
        w = w.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(_US + best.pa + _US + _US + best.pb + _US),
                F.lit(_US + best.pa + best.pb + _US),
            ),
        ).localCheckpoint()
    return merges


@query("pipeline_bpe_train", oracle=_bpe_oracle())
def pipeline_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first BPE_MERGES byte-pair merges over the documents
    corpus; returns the ordered merge table (merge_idx, left_sym,
    right_sym, pair_count) — the artifact a tokenizer loads.

    One corpus-sized pass (word counting), then K bounded rounds over
    the capped word-frequency table; each round's argmax is a single
    collected row (the one scalar a BPE trainer is allowed to bring to
    the driver), and the merge itself is a literal string replace in
    whole-stage codegen."""
    return spark.createDataFrame(
        _train_merges(spark, sf_dir),
        "merge_idx int, left_sym string, right_sym string, pair_count bigint",
    )


def _bpe_encode_oracle() -> str:
    """Train (shared CTE chain) then APPLY the K merges to every
    distinct word and count per-document BPE tokens."""
    body = _bpe_oracle()
    # reuse the training chain up to (but not including) the final
    # SELECT: keep everything through the last w{K} CTE + bests
    head = body[: body.rindex("    merges AS (")].rstrip().rstrip(",")
    seq0 = (
        "chr(31) || chr(31) || array_to_string("
        "list_transform(range(1, strlen(word) + 1), i -> substr(word, i, 1)),"
        " chr(31) || chr(31)) || chr(31) || chr(31)"
    )
    parts = [head]
    parts.append(f"""
    aw0 AS MATERIALIZED (
        SELECT word, {seq0} AS seq
        FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE word <> ''
    )""")
    for k in range(1, BPE_MERGES + 1):
        parts.append(f"""
    aw{k} AS MATERIALIZED (
        SELECT a.word,
               replace(a.seq,
                       chr(31) || b.pa || chr(31) || chr(31) || b.pb || chr(31),
                       chr(31) || b.pa || b.pb || chr(31)) AS seq
        FROM aw{k - 1} a CROSS JOIN best{k} b
    )""")
    parts.append(f"""
    wtok AS (
        SELECT word,
               len(list_filter(string_split(seq, chr(31) || chr(31)),
                               x -> x <> '')) AS n_tok
        FROM aw{BPE_MERGES}
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w.n_tok) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents) d
    JOIN wtok w USING (word)
    WHERE d.word <> ''
    GROUP BY d.doc_id""")
    return ",".join(parts)


@query("pipeline_bpe_encode", oracle=_bpe_encode_oracle())
def pipeline_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained BPE merges: tokenize the corpus with the
    learned vocabulary and report per-document token counts
    (n_words, n_bpe_tokens) — the token-budget input every training
    pipeline computes, with a REAL subword vocabulary instead of the
    whitespace approximation (text_token_count's production upgrade).

    Scale shape: encoding runs on the DISTINCT-word table (the
    standard trick — the corpus re-joins by word afterwards), and each
    merge applies as one literal replace in whole-stage codegen, K
    replaces chained in a single projection.  The per-doc count is one
    shuffle join (word) + one groupBy (doc_id); documents never carry
    symbol sequences."""
    merges = _train_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    chars = F.filter(F.split("word", ""), lambda c: c != "")
    seq = F.concat(
        F.lit(_US + _US), F.array_join(chars, _US + _US), F.lit(_US + _US)
    )
    for _idx, pa, pb, _n in merges:
        seq = F.replace(
            seq,
            F.lit(_US + pa + _US + _US + pb + _US),
            F.lit(_US + pa + pb + _US),
        )
    n_tok = F.size(F.filter(F.split(seq, _US + _US), lambda x: x != ""))
    wtok = (
        doc_words.select("word").distinct().select("word", n_tok.alias("n_tok"))
    )
    return (
        doc_words.join(wtok, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
        )
    )
