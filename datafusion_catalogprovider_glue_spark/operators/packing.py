"""Training-data assembly: document chunking and sequence packing.

The two transforms between a cleaned corpus and a training batch:

* ``text_chunk`` — split every document into fixed-size token windows
  with overlap (context-window chunking for embedding/RAG/pretrain
  pipelines).  Row-local: tokenize once, explode the window starts,
  slice the token array per window.  Zero shuffles — the op is a
  projection + generate, so it runs in the scan's codegen stage and
  scales linearly with corpus bytes.
* ``pipeline_pack_sequences`` — GPT-style concat-and-split packing:
  documents are laid end-to-end in a deterministic order (doc_id) and
  cut into fixed-capacity context windows; each document reports the
  pack it starts in and its offset.  The naive plan is a global
  running sum — a single-partition window, the classic scale trap.
  This plan computes prefix sums hierarchically: coarse doc_id blocks
  aggregate their token totals (tiny: one row per block), the block
  offsets are a running sum over that shrunken table (the ONLY
  single-partition window — over ~|docs|/block_size rows, e.g. 10⁵
  rows for 10⁹ docs), and each document's global offset is its
  within-block running sum plus its block's offset, joined back by
  block id.  Same answer as the naive form (the oracle IS the naive
  form), but no stage ever holds more than a block or the block table
  in one task.

Both ops are pure integer/string arithmetic — bit-identical across
engines, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table

CHUNK_SIZE = 64
CHUNK_STRIDE = 48

PACK_CAPACITY = 2048
PACK_BLOCK = 64  # docs per prefix-sum block


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_engine_conf(spark)
    return load_table(spark, sf_dir, "documents")


@query(
    "text_chunk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           CAST(s.start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(s.start AS BIGINT) AS start_token,
           CAST(LEAST({CHUNK_SIZE}, len(w) - s.start) AS INT) AS n_tokens,
           array_to_string(w[s.start + 1 : s.start + {CHUNK_SIZE}], ' ')
               AS chunk_text
    FROM toks, UNNEST(generate_series(0, len(w) - 1, {CHUNK_STRIDE}))
         AS s(start)
    """,
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking: windows of {size} tokens every
    {stride} (tail windows run short; a window starts wherever a
    stride boundary lands before the end of the doc).

    Plan: tokenize → explode the stride grid → slice.  All row-local
    JVM higher-order functions in one codegen stage; output rows ≈
    corpus_tokens / stride, each carrying only its own slice — no
    doc-sized rows survive the generate, so downstream shuffles (if
    any) move chunks, not documents."""
    d = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("w"))
    starts = F.sequence(
        F.lit(0), F.size("w") - 1, F.lit(CHUNK_STRIDE)
    )
    return (
        d.select("doc_id", "w", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.col("start").cast("bigint").alias("start_token"),
            F.least(F.lit(CHUNK_SIZE), F.size("w") - F.col("start"))
            .cast("int")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("w"), F.col("start") + 1, F.lit(CHUNK_SIZE)), " "
            ).alias("chunk_text"),
        )
    )


@query(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), laid AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS tok_offset
        FROM toks
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(tok_offset AS BIGINT) AS tok_offset,
           CAST(tok_offset AS BIGINT) // {PACK_CAPACITY} AS pack_id,
           CAST(tok_offset % {PACK_CAPACITY} AS BIGINT) AS pack_pos
    FROM laid
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing: documents concatenated in
    doc_id order and cut every {capacity} tokens; each doc gets its
    global token offset, the pack it starts in, and its position
    within that pack.

    Hierarchical prefix sum (see module docstring): block sums →
    running sum over the tiny block table → broadcast join back.
    The oracle is the naive global-window form — identical values,
    different (scalable) plan."""
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.floor(F.col("doc_id") / PACK_BLOCK).cast("bigint").alias("block"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    # per-block totals: one row per PACK_BLOCK docs
    block_tot = toks.groupBy("block").agg(F.sum("n_tokens").alias("block_tokens"))
    # running sum over blocks — the only global window, over the
    # shrunken table (|docs| / PACK_BLOCK rows)
    w_blocks = (
        Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    )
    block_off = block_tot.select(
        "block",
        F.coalesce(F.sum("block_tokens").over(w_blocks), F.lit(0)).alias(
            "block_offset"
        ),
    )
    # within-block running sum, partitioned — scales with block size
    w_in = (
        Window.partitionBy("block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    laid = (
        toks.withColumn(
            "local_offset", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
        )
        .join(F.broadcast(block_off), "block")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("block_offset") + F.col("local_offset")).alias("tok_offset"),
        )
    )
    return laid.select(
        "doc_id",
        "n_tokens",
        "tok_offset",
        (F.col("tok_offset") / PACK_CAPACITY).cast("bigint").alias("pack_id"),
        (F.col("tok_offset") % PACK_CAPACITY).alias("pack_pos"),
    )


@query(
    "pipeline_dataset_split",
    oracle="""
    WITH labeled AS (
        SELECT n_chars,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('c', 'd') THEN 'val'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('e', 'f') THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM labeled GROUP BY split
    """,
)
def pipeline_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (75/12.5/12.5 by md5 hex
    bucket of doc_id): every engine, run, and cluster size assigns
    each document to the SAME split — the property that keeps eval
    sets honest when the corpus is reprocessed.  Contrast with
    ``randomSplit``, whose assignment depends on partitioning and
    seed plumbing.  The label is one scan-stage expression; the
    returned per-split profile is a single map-side-combined
    aggregate.  Writing the splits out is ``partitionBy('split')``
    on the labeled frame — same layout machinery as
    scan_partitioned_pruned."""
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        _docs(spark, sf_dir)
        .select(
            "n_chars",
            F.when(bucket.isin("c", "d"), "val")
            .when(bucket.isin("e", "f"), "test")
            .otherwise("train")
            .alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


N_SHUFFLE_SHARDS = 8


@query(
    "pipeline_global_shuffle",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    ),
    s AS (
        SELECT doc_id, hx,
               CAST('0x' || substr(hx, 1, 6) AS BIGINT) % {N_SHUFFLE_SHARDS}
                   AS shard
        FROM h
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hx, doc_id)
                AS BIGINT) AS shard_pos
    FROM s
    """,
)
def pipeline_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into training shards: every
    doc gets a (shard, shard_pos) drawn from a salted md5 of its id —
    the reproducible replacement for a random shuffle before packing,
    so training order is identical on any engine, cluster size, or
    rerun (the same engine-stability argument as
    pipeline_dataset_split vs randomSplit; the salt is the epoch
    knob — change it to reshuffle between epochs).

    Plan: the shard label is one scan-stage hash expression; ordering
    within a shard is a per-shard window over the hash — shards are
    the partition key, so the sort is N_SHARDS parallel sorts of
    corpus/N_SHARDS rows each, never a global sort.  At 100 TB raise
    N_SHARDS so a shard's (doc_id, hash) pairs fit an executor's sort
    spill budget — the doc PAYLOAD never enters this sort; it is
    fetched by a later join on doc_id, or written with
    partitionBy('shard') using this frame as the manifest."""
    h = F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    s = _docs(spark, sf_dir).select(
        "doc_id",
        h.alias("hx"),
        (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % N_SHUFFLE_SHARDS)
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hx", "doc_id")
    return s.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("shard_pos")
    )


_MANIFEST_SHARDS = 8


@query(
    "pipeline_shard_manifest",
    # Shard membership is a cross-engine hash (md5 nibble mod shards);
    # the content digest is md5 over the '|'-joined doc_id list in
    # ascending order — order pinned on both engines, so the digest is
    # partition-layout-independent.
    oracle=f"""
    WITH assign AS (
        SELECT doc_id,
               CAST(
                   (CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                        WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2
                        WHEN '3' THEN 3 WHEN '4' THEN 4 WHEN '5' THEN 5
                        WHEN '6' THEN 6 WHEN '7' THEN 7 WHEN '8' THEN 8
                        WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
                        WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14
                        ELSE 15 END) % {_MANIFEST_SHARDS} AS BIGINT) AS shard,
               len(string_split(text, ' ')) AS n_tokens,
               n_chars
        FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
           md5(string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id))
             AS content_digest
    FROM assign GROUP BY shard
    """,
)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARD MANIFEST for resumable distributed jobs: documents hash
    deterministically into {_MANIFEST_SHARDS} shards and each shard
    row carries its counts plus a CONTENT DIGEST (md5 of the ordered
    doc_id list) — the idempotency token that lets a re-run detect
    "this shard is already done and identical" without reading data.
    Every serious 100 TB pipeline checkpoints on exactly this table.

    Plan: one scan, one groupBy(shard) with map-side combine; the
    digest needs the doc_ids gathered per shard — sort_array over the
    collected ids keeps it partition-layout-independent (shard
    cardinality bounds the collect_list, and shard count is an
    operator knob: size it so a shard's id list fits an executor —
    at 100 TB you'd digest per (shard, block) and fold digests)."""
    d = _docs(spark, sf_dir)
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    hexval = (
        F.when(nibble == "a", 10)
        .when(nibble == "b", 11)
        .when(nibble == "c", 12)
        .when(nibble == "d", 13)
        .when(nibble == "e", 14)
        .when(nibble == "f", 15)
        .otherwise(nibble.cast("int"))
    )
    assign = d.select(
        "doc_id",
        (hexval % _MANIFEST_SHARDS).cast("bigint").alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        "n_chars",
    )
    return assign.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_bytes"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("content_digest"),
    )
