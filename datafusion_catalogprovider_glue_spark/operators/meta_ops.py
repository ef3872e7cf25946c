"""Table-METADATA queries over the trio of open table formats —
DESCRIBE HISTORY (Delta), the snapshots/files metadata tables
(Iceberg), and the timeline view (Hudi).

The reference exposes table *metadata* through DataFusion's
information_schema over Glue-registered tables (demo.rs:46-64); these
keys extend that inspection surface to the table formats' own commit
metadata, the way every production engine does (Delta's DESCRIBE
HISTORY, Iceberg's ``tbl.snapshots`` / ``tbl.files``, Hudi's
``show_commits``).  All four are PURE METADATA reads — commit JSONs,
manifest avros, timeline files — so their cost is independent of table
size; that is the entire point of the underlying specs storing counts
in metadata, and what makes these the right health checks at 100 TB.

Fixtures are engine-written tables built from the ``documents``
testdata table with deterministic layouts (explicit repartitioning so
file counts are pinned), so every numeric column is re-derivable by
the DuckDB oracle from the source rows.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.operators.registry import query
from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table


def _tmp_table(prefix: str, sf_dir: str) -> str:
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join("/tmp", f"glue_spark_{prefix}_{h}")
    shutil.rmtree(path, ignore_errors=True)  # idempotent per run
    return path


def _docs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )


@query(
    "meta_delta_history",
    # every number re-derives from the source rows: v0 appends the
    # evens, v1 CoW-merges the mod-3 docs (full rewrite → union count),
    # v2 OPTIMIZE rewrites the union.  File counts are deliberately NOT
    # projected: AQE's post-shuffle coalescing legitimately varies the
    # file count of shuffle-derived writes with data volume (1 file at
    # sf0.01, 2 at sf0.1) — row sums are the volume-invariant part.
    oracle="""
    WITH a AS (SELECT count(*) AS c FROM documents WHERE doc_id % 2 = 0),
         u AS (SELECT count(*) AS c FROM documents
               WHERE doc_id % 2 = 0 OR doc_id % 3 = 0)
    SELECT CAST(0 AS BIGINT) AS version, 'WRITE' AS operation,
           a.c AS rows_added
    FROM a
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'MERGE', u.c FROM u
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'OPTIMIZE', u.c FROM u
    """,
)
def meta_delta_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY (delta.delta_history): per-commit operation
    name from the protocol's ``commitInfo`` action plus add/remove
    tallies and ``stats.numRecords`` row sums — the audit query every
    Delta deployment runs.  The fixture drives one commit of each
    write shape (WRITE / MERGE / OPTIMIZE) and the oracle re-derives
    every row count from the source table, proving the writer's
    footer-derived stats match the data that actually landed."""
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        delta_history,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        compact_delta,
        merge_delta,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_delta_history", sf_dir)
    append_delta(docs.filter(F.col("doc_id") % 2 == 0).repartition(2), table)
    src = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "n_chars", F.col("n_chars") + F.lit(1000)
    )
    merge_delta(spark, table, src, on=["doc_id"])
    compact_delta(spark, table)
    return delta_history(spark, table).select(
        "version", "operation", "rows_added"
    )


@query(
    "meta_iceberg_snapshots",
    oracle="""
    WITH a AS (SELECT count(*) AS c FROM documents WHERE doc_id % 2 = 0),
         b AS (SELECT count(*) AS c FROM documents WHERE doc_id % 3 = 0)
    SELECT CAST(1 AS BIGINT) AS seq, 'append' AS operation,
           a.c AS added_rows, a.c AS live_rows FROM a
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'append', b.c, a.c + b.c FROM a, b
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'replace', a.c + b.c, a.c + b.c FROM a, b
    """,
)
def meta_iceberg_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``snapshots`` metadata table (iceberg.iceberg_snapshots_df):
    per-snapshot operation (spec §snapshots summary) and
    manifest-statistic row counts — added rows per commit, live rows
    visible at it.  Two appends then a REPLACE compaction; the oracle
    recomputes each count from the source rows, pinning that manifest
    ``record_count`` statistics agree with the data files' contents
    without this query ever opening one."""
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        iceberg_snapshots_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        compact_iceberg,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_iceberg_snaps", sf_dir)
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), table)
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0), table)
    compact_iceberg(spark, table)
    return iceberg_snapshots_df(spark, table).select(
        "seq", "operation", "added_rows", "live_rows"
    )


@query(
    "meta_iceberg_files",
    oracle="""
    SELECT lang, CAST(1 AS BIGINT) AS file_count,
           count(*) AS record_count
    FROM documents GROUP BY lang
    """,
)
def meta_iceberg_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``files`` metadata table (iceberg.iceberg_files_df) rolled
    up per partition — files and rows per partition value, the
    small-files health check every Iceberg table owner schedules.
    The fixture pre-shuffles by the partition column so each lang
    lands in exactly one task → exactly one data file, making
    ``file_count`` oracle-derivable; ``record_count`` comes from the
    manifests' per-file statistics, never a data-file read."""
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        iceberg_files_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_iceberg_files", sf_dir)
    append_iceberg(docs.repartition("lang"), table, partition_by="lang")
    files = iceberg_files_df(spark, table)
    return (
        files.withColumn("lang", F.get_json_object("partition", "$.lang"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("file_count"),
            F.sum("record_count").alias("record_count"),
        )
    )


@query(
    "meta_hudi_timeline",
    oracle="""
    WITH a AS (SELECT count(*) AS c, count(DISTINCT lang) AS p
               FROM documents WHERE doc_id % 2 = 0),
         b AS (SELECT count(*) AS c, count(DISTINCT lang) AS p
               FROM documents WHERE doc_id % 2 = 1)
    SELECT CAST(1 AS INTEGER) AS seq, 'commit' AS action,
           CAST(a.p AS INTEGER) AS n_partitions, a.c AS rows_written
    FROM a
    UNION ALL
    SELECT CAST(2 AS INTEGER), 'commit', CAST(b.p AS INTEGER), b.c FROM b
    """,
)
def meta_hudi_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TIMELINE view (hudi.hudi_timeline_df — Hudi's
    ``show_commits``): completed instants with their action, touched
    partition count, and the writer-recorded ``numWrites`` row totals.
    Two hive-partitioned inserts; the oracle re-derives rows and
    partition counts per commit from the source halves, pinning the
    write-stat bookkeeping end to end."""
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        hudi_timeline_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_hudi_timeline", sf_dir)
    append_hudi(
        docs.filter(F.col("doc_id") % 2 == 0).repartition("lang"),
        table, partition_by="lang",
    )
    append_hudi(
        docs.filter(F.col("doc_id") % 2 == 1).repartition("lang"),
        table, partition_by="lang",
    )
    return hudi_timeline_df(spark, table).select(
        "seq", "action", "n_partitions", "rows_written"
    )


@query(
    "meta_iceberg_manifests",
    # fast-appends never rewrite prior manifests, so after two appends
    # and a pos-delete merge the current list references: manifest 1
    # (evens, seq 1), manifest 2 (%3 docs, seq 2), and the merge's ONE
    # combined manifest (seq 3: its updated-rows data file plus one
    # position-delete file whose rows carry per-base file_paths) —
    # each row's tallies re-derived from source rows.
    oracle="""
    WITH e AS (SELECT count(*) AS c FROM documents WHERE doc_id % 2 = 0),
         t AS (SELECT count(*) AS c FROM documents WHERE doc_id % 3 = 0)
    SELECT CAST(1 AS BIGINT) AS seq, 1 AS n_manifests,
           1 AS data_files, e.c AS data_rows, 0 AS delete_files FROM e
    UNION ALL
    SELECT CAST(2 AS BIGINT), 1, 1, t.c, 0 FROM t
    UNION ALL
    SELECT CAST(3 AS BIGINT), 1, 1, t.c, 1 FROM t
    """,
)
def meta_iceberg_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``manifests`` metadata table (iceberg.iceberg_manifests_df)
    rolled up per adding snapshot: fast-appends reuse prior manifests
    instead of rewriting them, so the current manifest list carries
    one manifest per append plus the merge commit's data AND delete
    manifests — the small-manifests health view that tells a table
    owner when to rewrite_manifests.  Every file/row tally re-derives
    from source rows via the snapshots join (seq per adding
    snapshot)."""
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        iceberg_manifests_df,
        iceberg_snapshots_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        merge_iceberg_pos_delete,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_iceberg_manifests", sf_dir)
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0).repartition(1), table)
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0).repartition(1), table)
    merge_iceberg_pos_delete(
        spark, table,
        docs.filter(F.col("doc_id") % 3 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        ),
        on=["doc_id"],
    )
    m = iceberg_manifests_df(spark, table)
    seqs = iceberg_snapshots_df(spark, table).select(
        F.col("snapshot_id").alias("added_snapshot_id"), "seq"
    )
    return (
        m.join(seqs, "added_snapshot_id")
        .groupBy("seq")
        .agg(
            F.count("*").cast("int").alias("n_manifests"),
            F.sum("data_files").cast("int").alias("data_files"),
            F.sum("data_rows").cast("long").alias("data_rows"),
            F.sum("delete_files").cast("int").alias("delete_files"),
        )
    )


@query(
    "meta_iceberg_refs",
    # main moves with the post-tag append; the tag pins the audited
    # snapshot; the staging branch sits one commit past main.  live
    # row counts re-derive each ref's visible data from source rows.
    oracle="""
    WITH e AS (SELECT count(*) AS c FROM documents WHERE doc_id % 2 = 0),
         t AS (SELECT count(*) AS c FROM documents WHERE doc_id % 3 = 0),
         o AS (SELECT count(*) AS c FROM documents WHERE doc_id % 5 = 0)
    SELECT 'main' AS name, 'branch' AS type, CAST(2 AS BIGINT) AS seq,
           e.c + t.c AS live_rows FROM e, t
    UNION ALL
    SELECT 'q3-audit', 'tag', CAST(1 AS BIGINT), e.c FROM e
    UNION ALL
    SELECT 'staging', 'branch', CAST(3 AS BIGINT), e.c + t.c + o.c
    FROM e, t, o
    """,
)
def meta_iceberg_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``refs`` metadata table (iceberg.iceberg_refs_df): every
    named ref — the implicit main branch, tags, WAP staging branches —
    with its snapshot's sequence number and the LIVE ROW COUNT visible
    at it (joined from the snapshots metadata table, so every number
    re-derives from source rows).  The fixture tags the first commit,
    appends to main, then stacks a staging-branch commit: three refs
    at three different snapshots."""
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        iceberg_refs_df,
        iceberg_snapshots_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        branch_iceberg,
        tag_iceberg,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_iceberg_refs", sf_dir)
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), table)
    tag_iceberg(table, "q3-audit")
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0), table)
    branch_iceberg(table, "staging")
    append_iceberg(
        docs.filter(F.col("doc_id") % 5 == 0), table, branch="staging"
    )
    refs = iceberg_refs_df(spark, table)
    live = iceberg_snapshots_df(spark, table).select(
        "snapshot_id", "live_rows"
    )
    return refs.join(live, "snapshot_id").select(
        "name", "type", "seq", "live_rows"
    )


@query(
    "scan_hudi_files_index",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 5 = 0 THEN n_chars + 2000
                WHEN doc_id % 3 = 0 THEN n_chars + 1000
                ELSE n_chars END AS n_chars
    FROM documents
    WHERE doc_id % 2 = 0 OR doc_id % 3 = 0 OR doc_id % 5 = 0
    """,
)
def scan_hudi_files_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILES-INDEX read (hudi.index_hudi_files — the engine's analog
    of Hudi's metadata-table ``files`` partition): after indexing, the
    snapshot's file-slice view seeds from one KB-sized index snapshot
    and replays ONLY commits newer than it, instead of re-opening
    every commit JSON since table creation — the listing/replay
    eliminator at 100 TB timeline depths.  The fixture stacks insert →
    upsert → CLUSTERING (the index must capture replacecommit
    retirements) → index → one post-index upsert.  Asserted in-key via
    an instrumented commit-file loader: the indexed read opens exactly
    the post-index commits (pre-index instants never touched), while a
    time travel BEFORE the index instant ignores the index and full-
    replays — byte-identical results either way, hash-matched."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources import hudi as hudi_mod
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        index_hudi_files,
        read_hudi,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        cluster_hudi,
        upsert_hudi,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("hudi_files_index", sf_dir)
    append_hudi(docs.filter(F.col("doc_id") % 2 == 0), table)
    upsert_hudi(
        spark,
        docs.filter(F.col("doc_id") % 3 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        ),
        table, key="doc_id",
    )
    cluster_hudi(spark, table, "doc_id", n_groups=2)
    pre_index = sorted(
        f.rsplit(".", 1)[0]
        for f in os.listdir(os.path.join(table, ".hoodie"))
        if f.endswith((".commit", ".replacecommit"))
    )
    idx_instant = index_hudi_files(table)
    if idx_instant != pre_index[-1]:
        raise SparkError(
            f"index instant {idx_instant} != latest {pre_index[-1]}"
        )
    upsert_hudi(
        spark,
        docs.filter(F.col("doc_id") % 5 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(2000)
        ),
        table, key="doc_id",
    )
    post_index = [
        f.rsplit(".", 1)[0]
        for f in os.listdir(os.path.join(table, ".hoodie"))
        if f.endswith((".commit", ".replacecommit"))
        and f.rsplit(".", 1)[0] > idx_instant
    ]
    opened: list[str] = []
    orig = hudi_mod._commit_files_partitioned

    def _probe(location, t, action):
        opened.append(t)
        return orig(location, t, action)

    hudi_mod._commit_files_partitioned = _probe
    try:
        out = read_hudi(spark, table).select("doc_id", "lang", "n_chars")
        if sorted(set(opened)) != sorted(post_index):
            raise SparkError(
                f"indexed read opened {sorted(set(opened))}, expected "
                f"exactly the post-index commits {sorted(post_index)}"
            )
        # time travel BEFORE the index instant must ignore it (full
        # replay) and still resolve the pre-clustering state
        opened.clear()
        # time-travel count AND its expected count in ONE tagged-union
        # aggregation job (the docs side is plain parquet and touches
        # no commit loader, so the `opened` probe is unaffected)
        _fc = (
            read_hudi(spark, table, as_of=pre_index[0])
            .select(F.lit("h").alias("_t"))
            .unionByName(
                docs.filter(F.col("doc_id") % 2 == 0)
                .select(F.lit("d").alias("_t"))
            )
            .agg(
                F.sum((F.col("_t") == "h").cast("long")).alias("h"),
                F.sum((F.col("_t") == "d").cast("long")).alias("d"),
            )
            .collect()[0]
        )
        if sorted(set(opened)) != [pre_index[0]]:
            raise SparkError(
                f"pre-index time travel replayed {sorted(set(opened))}"
            )
        if int(_fc["h"] or 0) != int(_fc["d"] or 0):
            raise SparkError("pre-index time travel wrong row count")
    finally:
        hudi_mod._commit_files_partitioned = orig
    return out


@query(
    "meta_iceberg_partitions",
    # lang file counts are pinned to 1 by per-lang pre-shuffle; the
    # spec-0 (unpartitioned) epoch is pinned to one file by
    # repartition(1).  NULL lang = the unpartitioned epoch's row.
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS lang, CAST(1 AS BIGINT) AS file_count,
           count(*) AS record_count
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT lang, CAST(1 AS BIGINT), count(*)
    FROM documents WHERE doc_id % 3 <> 0 GROUP BY lang
    """,
)
def meta_iceberg_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``partitions`` metadata table (iceberg.iceberg_partitions_df)
    across a PARTITION SPEC EVOLUTION: epoch 1 writes unpartitioned
    (spec 0), the spec evolves, epoch 2 writes identity-partitioned by
    lang — and the summary must unify both: one spec-0 row with a NULL
    partition tuple plus one row per lang under the evolved spec, each
    with manifest-stat record counts the oracle re-derives from source
    rows.  Asserted in-key: live files span exactly two spec ids.
    Pure metadata read — manifests only, never a data file."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        IcebergSnapshot,
        iceberg_partitions_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_iceberg_parts", sf_dir)
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0).repartition(1), table)
    append_iceberg(
        docs.filter(F.col("doc_id") % 3 != 0).repartition("lang"),
        table,
        partition_by="lang",
    )
    snap = IcebergSnapshot(table)
    spec_ids = {snap.spec_of.get(f, snap.default_spec_id) for f in snap.files}
    if len(spec_ids) != 2:
        raise SparkError(f"expected files under two specs, got {spec_ids}")
    parts = iceberg_partitions_df(spark, table)
    return parts.select(
        F.get_json_object("partition", "$.lang").alias("lang"),
        "file_count",
        "record_count",
    )


@query(
    "meta_iceberg_metadata_log",
    # every row re-derives from source counts: v1 pinned the evens
    # append, v2 the +%3 append, v3 (current) the +odd-%5 append
    oracle="""
    WITH e AS (SELECT count(*) AS c FROM documents WHERE doc_id % 2 = 0),
         t AS (SELECT count(*) AS c FROM documents WHERE doc_id % 3 = 0),
         o AS (SELECT count(*) AS c FROM documents
               WHERE doc_id % 2 = 1 AND doc_id % 5 = 0)
    SELECT CAST(1 AS BIGINT) AS ordinal, 'v1.metadata.json' AS metadata_file,
           CAST(1 AS BIGINT) AS latest_seq, false AS is_current,
           e.c AS live_rows FROM e
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'v2.metadata.json', CAST(2 AS BIGINT), false,
           e.c + t.c FROM e, t
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'v3.metadata.json', CAST(3 AS BIGINT), true,
           e.c + t.c + o.c FROM e, t, o
    """,
)
def meta_iceberg_metadata_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``metadata_log_entries`` metadata table
    (iceberg.iceberg_metadata_log_df) over a three-commit table: every
    publish records the OUTGOING metadata file in the spec's
    ``metadata-log`` (§table-metadata), so catalog tooling can walk —
    and roll back to — earlier METADATA versions, the coarser lever
    that also reverts schema/spec/ref changes.  Each logged entry is
    resolved to the snapshot state it pinned and joined to the
    snapshots metadata table so every live-row count re-derives from
    source rows.  Asserted in-key: the log names exactly v1..v(N-1)
    in order (no gaps — a writer that skipped an entry would strand
    rollback tooling)."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        iceberg_metadata_log_df,
        iceberg_snapshots_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_iceberg_mlog", sf_dir)
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), table)
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0), table)
    append_iceberg(
        docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 5 == 0)),
        table,
    )
    mlog = iceberg_metadata_log_df(spark, table)
    names = [r.metadata_file for r in mlog.orderBy("ordinal").collect()]
    if names != ["v1.metadata.json", "v2.metadata.json",
                 "v3.metadata.json"]:
        raise SparkError(f"metadata-log is gappy or misordered: {names}")
    live = iceberg_snapshots_df(spark, table).select(
        F.col("snapshot_id").alias("latest_snapshot_id"), "live_rows"
    )
    return mlog.join(live, "latest_snapshot_id").select(
        "ordinal", "metadata_file", "latest_seq", "is_current", "live_rows"
    )


@query(
    "meta_iceberg_history",
    # is_current_ancestor is the whole point: snapshot 2 was current
    # (ordinal 2) but the rollback moved main back to snapshot 1, so
    # it is NOT on the current lineage; everything else is.
    oracle="""
    WITH e AS (SELECT count(*) AS c FROM documents WHERE doc_id % 2 = 0),
         t AS (SELECT count(*) AS c FROM documents WHERE doc_id % 3 = 0),
         o AS (SELECT count(*) AS c FROM documents
               WHERE doc_id % 2 = 1 AND doc_id % 5 = 0)
    SELECT CAST(1 AS BIGINT) AS ordinal, CAST(1 AS BIGINT) AS seq,
           true AS is_current_ancestor, e.c AS live_rows FROM e
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(2 AS BIGINT), false, e.c + t.c FROM e, t
    UNION ALL
    SELECT CAST(3 AS BIGINT), CAST(1 AS BIGINT), true, e.c FROM e
    UNION ALL
    SELECT CAST(4 AS BIGINT), CAST(3 AS BIGINT), true, e.c + o.c FROM e, o
    """,
)
def meta_iceberg_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``history`` metadata table (iceberg.iceberg_history_df)
    through a ROLLBACK (iceberg_writer.rollback_iceberg): append A,
    append B, roll main back to A, append C — the log replays every
    time a snapshot became current (A appears twice) and B, though
    still in the table, is no longer a current ancestor.  live_rows
    joins the snapshots metadata table so every count re-derives from
    source rows.  Asserted in-key: rolling back to the now-orphaned B
    refuses (not on the current lineage — that would silently rewrite
    history)."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        iceberg_history_df,
        iceberg_snapshots_df,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        rollback_iceberg,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("meta_iceberg_hist", sf_dir)
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), table)
    append_iceberg(docs.filter(F.col("doc_id") % 3 == 0), table)
    rollback_iceberg(table, seq=1)
    append_iceberg(
        docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 5 == 0)),
        table,
    )
    try:
        rollback_iceberg(table, seq=2)
        raise SparkError("rollback accepted a non-ancestor target")
    except ValueError:
        pass
    hist = iceberg_history_df(spark, table)
    live = iceberg_snapshots_df(spark, table).select(
        "snapshot_id", "live_rows"
    )
    return hist.join(live, "snapshot_id").select(
        "ordinal", "seq", "is_current_ancestor", "live_rows"
    )


@query(
    "scan_iceberg_tag",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
    """,
)
def scan_iceberg_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAG-pinned read (spec §refs; iceberg_writer.tag_iceberg +
    read_iceberg(ref=...)): tag the audited snapshot, keep writing to
    main, and the tag still serves the audited bytes — how production
    tables pin "the Q3 training snapshot" by NAME instead of a raw
    snapshot id.  Asserted in-key: after the post-tag CoW merge, main
    serves the merged rows while the tag does not, and re-creating an
    existing tag refuses (tags are immutable per spec)."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        merge_iceberg,
        tag_iceberg,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("iceberg_tag", sf_dir)
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), table)
    tag_iceberg(table, "audited-v1")
    src = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "n_chars", F.col("n_chars") + F.lit(100000)
    )
    merge_iceberg(spark, table, src, on=["doc_id"])
    if read_iceberg(spark, table).filter(
        F.col("n_chars") >= 100000
    ).limit(1).count() == 0:
        raise SparkError("main did not advance past the tag")
    try:
        tag_iceberg(table, "audited-v1")
        raise SparkError("re-creating an existing tag must refuse")
    except ValueError:
        pass
    return read_iceberg(spark, table, ref="audited-v1")


@query(
    "sink_iceberg_wap",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 = 0
    """,
)
def sink_iceberg_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH (iceberg_writer: append_iceberg(branch=...)
    → read_iceberg(ref=...) → publish_iceberg_branch): the staged
    append lands on a BRANCH ref, the audit step queries the branch
    while main still serves the pre-stage data to every consumer, and
    the publish is a verified-ancestor FAST-FORWARD of main — the
    exact pattern Iceberg deployments use to gate bad data out of
    production tables.  Asserted in-key: main is byte-stable during
    staging (row count unchanged) and the audit read sees the staged
    rows before publish."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.iceberg import (
        read_iceberg,
    )
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        publish_iceberg_branch,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("iceberg_wap", sf_dir)
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), table)
    # WRITE: stage onto the branch (auto-created at the main head)
    append_iceberg(
        docs.filter(F.col("doc_id") % 3 == 0), table, branch="audit"
    )
    # main-untouched + audit-sees-staged, all three cardinalities
    # (main read, branch read, expected base) in ONE tagged-union
    # aggregation job (they were three separate full-scan count()s)
    _wc = (
        read_iceberg(spark, table).select(F.lit("m").alias("_t"))
        .unionByName(
            read_iceberg(spark, table, ref="audit")
            .select(F.lit("a").alias("_t"))
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 2 == 0)
            .select(F.lit("b").alias("_t"))
        )
        .agg(
            F.sum((F.col("_t") == "m").cast("long")).alias("m"),
            F.sum((F.col("_t") == "a").cast("long")).alias("a"),
            F.sum((F.col("_t") == "b").cast("long")).alias("b"),
        )
        .collect()[0]
    )
    n_base = int(_wc["b"] or 0)
    if int(_wc["m"] or 0) != n_base:
        raise SparkError("staged branch append leaked into main")
    # AUDIT: the gate queries the BRANCH
    if int(_wc["a"] or 0) <= n_base:
        raise SparkError("audit read does not see the staged rows")
    # PUBLISH: verified-ancestor fast-forward
    publish_iceberg_branch(table, "audit")
    return read_iceberg(spark, table)


@query(
    "sink_delta_constraint",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id % 2 = 1 AND doc_id % 3 = 0
    """,
)
def sink_delta_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints (delta_writer.add_delta_constraint — the
    protocol's ``delta.constraints.*`` configuration keys): adding a
    constraint validates existing rows first; every later append and
    merge gates its incoming batch, refusing the WHOLE commit on one
    violating row — the write-time quality gate production Delta
    pipelines rely on.  Asserted in-key: a violating append refuses
    and leaves NO new version behind (atomicity), a constraint the
    existing data violates refuses at ADD time, and the history shows
    the ADD CONSTRAINT commit."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        delta_history,
        read_delta,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        add_delta_constraint,
        append_delta,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("delta_constraint", sf_dir)
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table)
    add_delta_constraint(spark, table, "chars_nonneg", "n_chars >= 0")
    try:
        add_delta_constraint(spark, table, "tiny", "n_chars < 0")
        raise SparkError("constraint violated by existing rows must refuse")
    except ValueError:
        pass
    # a conforming append passes the gate
    append_delta(
        docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 3 == 0)),
        table,
    )
    # a violating append refuses atomically.  The version-count probe
    # reads the log listing driver-side (delta_history's row count IS
    # len(_commit_files) — same metadata, zero Spark jobs instead of
    # two local-relation count() jobs)
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        _commit_files as _dcf,
    )

    _log_dir = os.path.join(table, "_delta_log")
    versions_before = len(_dcf(_log_dir))
    try:
        append_delta(
            docs.filter(F.col("doc_id") % 2 == 1)
            .withColumn("n_chars", F.lit(-1)),
            table,
        )
        raise SparkError("violating append must refuse")
    except ValueError:
        pass
    if len(_dcf(_log_dir)) != versions_before:
        raise SparkError("refused append left a commit behind")
    ops = [
        r["operation"] for r in delta_history(spark, table).collect()
    ]
    if "ADD CONSTRAINT" not in ops:
        raise SparkError(f"history missing ADD CONSTRAINT: {ops}")
    return read_delta(spark, table)


@query(
    "stream_cdc_replicate",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000
                ELSE n_chars END AS n_chars
    FROM documents
    WHERE (doc_id % 2 = 0 OR doc_id % 3 = 0) AND doc_id % 5 <> 0
    """,
)
def stream_cdc_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC REPLICATION: a downstream replica follows a primary Delta
    table by consuming its CHANGE DATA FEED version-by-version
    (delta.read_delta_cdf) and applying each batch as ONE MERGE whose
    conditions read the ride-along ``_change_type`` column — the
    standard table_changes consumer loop every cross-region replica
    and search-index sync job runs (merge_delta allows extra source
    columns for exactly this CDC-apply shape).  The primary sees all
    three write shapes (append, CoW MERGE, deletion-vector delete),
    so the replica must fold derived file-level changes AND DV mask
    diffs; the hash match proves the CDF stream is a lossless change
    log.  Scale shape: each applied batch costs ∝ that batch's change
    volume (the CDF contract), never ∝ table size.  The replica is
    built exclusively from CDF batches; asserted in-key: it converges
    to the primary's state after EVERY applied version (cardinality),
    with final full-row equality pinned by the oracle hash.

    The PRIMARY is a deterministic fixture cached per sf (the
    scan_zordered convention): what this key measures is the CDC
    CONSUMER — CDF reads + replica applies — not the primary's write
    path, which sink_delta_merge / sink_delta_merge_dv already
    bench."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        DeltaSnapshot,
        read_delta,
        read_delta_cdf,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        merge_delta,
        merge_delta_dv,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    cols = ["doc_id", "lang", "n_chars"]
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    primary = os.path.join("/tmp", f"glue_spark_cdc_primary_{h}")
    replica = _tmp_table("cdc_replica", sf_dir)
    # primary: one commit of each write shape, built once per sf
    if not os.path.exists(os.path.join(primary, "_delta_log")):
        append_delta(docs.filter(F.col("doc_id") % 2 == 0), primary)
        merge_delta(
            spark, primary,
            docs.filter(F.col("doc_id") % 3 == 0).withColumn(
                "n_chars", F.col("n_chars") + F.lit(1000)
            ),
            on=["doc_id"],
        )
        merge_delta_dv(
            spark, primary,
            read_delta(spark, primary).filter(F.col("doc_id") % 5 == 0),
            on=["doc_id"],
            matched_delete=F.lit(True),
        )
    head = DeltaSnapshot(primary).version
    if head != 2:
        raise SparkError(f"stale cdc primary fixture at {primary}")
    for v in range(head + 1):
        # one CDC-apply merge per batch: deletes and upserts resolve
        # from the _change_type column riding along the source rows.
        # A derived CoW-rewrite batch emits delete(old)+insert(new)
        # for the same key — collapse to the NET event per key first
        # (upsert beats delete), the standard CDF-batch reduction
        from pyspark.sql.window import Window as _W

        batch = (
            read_delta_cdf(spark, primary, v, v)
            .filter(F.col("_change_type") != "update_preimage")
            .select(*cols, "_change_type")
            .withColumn(
                "_prio",
                F.when(F.col("_change_type") == "delete", 0).otherwise(1),
            )
            .withColumn(
                "_rn",
                F.row_number().over(
                    _W.partitionBy("doc_id").orderBy(F.col("_prio").desc())
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_prio", "_rn")
        ).persist()  # the CDF plan (DV decode) runs once, not per
        # downstream validation/apply job inside the merge
        if not os.path.exists(os.path.join(replica, "_delta_log")):
            if batch.filter(
                F.col("_change_type") != "insert"
            ).limit(1).count():
                raise SparkError("non-inserts before the replica exists")
            append_delta(batch.select(*cols), replica)
        else:
            merge_delta(
                spark, replica, batch, on=["doc_id"],
                matched_delete=F.col("s._change_type") == "delete",
            )
        # convergence after EVERY applied batch: cardinality against the
        # primary's state at v; the lossless full-row proof is the
        # oracle hash match on the final state.  Live counts derive
        # DRIVER-SIDE from the snapshots' add-action footer stats minus
        # DV cardinalities (the stats-based COUNT(*) every production
        # Delta engine serves) — the previous tagged-union count()
        # full-scanned BOTH tables per version, a cost ∝ table size
        # inside a loop whose contract is cost ∝ change volume
        # (optimization r10, guide §1.2/§5: no data jobs for
        # metadata-sized questions).  Falls back to one tagged-union
        # scan job if any live file lacks stats.
        def _live_rows(path: str, version=None):
            s = DeltaSnapshot(path, version)
            total = 0
            for p in s._active:
                st = s._stats.get(p)
                if not st or st.get("numRecords") is None:
                    return None
                total += int(st["numRecords"])
            for p, dv in s._dvs.items():
                if dv.get("cardinality") is None:
                    return None
                total -= int(dv["cardinality"])
            return total

        n_rep = _live_rows(replica)
        n_pri = _live_rows(primary, version=v)
        if n_rep is None or n_pri is None:
            _sides = {
                r["side"]: r["n"]
                for r in read_delta(spark, replica)
                .select(F.lit(1).alias("side"))
                .unionByName(
                    read_delta(spark, primary, version=v)
                    .select(F.lit(2).alias("side"))
                )
                .groupBy("side")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            n_rep, n_pri = _sides.get(1, 0), _sides.get(2, 0)
        if n_rep != n_pri:
            raise SparkError(f"replica diverged after applying version {v}")
        batch.unpersist(blocking=False)
    return read_delta(spark, replica)


@query(
    "sink_hudi_clustering",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000
                ELSE n_chars END AS n_chars
    FROM documents
    WHERE doc_id % 2 = 0 OR doc_id % 3 = 0
    """,
)
def sink_hudi_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING as a REPLACECOMMIT (hudi_writer.cluster_hudi): after
    an insert + upsert scatter rows across file groups, one clustering
    commit rewrites every live group range-sorted on ``doc_id`` — the
    table service Hudi schedules to fix small-file and scatter
    problems.  Asserted in-key: the snapshot replays identically
    across the rewrite (oracle hash), time travel BEFORE the
    replacecommit still resolves the OLD groups, rows keep their
    ORIGINAL ``_hoodie_commit_time`` (clustering is not a data change
    — row-level incremental consumers must not re-see these rows),
    and the new base files carry range-disjoint ``doc_id`` footer
    spans (the stats-pruning evidence the rewrite exists to buy)."""
    import pyarrow.parquet as pq

    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.hudi import (
        read_hudi,
    )
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
        cluster_hudi,
        upsert_hudi,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    # the insert+upsert PRE-clustering table is a deterministic fixture
    # — built once per sf (scan_zordered convention) and COPIED per run
    # because clustering mutates it; what this key measures is the
    # clustering rewrite itself (append/upsert bench under
    # sink_hudi_roundtrip)
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    fixture = os.path.join("/tmp", f"glue_spark_hudi_cluster_fix_{h}")
    if not os.path.isdir(os.path.join(fixture, ".hoodie")):
        shutil.rmtree(fixture, ignore_errors=True)
        append_hudi(docs.filter(F.col("doc_id") % 2 == 0), fixture)
        upsert_hudi(
            spark,
            docs.filter(F.col("doc_id") % 3 == 0).withColumn(
                "n_chars", F.col("n_chars") + F.lit(1000)
            ),
            fixture, key="doc_id",
        )
    table = _tmp_table("hudi_clustering", sf_dir)
    shutil.copytree(fixture, table)
    pre = max(
        f.rsplit(".", 1)[0]
        for f in os.listdir(os.path.join(table, ".hoodie"))
        if f.endswith(".commit")
    )
    n_pre = read_hudi(spark, table).count()
    instant = cluster_hudi(spark, table, "doc_id", n_groups=2)
    # post-clustering commit-time max AND the pre-replacecommit time
    # travel count in ONE tagged-union aggregation job (they were two
    # separate full-scan actions over the clustered table)
    _kc = (
        read_hudi(spark, table).select(
            F.lit("c").alias("_t"), F.col("_hoodie_commit_time").alias("_v")
        )
        .unionByName(
            read_hudi(spark, table, as_of=pre).select(
                F.lit("p").alias("_t"),
                F.lit(None).cast("string").alias("_v"),
            )
        )
        .agg(
            F.max(F.when(F.col("_t") == "c", F.col("_v"))).alias("max_ct"),
            F.sum((F.col("_t") == "p").cast("long")).alias("n_tt"),
        )
        .collect()[0]
    )
    max_ct = _kc["max_ct"]
    if not max_ct < instant:
        raise SparkError(
            f"clustering re-stamped commit times ({max_ct} >= {instant})"
        )
    # time travel before the replacecommit resolves the OLD groups
    if int(_kc["n_tt"] or 0) != n_pre:
        raise SparkError("pre-clustering time travel broken")
    # new base files: range-disjoint doc_id spans
    new_files = sorted(
        f for f in os.listdir(table)
        if f.startswith("fg-cluster-") and f.endswith(".parquet")
    )
    if len(new_files) != 2:
        raise SparkError(f"expected 2 clustered groups, got {new_files}")
    spans = []
    for f in new_files:
        md = pq.read_metadata(os.path.join(table, f))
        idx = md.schema.names.index("doc_id")
        spans.append(
            (
                min(md.row_group(i).column(idx).statistics.min
                    for i in range(md.num_row_groups)),
                max(md.row_group(i).column(idx).statistics.max
                    for i in range(md.num_row_groups)),
            )
        )
    spans.sort()
    if any(c <= b for (a, b), (c, d) in zip(spans, spans[1:])):
        raise SparkError(f"clustered groups overlap on doc_id: {spans}")
    return read_hudi(spark, table).select("doc_id", "lang", "n_chars")


@query(
    "sink_delta_cm_write",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    """,
)
def sink_delta_cm_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-MAPPING WRITES (delta_writer.append_delta(
    column_mapping=True) — name mode, the protocol current Delta
    writers default to): the table creates under protocol (2,5) with
    per-field delta.columnMapping.id/physicalName metadata, data files
    carry the PHYSICAL names, and a later plain append detects the
    mode from the table and renames automatically — closing the
    reader/writer asymmetry (the reader has resolved name/id mode
    since r3/r7).  Asserted in-key: the parquet footers contain ONLY
    physical ``col-…`` names (a reader without the mapping cannot even
    see the logical schema — the rename really happened), and the
    engine's own reader round-trips the logical rows (oracle hash)."""
    import pyarrow.parquet as pq

    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        DeltaSnapshot,
        read_delta,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("delta_cm_write", sf_dir)
    append_delta(
        docs.filter(F.col("doc_id") % 2 == 0), table, column_mapping=True
    )
    # a plain append follows the table's recorded mode
    append_delta(docs.filter(F.col("doc_id") % 2 == 1), table)
    snap = DeltaSnapshot(table)
    for path in snap.files:
        names = set(pq.read_schema(path).names)
        if any(not n.startswith("col-") for n in names):
            raise SparkError(
                f"data file {path} leaks logical names: {sorted(names)}"
            )
    logical = {f.name for f in snap.schema.fields}
    if logical != {"doc_id", "lang", "n_chars"}:
        raise SparkError(f"logical schema lost: {sorted(logical)}")
    return read_delta(spark, table)


@query(
    "sink_delta_generated",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(FLOOR(n_chars / 1000) AS BIGINT) AS n_kchars
    FROM documents
    """,
)
def sink_delta_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED COLUMNS (the protocol's
    ``delta.generationExpression`` field metadata —
    delta_writer.append_delta(generated=...)): the table records a
    column as derived; a batch that OMITS it gets the value computed
    at write time, a batch that SUPPLIES it is validated row-by-row
    against the expression, and a mismatch refuses the whole commit —
    how production Delta keeps derived partitioning/rollup columns
    trustworthy without trusting every writer.  Asserted in-key: the
    omitted-column append computes, the supplied-correct append
    passes, the supplied-WRONG append refuses atomically, and the
    expression metadata survives in the schema."""
    from datafusion_catalogprovider_glue_spark.errors import SparkError
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        DeltaSnapshot,
        read_delta,
    )
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
    )

    apply_engine_conf(spark)
    docs = _docs3(spark, sf_dir)
    table = _tmp_table("delta_generated", sf_dir)
    expr = "CAST(FLOOR(n_chars / 1000) AS BIGINT)"
    # creation: n_kchars omitted → computed
    append_delta(
        docs.filter(F.col("doc_id") % 2 == 0), table,
        generated={"n_kchars": expr},
    )
    # later append SUPPLIES the column correctly → validated, passes
    append_delta(
        docs.filter(F.col("doc_id") % 2 == 1).withColumn(
            "n_kchars", F.expr(expr)
        ),
        table,
    )
    # a wrong supplied value refuses atomically
    # version-count probe driver-side (see sink_delta_constraint):
    # delta_history's row count IS len(_commit_files) — zero Spark
    # jobs instead of two local-relation count() jobs
    from datafusion_catalogprovider_glue_spark.sources.delta import (
        _commit_files as _dcf,
    )

    _log_dir = os.path.join(table, "_delta_log")
    n_versions = len(_dcf(_log_dir))
    try:
        append_delta(
            docs.filter(F.col("doc_id") % 2 == 1).withColumn(
                "n_kchars", F.lit(-1).cast("long")
            ).withColumn("doc_id", F.col("doc_id") + 1000000),
            table,
        )
        raise SparkError("wrong generated value must refuse")
    except ValueError:
        pass
    if len(_dcf(_log_dir)) != n_versions:
        raise SparkError("refused append left a commit behind")
    meta = {
        f.name: (f.metadata or {}).get("delta.generationExpression")
        for f in DeltaSnapshot(table).schema.fields
    }
    if meta.get("n_kchars") != expr:
        raise SparkError(f"generation expression lost: {meta}")
    return read_delta(spark, table)
