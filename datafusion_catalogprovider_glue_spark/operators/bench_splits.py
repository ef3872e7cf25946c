"""Fixture-vs-measured-op splits for the heaviest sink bench keys
(r9 VERDICT item 9, stretch).

The sink_* bench keys build their table fixture AND run the measured
operation inside one callable, so a regression in the OPERATION (the
thing a user actually pays per commit — a DV merge against a
DV-carrying table) can hide inside fixture-build noise.  Each entry
here splits one key into

    build(spark, sf_dir) -> ctx      # fixture: NOT the measured op
    op(spark, sf_dir, ctx) -> None   # the operation a round-over-round
                                     # regression should be visible in

bench.py times the two separately (once each, after the headline
number) and records them under ``sink_splits`` in bench_full.json; the
headline metric is unchanged.  The split functions reuse the writer
surface directly — correctness of the composed pipeline stays pinned
by the original keys' oracles.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.session import apply_engine_conf
from datafusion_catalogprovider_glue_spark.tables import load_table


def _docs(spark: SparkSession, sf_dir: str):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def _tmp(sf_dir: str, tag: str) -> str:
    return os.path.join(
        "/tmp",
        f"glue_spark_split_{tag}_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )


# --- sink_delta_merge_dv_partitioned: op = DV merge 2 (table already
# --- carries DVs — the existing-DV decode + per-file union path)


def _delta_mdvp_build(spark, sf_dir):
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        merge_delta_dv,
    )

    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir)
    table = _tmp(sf_dir, "dmdvp")
    shutil.rmtree(table, ignore_errors=True)
    append_delta(
        docs.filter(F.col("doc_id") % 2 == 0), table, partition_by="lang"
    )
    merge_delta_dv(
        spark, table,
        docs.filter(F.col("doc_id") % 3 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        ),
        on=["doc_id"], matched_delete=F.col("t.lang") == "de",
    )
    return table


def _delta_mdvp_op(spark, sf_dir, table):
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        merge_delta_dv,
    )

    merge_delta_dv(
        spark, table,
        _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(2000)
        ),
        on=["doc_id"], matched_delete=F.col("t.lang") == "en",
    )


# --- sink_iceberg_merge_dv: op = pos-delete merge 2 (seq-scoped
# --- identity scan over a delete-carrying table)


def _ice_mdv_build(spark, sf_dir):
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        append_iceberg,
        merge_iceberg_pos_delete,
    )

    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir)
    table = _tmp(sf_dir, "imdv")
    shutil.rmtree(table, ignore_errors=True)
    append_iceberg(docs.filter(F.col("doc_id") % 2 == 0), table)
    merge_iceberg_pos_delete(
        spark, table,
        docs.filter(F.col("doc_id") % 3 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        ),
        on=["doc_id"], matched_delete=F.col("t.lang") == "de",
    )
    return table


def _ice_mdv_op(spark, sf_dir, table):
    from datafusion_catalogprovider_glue_spark.sources.iceberg_writer import (
        merge_iceberg_pos_delete,
    )

    merge_iceberg_pos_delete(
        spark, table,
        _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(2000)
        ),
        on=["doc_id"], matched_delete=F.col("t.lang") == "en",
    )


# --- sink_delta_merge: op = a second CoW MERGE into the merged table


def _delta_merge_build(spark, sf_dir):
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        append_delta,
        merge_delta,
    )

    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir)
    table = _tmp(sf_dir, "dmerge")
    shutil.rmtree(table, ignore_errors=True)
    append_delta(docs.filter(F.col("doc_id") % 2 == 0), table)
    merge_delta(
        spark, table,
        docs.filter(F.col("doc_id") % 3 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        ),
        on=["doc_id"],
    )
    return table


def _delta_merge_op(spark, sf_dir, table):
    from datafusion_catalogprovider_glue_spark.sources.delta_writer import (
        merge_delta,
    )

    merge_delta(
        spark, table,
        _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(2000)
        ),
        on=["doc_id"],
    )


# --- sink_hudi_mor_roundtrip: op = one MoR upsert deltacommit


def _hudi_mor_build(spark, sf_dir):
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        append_hudi,
    )

    apply_engine_conf(spark)
    docs = _docs(spark, sf_dir)
    table = _tmp(sf_dir, "hmor")
    shutil.rmtree(table, ignore_errors=True)
    append_hudi(docs.filter(F.col("doc_id") % 2 == 0), table)
    return table


def _hudi_mor_op(spark, sf_dir, table):
    from datafusion_catalogprovider_glue_spark.sources.hudi_writer import (
        upsert_hudi_log,
    )

    upsert_hudi_log(
        spark,
        _docs(spark, sf_dir).filter(F.col("doc_id") % 6 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(500)
        ),
        table,
        key="doc_id",
    )


SINK_SPLITS = {
    "sink_delta_merge_dv_partitioned": (_delta_mdvp_build, _delta_mdvp_op),
    "sink_iceberg_merge_dv": (_ice_mdv_build, _ice_mdv_op),
    "sink_delta_merge": (_delta_merge_build, _delta_merge_op),
    "sink_hudi_mor_roundtrip": (_hudi_mor_build, _hudi_mor_op),
}
