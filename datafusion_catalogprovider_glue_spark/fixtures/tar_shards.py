"""Fixture: the documents corpus packed into one USTAR tar shard
(WebDataset-style), built once per scale factor — the input
multimodal_tar_index walks distributed.  The driver-side collect is a
one-time fixture convenience and lives here, off the production
operator surface."""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

from pyspark.sql import SparkSession

from datafusion_catalogprovider_glue_spark.tables import load_table


def build_documents_tar_shard(spark: SparkSession, sf_dir: str) -> str:
    """Returns the directory holding shard-00000.tar."""
    base = os.path.join(
        "/tmp",
        f"glue_spark_tar_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    shard = os.path.join(base, "shard-00000.tar")
    if os.path.exists(shard):
        return base
    os.makedirs(base, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    tmp = shard + ".tmp"
    with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tf:
        for r in docs:
            data = r.text.encode("utf-8")
            info = tarfile.TarInfo(name=f"doc_{r.doc_id}.txt")
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    os.rename(tmp, shard)
    return base
