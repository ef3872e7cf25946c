"""Fixture: documents as NDJSON where every doc_id % 7 == 0 line is
truncated mid-object — the dirty-data-lake input scan_json_corrupt
quarantines via PERMISSIVE mode.  Built once per scale factor; the
driver-side collect is metadata-sized (doc_id, lang, n_chars only)
and lives here, off the production operator surface."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from datafusion_catalogprovider_glue_spark.fixtures import scan_dir
from datafusion_catalogprovider_glue_spark.tables import load_table


def build_documents_corrupt_json(spark: SparkSession, sf_dir: str) -> str:
    """Returns the NDJSON file path (not the directory)."""
    out = scan_dir(sf_dir, "documents_corrupt_json")
    marker = os.path.join(out, "_DONE")
    path = os.path.join(out, "part-00000.json")
    if os.path.exists(marker):
        return path
    os.makedirs(out, exist_ok=True)
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .collect()
    )
    with open(path + ".tmp", "w") as fh:
        for r in rows:
            line = json.dumps(
                {"doc_id": r.doc_id, "lang": r.lang, "n_chars": r.n_chars}
            )
            if r.doc_id % 7 == 0:
                line = line[: len(line) // 2]  # truncated mid-object
            fh.write(line + "\n")
    os.rename(path + ".tmp", path)
    with open(marker, "w") as fh:
        fh.write("ok")
    return path
