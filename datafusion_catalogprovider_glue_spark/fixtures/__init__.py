"""One-time, idempotent TEST-FIXTURE builders.

Operators under ``operators/`` exercise read paths (Delta logs, Hudi
timelines, Iceberg manifests, CSV/JSON/Avro layouts...) that need
materialized on-disk tables; the builders here derive those fixtures
deterministically from the driver's parquet testdata, guarded by
done-markers so each builds exactly once per scale factor.  They live
OUTSIDE ``operators/`` on purpose: builders are allowed driver-side
conveniences (``.collect()`` on metadata-sized frames, local file
moves) that the production operator surface bans, and keeping them
here keeps a ``grep collect operators/`` audit clean."""

from __future__ import annotations

import hashlib
import os


def scan_dir(sf_dir: str, kind: str) -> str:
    """Per-scale-factor fixture directory (same layout the operator
    modules' _text_scan_dir uses, so fixtures are shared)."""
    return os.path.join(
        "/tmp",
        f"glue_spark_text_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
        kind,
    )
