"""Iceberg PARTITION TRANSFORMS (spec §partition-transforms) — the
shared half of the reader's manifest-level pruning and the writer's
partitioned layout.

Real Iceberg tables overwhelmingly partition by a TRANSFORM of a
source column (``days(ts)`` on event tables, ``bucket[N]`` on join
keys, ``truncate[W]`` on ids), not by raw column identity; the
reference's Glue path surfaces such tables too (partition keys,
glue.rs:433-447).  This module implements the spec's transform
functions so engine-written manifests carry spec-shaped partition
tuples and reads prune on them without opening data files:

* ``identity``          — the value itself
* ``year/month/day/hour`` — signed offsets from the Unix epoch
  (2024-01-05 → day 19727), exactly the spec's integer encoding
* ``bucket[N]``         — ``(murmur3_x86_32(bytes) & Int.MAX) % N``
  with the spec's byte layouts: int/long/date/timestamp hash as the
  8-byte little-endian LONG value (dates as days from epoch,
  timestamps as UTC microseconds from epoch), strings as UTF-8 bytes
  (spec test vectors: 34 → 2017239379, "iceberg" → 1210000089,
  2017-11-16T22:31:08 → −2047944441 — pinned in
  tests/test_iceberg.py); bucketing on timestamp_ntz stays refused
  (no tz-free epoch-micros builtin)
* ``truncate[W]``       — floor-to-width for ints/longs (negative
  values round toward -inf), prefix-of-W for strings

Two evaluation paths, one semantics:

* :func:`apply_transform` — scalar Python, used DRIVER-side to fold a
  ``partition_filter`` value into the expected manifest tuple value
  (metadata-sized work).
* :func:`transform_column` — a Spark Column, used EXECUTOR-side by the
  partitioned writer to lay data out.  Everything except ``bucket`` is
  built-in JVM expressions (whole-stage codegen); ``bucket`` needs
  murmur3 with Iceberg's seed/byte-layout (Spark's ``hash()`` is
  murmur3 seed 42 with different int widening, so it CANNOT match) and
  runs as an Arrow-batched pandas UDF — numpy-vectorized for the
  fixed-width long path, per-row only for variable-length strings.
"""

from __future__ import annotations

import datetime
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet

_EPOCH = datetime.date(1970, 1, 1)
_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$")


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 — the spec's bucket hash (seed 0)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    rounded = len(data) & ~3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if tail:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _bucket_hash(value) -> int:
    """Spec byte layout: int/long/date/timestamp widen to a LONG and
    hash its 8-byte little-endian form (dates as days from epoch,
    timestamps as MICROSECONDS from epoch — spec vector
    2017-11-16T22:31:08 → −2047944441, pinned in tests); strings hash
    their UTF-8.  tz-aware datetimes fold to UTC; naive ones are UTC
    wall time (the spec's timestamptz frame — same convention as the
    temporal transforms)."""
    if isinstance(value, str):
        data = value.encode("utf-8")
    else:
        if isinstance(value, datetime.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            delta = value - datetime.datetime(1970, 1, 1)
            value = (
                (delta.days * 86400 + delta.seconds) * 1_000_000
                + delta.microseconds
            )
        elif isinstance(value, datetime.date):
            value = (value - _EPOCH).days
        data = int(value).to_bytes(8, "little", signed=True)
    return murmur3_32(data)


def _to_datetime(value) -> datetime.datetime:
    if isinstance(value, datetime.datetime):
        return value
    if isinstance(value, datetime.date):
        return datetime.datetime(value.year, value.month, value.day)
    if isinstance(value, str):
        return datetime.datetime.fromisoformat(value)
    raise NotImplementedYet(
        f"temporal transform on non-temporal value {value!r}"
    )


def partition_field_name(source: str, transform: str) -> str:
    """Iceberg's conventional partition-field naming."""
    if transform == "identity":
        return source
    if _BUCKET_RE.match(transform):
        return f"{source}_bucket"
    if _TRUNCATE_RE.match(transform):
        return f"{source}_trunc"
    return f"{source}_{transform}"


def apply_transform(transform: str, value):
    """Scalar evaluation — the driver-side half: folds a filter value
    into the manifest-tuple value files of that partition carry."""
    if value is None:
        return None
    if transform == "identity":
        return value
    m = _BUCKET_RE.match(transform)
    if m:
        return (_bucket_hash(value) & 0x7FFFFFFF) % int(m.group(1))
    m = _TRUNCATE_RE.match(transform)
    if m:
        w = int(m.group(1))
        if isinstance(value, str):
            return value[:w]
        v = int(value)
        return v - (v % w)  # python % is floor-mod: negatives round down
    if transform in ("year", "month", "day", "hour"):
        dt = _to_datetime(value)
        if dt.tzinfo is not None:
            # tz-aware instant → UTC wall clock (the spec's evaluation
            # frame for timestamptz); naive datetimes are interpreted
            # as UTC wall time, matching transform_column's epoch fold
            dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        if transform == "year":
            return dt.year - 1970
        if transform == "month":
            return (dt.year - 1970) * 12 + (dt.month - 1)
        if transform == "day":
            return (dt.date() - _EPOCH).days
        delta = dt - datetime.datetime(1970, 1, 1)
        return int(delta.total_seconds() // 3600)
    raise NotImplementedYet(f"unsupported partition transform {transform!r}")


def _bucket_column(col: Column, n: int, dtype: str) -> Column:
    """bucket[N] as an Arrow-batched pandas UDF.  The long path is
    fully numpy-vectorized (fixed 8-byte input → murmur3's two body
    rounds as uint32 array ops); strings fall back to per-row hashing
    inside the batch (variable length defeats vectorization) — both
    stay executor-side with zero shuffle."""
    from pyspark.sql.functions import pandas_udf

    if dtype in ("int", "bigint", "date"):

        @pandas_udf("int")
        def _bucket_long(s: pd.Series) -> pd.Series:
            # NULLs are gated JVM-side (F.when below), so the batch
            # arrives as pure int64 — never float64, which would
            # corrupt longs with |v| > 2^53 (r6 advisor finding)
            u = s.to_numpy(dtype="int64", na_value=0).view(np.uint64)
            k1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            k2 = (u >> np.uint64(32)).astype(np.uint32)
            h = np.zeros(len(s), dtype=np.uint32)
            for k in (k1, k2):
                k = k * np.uint32(0xCC9E2D51)
                k = (k << np.uint32(15)) | (k >> np.uint32(17))
                k = k * np.uint32(0x1B873593)
                h = h ^ k
                h = (h << np.uint32(13)) | (h >> np.uint32(19))
                h = h * np.uint32(5) + np.uint32(0xE6546B64)
            h = h ^ np.uint32(8)
            h = h ^ (h >> np.uint32(16))
            h = h * np.uint32(0x85EBCA6B)
            h = h ^ (h >> np.uint32(13))
            h = h * np.uint32(0xC2B2AE35)
            h = h ^ (h >> np.uint32(16))
            out = (h & np.uint32(0x7FFFFFFF)) % np.uint32(n)
            return pd.Series(pd.array(out.astype("int32"), dtype="Int32"))

        if dtype == "date":
            # spec: dates hash as their days-from-epoch int (widened)
            col = F.datediff(col, F.lit("1970-01-01"))
        # NULL stays NULL; non-null rows reach the UDF as exact int64
        return F.when(
            col.isNull(), F.lit(None).cast("int")
        ).otherwise(_bucket_long(F.coalesce(col.cast("long"), F.lit(0))))

    if dtype == "timestamp":
        # spec: timestamptz hashes its MICROSECONDS-from-epoch long;
        # unix_micros reads the instant independent of the session tz
        # (same UTC frame as the temporal transforms).  ntz stays
        # refused: extracting exact epoch micros from a wall-clock
        # value has no tz-free builtin.
        inner = _bucket_column(F.unix_micros(col), n, "bigint")
        return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(inner)

    if dtype == "string":

        @pandas_udf("int")
        def _bucket_str(s: pd.Series) -> pd.Series:
            return s.map(
                lambda v: None
                if v is None
                else (murmur3_32(v.encode("utf-8")) & 0x7FFFFFFF) % n
            ).astype("Int32")

        return _bucket_str(col)

    raise NotImplementedYet(f"bucket transform on type {dtype!r}")


def transform_column(col: Column, transform: str, dtype: str) -> Column:
    """Spark Column evaluation — the executor-side half the partitioned
    writer lays data out with.  Must agree value-for-value with
    :func:`apply_transform` (pinned in tests/test_iceberg.py)."""
    if transform == "identity":
        return col
    m = _BUCKET_RE.match(transform)
    if m:
        return _bucket_column(col, int(m.group(1)), dtype)
    m = _TRUNCATE_RE.match(transform)
    if m:
        w = int(m.group(1))
        if dtype == "string":
            return F.substring(col, 1, w)
        # v - pmod(v, w): floor-to-width, negatives round toward -inf
        return (col - F.pmod(col, F.lit(w))).cast(dtype)
    if transform in ("year", "month", "day", "hour"):
        if dtype == "timestamp":
            # session-tz TIMESTAMP is an INSTANT; Iceberg declares it
            # timestamptz and evaluates temporal transforms in UTC
            # (spec §partition-transforms).  unix_timestamp() reads
            # the instant's epoch seconds independent of the session
            # timezone, so these fold identically under ANY session tz
            # — F.year/F.to_date/F.hour would instead use the session
            # calendar (r6 advisor finding).
            epoch = F.unix_timestamp(col)
            if transform == "hour":
                return F.floor(epoch / F.lit(3600)).cast("int")
            days = F.floor(epoch / F.lit(86400)).cast("int")
            if transform == "day":
                return days
            d = F.date_add(F.to_date(F.lit("1970-01-01")), days)
            if transform == "year":
                return (F.year(d) - F.lit(1970)).cast("int")
            return (
                (F.year(d) - F.lit(1970)) * F.lit(12) + F.month(d) - F.lit(1)
            ).cast("int")
        # date / timestamp_ntz: tz-free calendar values — date-part
        # arithmetic IS the spec fold (ntz refuses numeric casts)
        if transform == "year":
            return F.year(col) - F.lit(1970)
        if transform == "month":
            return (
                (F.year(col) - F.lit(1970)) * F.lit(12) + F.month(col) - F.lit(1)
            )
        if transform == "day":
            return F.datediff(F.to_date(col), F.lit("1970-01-01"))
        return (
            F.datediff(F.to_date(col), F.lit("1970-01-01")) * F.lit(24)
            + F.hour(col)
        ).cast("int")
    raise NotImplementedYet(f"unsupported partition transform {transform!r}")


def transformed_dtype(transform: str, source_dtype: str) -> str:
    """simpleString of the transform's OUTPUT type (what the partition
    directory value parses back as)."""
    if transform == "identity":
        return source_dtype
    if _TRUNCATE_RE.match(transform):
        return source_dtype
    return "int"
