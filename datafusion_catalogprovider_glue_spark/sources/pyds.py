"""PySpark-native DATA SOURCE exposing the engine's Delta reader as a
real registered format (Spark 4 Python Data Source API,
pyspark.sql.datasource — SPARK-44076): after ``register_glue_delta``
users write

    spark.read.format("glue_delta").load(path)                   # batch
    spark.readStream.format("glue_delta").load(path)             # stream

and get the engine's log-replay semantics through Spark's OWN source
machinery — executor-side partition reads (one InputPartition per
data file, arrow-batched), planner-driven FILTER PUSHDOWN
(partition-value and log-stats pruning happen in ``pushFilters``
before any file opens; requires
``spark.sql.python.filterPushdown.enabled``, set by the engine conf),
and exactly-once STREAMING offsets (commit versions) with checkpoint
replay.

Process-model constraint this module is shaped around: Spark runs
Python data sources in THREE kinds of python processes — the driver
(where registration happens), executor workers (batch ``read``; they
get the engine package via the session factory's addPyFile), and the
STREAMING SOURCE RUNNER (a driver-side helper process that receives
the DataSource by pickle and has NEITHER the driver's sys.path nor
addPyFile archives).  ``register_glue_delta`` therefore registers this
module for cloudpickle BY-VALUE serialization, and every method that
can run in the runner (``schema``, the streaming reader) is
SELF-CONTAINED: stdlib + pyarrow only, no package imports.  Batch
``read`` may lazily import the package (executor workers have it).

Streaming subset: append-only tails (the delta streaming source's own
default — a dataChange remove refuses loudly; real delta-spark
requires skipChangeCommits to continue); offsets are commit versions,
so a restart resumes exactly after the last committed batch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def register_glue_delta(spark) -> None:
    """Register the ``glue_delta`` format on a session.  By-value
    pickling makes the class self-carrying into Spark's python helper
    processes (see module docstring); addPyFile (engine conf) covers
    the lazy package imports on executor workers."""
    from pyspark import cloudpickle

    import datafusion_catalogprovider_glue_spark.sources.pyds as _me

    cloudpickle.register_pickle_by_value(_me)
    spark.dataSource.register(GlueDeltaDataSource)


# --- self-contained log helpers (runner-safe: stdlib only) -----------


def _log_commits(path: str) -> list:
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise RuntimeError(f"glue_delta: no _delta_log at {path!r}")
    out = []
    for name in os.listdir(log_dir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and stem.isdigit():
            out.append((int(stem), os.path.join(log_dir, name)))
    return sorted(out)


def _latest_schema_json(path: str) -> str:
    """schemaString from the newest metaData action across commit
    files (runner-safe; checkpointed-only logs are out of this
    source's subset and refuse loudly)."""
    schema_str = None
    for _v, p in _log_commits(path):
        with open(p) as fh:
            for line in fh:
                if not line.strip():
                    continue
                meta = json.loads(line).get("metaData")
                if meta and meta.get("schemaString"):
                    schema_str = meta["schemaString"]
    if schema_str is None:
        raise RuntimeError(
            f"glue_delta: no metaData action in the commit files at "
            f"{path!r} (checkpoint-only logs are outside this "
            "source's subset — use sources/delta.read_delta)"
        )
    return schema_str


def _resolve_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise RuntimeError(
            "glue_delta: pass the table path via .load(path) or "
            ".option('path', ...)"
        )
    return path


@dataclass
class _FilePart(InputPartition):
    path: str
    table_path: str  # DV descriptors resolve against the table root
    partition_values: dict
    dv_descriptor: str  # JSON or "" — decoded where the task runs


class _GlueDeltaReader(DataSourceReader):
    """Batch reader — runs in the plan worker / executor workers,
    where the engine package is importable (addPyFile)."""

    def __init__(self, schema, options):
        from datafusion_catalogprovider_glue_spark.sources.delta import (
            DeltaSnapshot,
        )

        self._path = _resolve_path(options)
        version = options.get("versionasof") or options.get("versionAsOf")
        self._snap = DeltaSnapshot(
            self._path, int(version) if version is not None else None
        )
        if self._snap.column_mapping:
            raise RuntimeError(
                "glue_delta subset: column-mapping tables go through "
                "sources/delta.read_delta"
            )
        self._schema = schema

    def pushFilters(self, filters):
        """Planner-driven pruning: partition-value filters and
        stats-range filters restrict the FILE SET here, before any
        partition is planned.  Every filter is reported back as
        unsupported so Spark re-applies it row-level — file pruning is
        an optimization, never a correctness dependency."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        part_cols = set(self._snap.partition_columns)
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col is None:
                continue
            if isinstance(f, EqualTo):
                if col in part_cols:
                    want = None if f.value is None else str(f.value)
                    self._snap._active = {
                        p: pv
                        for p, pv in self._snap._active.items()
                        if pv.get(col) == want
                    }
                else:
                    self._prune_stats(col, f.value, f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                if col not in part_cols:
                    self._prune_stats(col, f.value, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                if col not in part_cols:
                    self._prune_stats(col, None, f.value)
        self._snap._dvs = {
            p: d
            for p, d in self._snap._dvs.items()
            if p in self._snap._active
        }
        return iter(filters)

    def _prune_stats(self, col, lo, hi):
        def survives(path):
            st = self._snap._stats.get(path)
            if not st:
                return True
            mins = st.get("minValues") or {}
            maxs = st.get("maxValues") or {}
            if col not in mins or col not in maxs:
                return True
            if hi is not None and mins[col] > hi:
                return False
            if lo is not None and maxs[col] < lo:
                return False
            return True

        self._snap._active = {
            p: pv for p, pv in self._snap._active.items() if survives(p)
        }

    def partitions(self):
        snap = self._snap
        out = []
        for rel, pvals in sorted(snap._active.items()):
            dv = snap._dvs.get(rel)
            out.append(
                _FilePart(
                    path=os.path.join(snap.table_path, rel),
                    table_path=snap.table_path,
                    partition_values=dict(pvals or {}),
                    dv_descriptor=json.dumps(dv) if dv else "",
                )
            )
        return out

    def read(self, partition):
        """Executor-side: arrow-read ONE data file, apply its DV mask
        positions, attach partition-column literals."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        if partition.dv_descriptor:
            import numpy as np

            from datafusion_catalogprovider_glue_spark.sources.dv import (
                read_dv,
            )

            desc = json.loads(partition.dv_descriptor)
            # vectorized mask (guide §4.2): flip the dead positions in
            # one numpy scatter instead of a per-row Python loop —
            # positions past the file's row count are no-ops, matching
            # the membership-test semantics this replaces
            dead = np.fromiter(
                read_dv(partition.table_path, desc), dtype=np.int64
            )
            keep = np.ones(tbl.num_rows, dtype=bool)
            if dead.size:
                keep[dead[dead < tbl.num_rows]] = False
            tbl = tbl.filter(pa.array(keep))
        for f in self._schema.fields:
            if f.name not in tbl.column_names:
                import pyspark.sql.types as T

                raw = partition.partition_values.get(f.name)
                pa_type = {
                    T.StringType(): pa.string(),
                    T.LongType(): pa.int64(),
                    T.IntegerType(): pa.int32(),
                    T.DoubleType(): pa.float64(),
                }.get(f.dataType, pa.string())
                val = raw
                if raw is not None and pa_type in (pa.int64(), pa.int32()):
                    val = int(raw)
                elif raw is not None and pa_type == pa.float64():
                    val = float(raw)
                # constant column in one C-level repeat, not a
                # row-count-sized Python list (guide §4.2)
                tbl = tbl.append_column(
                    f.name,
                    pa.repeat(
                        pa.scalar(val, type=pa_type), tbl.num_rows
                    ),
                )
        tbl = tbl.select([f.name for f in self._schema.fields])
        for batch in tbl.to_batches():
            yield batch


class _GlueDeltaStreamReader(SimpleDataSourceStreamReader):
    """Commit-version offsets; RUNNER-SAFE (stdlib + pyarrow only —
    this class executes in Spark's streaming source runner process,
    which has neither the driver's sys.path nor addPyFile archives).
    Batch N serves the rows ADDED by commits (start, end]."""

    def __init__(self, schema, options):
        self._path = _resolve_path(options)
        self._schema = schema

    def initialOffset(self):
        return {"version": -1}

    def _added_rows(self, start_v, end_v):
        import pyarrow.parquet as pq

        for v, path in _log_commits(self._path):
            if not (start_v < v <= end_v):
                continue
            with open(path) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    rm = action.get("remove")
                    if rm and rm.get("dataChange", True):
                        raise RuntimeError(
                            f"glue_delta stream: commit {v} removes "
                            "data — append-only tails only (real "
                            "delta streaming needs skipChangeCommits "
                            "here too)"
                        )
                    add = action.get("add")
                    if not add:
                        continue
                    if add.get("deletionVector"):
                        raise RuntimeError(
                            "glue_delta stream: DV commits are not "
                            "append-only"
                        )
                    tbl = pq.read_table(
                        os.path.join(self._path, add["path"])
                    )
                    names = [
                        f.name
                        for f in self._schema.fields
                        if f.name in tbl.column_names
                    ]
                    for batch in tbl.select(names).to_batches():
                        yield batch

    def _tuples(self, batches):
        """Schema-ordered row tuples from arrow batches, built by
        columnar zip — no per-row dict materialization (guide §4.2);
        absent columns pad with nulls like the dict .get they
        replace."""
        names = [f.name for f in self._schema.fields]
        for batch in batches:
            present = set(batch.schema.names)
            cols = [
                batch.column(n).to_pylist()
                if n in present
                else [None] * batch.num_rows
                for n in names
            ]
            yield from zip(*cols)

    def read(self, start):
        start_v = int(start["version"])
        end_v = max((v for v, _p in _log_commits(self._path)), default=-1)
        if end_v <= start_v:
            return iter([]), {"version": start_v}
        tuples = list(self._tuples(self._added_rows(start_v, end_v)))
        return iter(tuples), {"version": end_v}

    def readBetweenOffsets(self, start, end):
        return self._tuples(
            self._added_rows(int(start["version"]), int(end["version"]))
        )

    def commit(self, end):
        pass  # offsets are durable in the query checkpoint


class GlueDeltaDataSource(DataSource):
    """``register_glue_delta(spark)`` then
    ``spark.read.format("glue_delta")`` / ``spark.readStream...``."""

    @classmethod
    def name(cls):
        return "glue_delta"

    def schema(self):
        # runner-safe: parse the log's schemaString directly (it IS a
        # Spark StructType JSON) — no package import
        import pyspark.sql.types as T

        return T.StructType.fromJson(
            json.loads(_latest_schema_json(_resolve_path(self.options)))
        )

    def reader(self, schema):
        return _GlueDeltaReader(schema, self.options)

    def simpleStreamReader(self, schema):
        return _GlueDeltaStreamReader(schema, self.options)
