"""SparkSession factory tuned for the engine.

The reference pins ``target_partitions: 1`` (glue.rs:449) — a
single-partition scan that would never survive 100 TB. We deliberately
do NOT replicate that: sessions here enable AQE (runtime coalescing,
skew-join splitting, dynamic partition pruning) and Arrow for the
Pandas-UDF extension operators, per SURVEY.md §4.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

# Defaults applied to every session we build.  The shuffle-partition
# count is SCALE-ADAPTIVE, not a constant (guide §2.2 / round rule:
# a constant tuned to local[32] is wrong both when the driver benches
# at a lower core count and at cluster scale): it resolves, in order,
# to $SPARK_GRAFT_SHUFFLE_PARTITIONS (production override — size so
# post-AQE partitions land in the 100 MB–1 GB band), else the live
# context's defaultParallelism (== the local[N] core count, so a
# lower-core driver run schedules fewer, proportionally sized
# shuffles), else the $SPARK_GRAFT_CPUS seed at build time.  AQE
# coalescing then shrinks small stages further at runtime.
_BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # size coalesced partitions by BYTES (the advisory size), not
    # parallelism (guide §2.2: post-shuffle partitions belong in the
    # 100 MB–1 GB band, not "a few MB"; the parallelismFirst default
    # deliberately under-sizes them to chase core count, which at
    # bench scale schedules 32-task micro-stages and at 100 TB
    # produces millions of tiny reducers).  Interleaved same-process
    # A/B at sf0.1, advisory size at its 64m default both sides:
    # 7/8 relational/pipeline keys faster, min-total 7.43 → 6.84 s;
    # the CPU-dense dedup/ANN keys measured neutral (12.64 vs
    # 12.83 s).  The advisory size itself stays at Spark's default —
    # raising it to 256m measured neutral-to-worse locally; at
    # cluster scale it is the production knob to revisit alongside
    # SPARK_GRAFT_SHUFFLE_PARTITIONS.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.session.timeZone": "UTC",
    # 128 MiB splits: good balance of task count vs per-task overhead for
    # columnar scans; at 100 TB this yields ~800k tasks which Spark's
    # scheduler handles, and AQE coalesces downstream stages.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # RocksDB state store (r10): the default HDFSBackedStateStore holds
    # every key's state ON-HEAP per executor — at 100 TB stateful-
    # streaming scale (E keys: sessionize/funnel/CEP/dedup state keyed
    # by user) that heap residency is the production bottleneck, and
    # the production answer is the RocksDB provider (bundled with
    # Spark): state lives off-heap/on-disk with incremental checkpoint
    # snapshots.  Runtime-settable; read per streaming query at start.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # Python Data Source filter pushdown (SPARK-50603, default off in
    # 4.1): sources/pyds.py prunes files from pushed filters
    "spark.sql.python.filterPushdown.enabled": "true",
}


def _shuffle_partitions(spark: SparkSession = None) -> str:
    """Scale-adaptive shuffle-partition count (see _BASE_CONF note)."""
    explicit = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if explicit:
        return explicit
    if spark is not None:
        return str(spark.sparkContext.defaultParallelism)
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return cpus if cpus and cpus.isdigit() else str(os.cpu_count() or 8)


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable engine defaults to an existing session.

    Used when the harness hands us a session we didn't build (the
    driver's ``entry(spark)`` / ``queries()`` contract).  Only
    runtime-settable keys are applied; static ones are skipped.
    """
    for key, value in _BASE_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on a live session — keep the session's value
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", _shuffle_partitions(spark)
        )
    except Exception:
        pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    A session we didn't build may have a driver whose cwd/sys.path
    includes the repo while the executors' workers do not (and on a real
    cluster they never do).  Cloudpickled UDF closures that reference
    module-level helpers deserialize by module import, so ship the
    package once per SparkContext via ``addPyFile``.
    """
    sc = spark.sparkContext
    if getattr(sc, "_dcg_spark_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="dcg_spark_pkg_")
    zip_base = os.path.join(staging, "datafusion_catalogprovider_glue_spark_pkg")
    archive = shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir),
                                  os.path.basename(pkg_dir))
    sc.addPyFile(archive)
    sc._dcg_spark_pkg_shipped = True


def get_spark(app_name: str = "datafusion-catalogprovider-glue-spark") -> SparkSession:
    """Build (or fetch) the tuned local session.

    Master defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if unset),
    matching the driver's bench environment.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for key, value in _BASE_CONF.items():
        builder = builder.config(key, value)
    builder = builder.config(
        "spark.sql.shuffle.partitions", _shuffle_partitions()
    )
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    builder = builder.config("spark.ui.enabled", "false")
    spark = builder.getOrCreate()
    return apply_engine_conf(spark)
