"""SparkSession factory with scale-oriented defaults.

The reference engine hand-builds its runtime: 1024-row morsels
(``src/releation/mod.rs:20-26``), push pipelines and pipeline-breaker
scheduling (``src/executor/mod.rs:84-207``), two OS threads joined by an
mpsc channel (``src/main.rs:53-64``). On Spark every one of those is a
built-in (Tungsten columnar batches, whole-stage codegen, the DAG
scheduler), so this module's job is only to *configure* that machinery
for the 100 TB design point:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing);
- broadcast threshold generous enough that dimension tables never shuffle;
- Arrow on for the few Pandas-UDF operators;
- shuffle partitions sized by env so local[32] tests and a 1000-executor
  cluster use the same code path with different settings.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

# --- vendored pure-python protobuf (vendor/google/protobuf) -------------
# transformWithStateInPandas speaks protobuf to the JVM state server; when
# the environment has no google.protobuf we fall back to the vendored
# pure-python runtime (public protobuf 4.23.2 tree + a runtime_version
# shim — see vendor/google/protobuf/LICENSE). An installed protobuf always
# wins: the vendor dir is appended only on ImportError, and PYTHONPATH is
# extended (not replaced) so Spark-spawned Python workers resolve the same
# module the driver did.
_VENDOR_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "vendor")
)


def _ensure_protobuf() -> None:
    try:
        import google.protobuf  # noqa: F401
        return
    except ImportError:
        pass
    if os.path.isdir(os.path.join(_VENDOR_DIR, "google", "protobuf")):
        if _VENDOR_DIR not in sys.path:
            sys.path.append(_VENDOR_DIR)
        existing = os.environ.get("PYTHONPATH", "")
        if _VENDOR_DIR not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                existing + os.pathsep + _VENDOR_DIR if existing else _VENDOR_DIR
            )
        # The vendored tree is pure-python; make api_implementation not
        # probe for the absent C++ extension.
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


_ensure_protobuf()


def ensure_protobuf_on_workers(spark: SparkSession) -> None:
    """Extend the captured-at-UDF-creation worker env with the vendor dir.

    The transformWithState state-server workers are spawned with the
    PythonFunction's ``envVars`` (``sc.environment``), NOT the driver's
    live ``os.environ`` — so when the JVM was launched before this
    package was imported (the driver-contract path: vanilla
    SparkSession, then ``import __spark_entry__``), the os.environ edit
    in :func:`_ensure_protobuf` never reaches them. Mutating
    ``sc.environment`` here does, because it is read at UDF creation
    time. No-op when a real google.protobuf is installed."""
    if _VENDOR_DIR not in sys.path:  # real protobuf won; nothing vendored
        return
    env = spark.sparkContext.environment
    existing = env.get("PYTHONPATH", "")
    if _VENDOR_DIR not in existing.split(os.pathsep):
        env["PYTHONPATH"] = (
            existing + os.pathsep + _VENDOR_DIR if existing else _VENDOR_DIR
        )
    env.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


# Defaults chosen for the local[32] / 128 GiB harness; on a real cluster
# these are overridden by spark-submit conf (the code never assumes them).
_LOCAL_DEFAULTS: dict[str, str] = {
    # --- adaptive execution: the scale workhorse ------------------------
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- shuffle sizing -------------------------------------------------
    # At 100 TB this would be O(10k); AQE coalesces down, so err high.
    "spark.sql.shuffle.partitions": "32",
    # --- join strategy --------------------------------------------------
    # region/nation/supplier/part are all broadcast-able at any SF that
    # fits the TPC-H-ish ratios; 64 MiB covers them with margin.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- Python interop -------------------------------------------------
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # --- misc -----------------------------------------------------------
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    # events.ts is ns-precision Parquet; read as BIGINT nanos and convert
    # in sources.catalog.load_table (truncate to µs, matching DuckDB).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Honored when THIS factory launches the JVM (local mode, fresh
    # process); a no-op on an already-running session. The 1g default
    # OOMs broadcast builds well before the 64 MiB threshold is reached
    # (observed at 10x sf0.1: notEnoughMemoryToBuildAndBroadcastTable).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def resilient_local_checkpoint(df, eager: bool = True):
    """``localCheckpoint`` with a storage level that survives losing one
    executor when the app actually runs on multiple executor JVMs.

    Local checkpointing truncates lineage by design, so its blocks are
    the ONLY way to recompute downstream stages — and the default
    storage keeps one replica. On a multi-executor cluster, SIGKILLing
    the executor that holds a block is then unrecoverable:
    ``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND`` aborts the job after
    exhausting stage retries (reproduced deterministically by
    tests/test_fault_tolerance.py's executor-kill drill before this
    helper existed). ``MEMORY_AND_DISK_2`` keeps a second replica on
    another executor, so single-executor loss degrades to a replica
    read instead of a dead query — the posture a 100 TB cluster needs,
    where executor churn is routine.

    In single-JVM ``local[n]`` mode there is no second executor to
    replicate to; the default level is kept (replication would only log
    insufficient-peer warnings), so bench timings, plan fingerprints,
    and block-manager footprint in the test/bench environment are
    byte-identical to plain ``localCheckpoint``."""
    sc = df.sparkSession.sparkContext
    if sc.master.startswith("local[") or sc.master == "local":
        return df.localCheckpoint(eager=eager)
    from pyspark.storagelevel import StorageLevel

    return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.MEMORY_AND_DISK_2)


def get_spark(app_name: str = "pipeline-query-engine-spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the session.

    Core count comes from ``SPARK_GRAFT_CPUS`` (driver contract) so the
    bench harness and tests share one factory. ``overrides`` win over
    the defaults — callers opt out, never fork the config dict.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = {**_LOCAL_DEFAULTS, **overrides}
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
