"""SparkSession construction with engine defaults.

Defaults chosen for determinism (UTC timestamps), Arrow exchange at the
Python boundary, and scale-friendly execution (AQE on, coalesced shuffle
partitions).  On a real cluster the same builder is used with a different
master; nothing here is local-mode-specific except the fallback master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Engine-level Spark conf applied to every session we build.  Each entry is
#: safe to set post-hoc on an existing session too (runtime-mutable SQL confs).
ENGINE_SQL_CONF: dict[str, str] = {
    # Determinism: timestamps rendered/compared in UTC everywhere.
    "spark.sql.session.timeZone": "UTC",
    # Arrow exchange for pandas UDFs / toPandas / createDataFrame.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bigger Arrow batches at the JVM⇄Python boundary: measured ~2× faster
    # end-to-end for mapInArrow / Python data source writes than the 10k
    # default (fewer batch round-trips), while 64k rows × ~100 B/row stays
    # ~6 MB per batch — safely inside executor memory at cluster scale.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Adaptive execution: runtime shuffle coalescing + skew-join splitting.
    # This is the primary lever that lets one static conf serve both the
    # sf0.01 oracle runs and a 100 TB cluster run.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Static shuffle width: sized to the local test harness (local[32]);
    # AQE coalesces below it, and a cluster deploy overrides it upward.
    "spark.sql.shuffle.partitions": "32",
    # Keep scan partitions reasonable for small local files.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: default 10 MB is right for the dims here.
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    # Allow Python data sources (arrowipc) to receive pushed filters.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Runtime (bloom) filters: let a selective filter on one join side build
    # a bloom filter that prunes the other side's scan before the shuffle.
    # The application-side threshold defaults to 10 GB — sensible on a
    # cluster, but it would disable the rule at every test scale, so it is
    # zeroed: semi-join reduction is cheap insurance at any size.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # Parquet TIMESTAMP(NANOS) (events.ts) is otherwise an illegal type for
    # Spark's reader; read as long and convert in catalog.load_table — the
    # floor-to-µs conversion matches DuckDB's TIMESTAMP read (FIXTURES.md).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(app_name: str = "bossarrowstorageengine-spark",
                  master: str | None = None,
                  extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{default_parallelism()}]"
    builder = builder.master(master)
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session whose builder conf
    # was ignored — re-apply the runtime-mutable SQL confs so engine semantics
    # (UTC, AQE, Arrow) hold regardless of who created the session.
    for k, v in ENGINE_SQL_CONF.items():
        spark.conf.set(k, v)
    return spark


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-mutable SQL confs to an existing session.

    Used by the driver entry points, which receive a session we didn't build.
    """
    for k, v in ENGINE_SQL_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # non-mutable conf on this build — keep going
            pass
    return spark
