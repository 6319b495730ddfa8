"""Plan-shaping helpers: broadcast sizing, skew-salted joins, and the conf
profile that adapts the engine from local[32] tests to a 1000-executor
cluster (SURVEY.md §4; the declared query surface uses these patterns
inline — this module packages them as reusable operators).

Partitioning strategy summary (per operator family, 100 TB design point):

- **Scans**: parquet/arrowipc splits sized by ``files.maxPartitionBytes``;
  stats (parquet row-group / arrowipc sidecar) prune before tasks launch.
- **Dim joins**: broadcast (region/nation/customer/supplier/part all fit;
  at 100 TB, customer may not — it falls back to shuffle and AQE decides).
- **Fact⋈fact**: shuffle on join key; AQE skew-split handles hot keys; for
  repeated co-located joins, bucket both tables on the key at write time.
- **Aggregations**: partial→final; low-cardinality keys are safe at any
  scale, high-cardinality distincts prefer approx sketches (HLL).
- **Windows**: shuffle once per partition key; never a global window
  without a partition key (top-k uses TakeOrderedAndProject instead).
- **Streams**: state keyed by (window, key) and bounded by watermarks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default broadcast ceiling (bytes) — matches the session conf.
BROADCAST_CEILING = 10 * 1024 * 1024


def broadcast_if_small(df: DataFrame, est_rows: int | None = None,
                       row_bytes: int = 64) -> DataFrame:
    """Broadcast hint when the estimated payload fits the ceiling; otherwise
    return the frame unhinted and let AQE decide at runtime.

    Size the estimate by key+payload width, not row count alone — a 1 M-row
    narrow dim (64 B) is a fine broadcast at 64 MB on a big cluster, a
    wide one is not.
    """
    if est_rows is None:
        return F.broadcast(df)  # caller asserts smallness
    if est_rows * row_bytes <= BROADCAST_CEILING:
        return F.broadcast(df)
    return df


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-salted equi-join: replicate the (small) right side ``n_salts``×
    and scatter the left side's hot keys across salt buckets.

    Use when ONE side is skewed and AQE's skew splitting isn't available
    (e.g. a non-AQE deployment) or insufficient (single pathological key).
    The left rows are salted with a deterministic hash of their whole row
    (pmod of xxhash64), so results are reproducible.

    Cost model: right side grows ``n_salts``×; the hot key's left rows
    spread over ``n_salts`` tasks.  Prefer AQE skew-join first; this is the
    explicit fallback.
    """
    salt = F.pmod(F.xxhash64(*left.columns), F.lit(n_salts)).alias("_salt")
    salted_left = left.withColumn("_salt", salt)
    salts = salted_left.sparkSession.range(n_salts) \
        .select(F.col("id").cast("long").alias("_salt"))
    salted_right = right.crossJoin(F.broadcast(salts))
    joined = salted_left.join(salted_right, [key, "_salt"], how)
    return joined.drop("_salt")


def fan_out(df: DataFrame, key: str | None = None) -> DataFrame:
    """Widen a narrow scan so CPU-heavy map work (shingling, hashing,
    vector math) uses every core.

    Parquet/arrowipc splits are bounded below by the row group — a table
    written as ONE row group scans as ONE task no matter the cluster size
    (the sf0.1 corpus is exactly that shape).  When the scan's planned
    parallelism is already ≥ the session's default parallelism (the normal
    case at 100 TB: thousands of row groups), this is the identity — no
    shuffle is ever added to a well-split input.  Otherwise repartition by
    ``key`` (or round-robin) up to the core count; the one-time shuffle of
    a small input buys map-side parallelism for everything downstream.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # plan not RDD-convertible (e.g. streaming) — skip
        return df
    if current >= target:
        return df
    return df.repartition(target, key) if key else df.repartition(target)


def scale_conf(target: str = "local") -> dict[str, str]:
    """Conf profile per deployment size.  The *same* query code runs under
    either profile — only shuffle width, partition bytes, and broadcast
    ceiling move."""
    if target == "local":
        return {
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.files.maxPartitionBytes": "134217728",
            "spark.sql.autoBroadcastJoinThreshold": str(BROADCAST_CEILING),
        }
    if target == "cluster-100tb":
        return {
            # ~2× total cores so AQE can coalesce down, never up.
            "spark.sql.shuffle.partitions": "8000",
            # bigger splits: fewer tasks against object storage
            "spark.sql.files.maxPartitionBytes": "268435456",
            # broadcast generously on big executors
            "spark.sql.autoBroadcastJoinThreshold": "104857600",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "134217728",
        }
    raise ValueError(f"unknown target {target!r}")
