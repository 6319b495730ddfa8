"""Streaming EMBEDDING-DRIFT monitor — the streaming face of
``q_embedding_drift``: a ``foreachBatch`` consumer accumulates per-
(label, dim) centroid partials (``sum_x``, ``n`` — algebraic, so batches
merge exactly like the MV maintainer's counts) from each embedding
micro-batch, and ``drift_report`` compares the accumulated live centroid
against a persisted REFERENCE centroid table (yesterday's corpus), per
label: the L2 centroid shift that flags upstream distribution change
before it poisons training.

Idempotence is the vocab_refresh discipline: each batch's partials land
in their own ``batch=<id>`` overwrite partition, so a foreachBatch
redelivery replaces its own output instead of double-counting; a
``_batch-<id>.done`` marker is the cheap-replay fast path only.

Scale: the per-batch work is one batch-sized explode + keyed partial
aggregation whose output is (labels × dims) cells — constant-sized at
any corpus volume; the report merges cell partials (never re-reading
embeddings) and joins the reference table, both centroid-table-sized.

Float note (SURVEY §8 rule 1): double sums are association-order-
dependent, so the streamed centroid can differ from a single-pass batch
centroid in the last bits; the report rounds the shift to 4 decimals
exactly like the batch key, and the differential test asserts at 1e-6 —
the same doctrine the oracle gate applies to every double aggregate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.streaming.chunk_dedup import (
    _require_posix_dir,
)

#: Read-back schema of the persisted per-batch centroid partials.
STATS_SCHEMA = "label int, dim int, sum_x double, n long"


def centroid_partials(batch_df: DataFrame) -> DataFrame:
    """Per-(label, dim) centroid partials of one embedding micro-batch —
    the same explode + keyed aggregation the batch key runs, kept as
    partials so batches merge algebraically."""
    return (
        batch_df.select(
            "label", F.posexplode("embedding").alias("dim", "x"))
        .withColumn("x", F.col("x").cast("double"))
        .groupBy("label", "dim")
        .agg(F.sum("x").alias("sum_x"),
             F.count(F.lit(1)).cast("long").alias("n"))
    )


def seed_reference(ref_dir: str, reference_df: DataFrame) -> None:
    """Persist the reference corpus's centroid table (one corpus-sized
    pass over yesterday's data)."""
    (centroid_partials(reference_df)
     .write.mode("overwrite").parquet(ref_dir))


def apply_embedding_batch(batch_df: DataFrame, batch_id: int,
                          stats_dir: str) -> None:
    """Accumulate one micro-batch's centroid partials, replay-safe."""
    _require_posix_dir(stats_dir, "stats_dir")
    marker = os.path.join(stats_dir, f"_batch-{batch_id}.done")
    if os.path.exists(marker):
        return
    (centroid_partials(batch_df)
     .write.mode("overwrite")
     .parquet(os.path.join(stats_dir, f"batch={batch_id}")))
    with open(marker, "w") as f:
        f.write("done")


def drift_report(spark: SparkSession, stats_dir: str,
                 ref_dir: str) -> DataFrame:
    """Per-label drift of the ACCUMULATED live centroid vs the
    reference: ``(label, n_ref, n_live, centroid_shift)`` — the batch
    key's L2-shift formula over merged partials, embeddings never
    re-read."""
    live = (spark.read.schema(STATS_SCHEMA + ", batch long")
            .option("basePath", stats_dir).parquet(stats_dir)
            .groupBy("label", "dim")
            .agg(F.sum("sum_x").alias("sum_x"), F.sum("n").alias("n"))
            .select("label", "dim",
                    (F.col("sum_x") / F.col("n")).alias("m1"),
                    F.col("n").alias("n1")))
    ref = (spark.read.schema(STATS_SCHEMA).parquet(ref_dir)
           .select("label", "dim",
                   (F.col("sum_x") / F.col("n")).alias("m0"),
                   F.col("n").alias("n0")))
    return (
        ref.join(live, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.max("n0").cast("long").alias("n_ref"),
            F.max("n1").cast("long").alias("n_live"),
            F.round(F.sqrt(F.sum(
                (F.col("m0") - F.col("m1"))
                * (F.col("m0") - F.col("m1")))), 4)
            .alias("centroid_shift"),
        )
    )


def drift_monitor_stream(spark: SparkSession, emb_dir: str,
                         stats_dir: str, checkpoint_dir: str):
    """Start the monitor: tail the arrowipc embedding table at
    ``emb_dir`` and accumulate centroid partials.  Returns the
    ``StreamingQuery``."""
    from bossarrowstorageengine_spark.sources import register_arrowipc

    register_arrowipc(spark)
    emb = (spark.readStream.format("arrowipc")
           .option("columns", "label,embedding")
           .schema("label int, embedding array<float>").load(emb_dir))
    return (emb.writeStream
            .foreachBatch(lambda df, bid: apply_embedding_batch(
                df, bid, stats_dir))
            .option("checkpointLocation", checkpoint_dir)
            .start())
