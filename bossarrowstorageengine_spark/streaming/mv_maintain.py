"""Streaming MATERIALIZED-VIEW maintainer — the streaming face of
``q_mv_maintain`` (SURVEY §7 round-13 runway item 1): a ``foreachBatch``
consumer tails the changefeed table through the arrowipc streaming
source (manifest-version offsets — one micro-batch per feed commit) and
applies each commit's per-lang deltas to a PERSISTED aggregate table,
writing one MV version per micro-batch, so the MV's version history
mirrors the feed's commit history in real time.

State lives in the MV table itself, not executor memory: every version
is a row set stamped with ``(mv_version, src_batch)``, the head is the
max-version row set, and a new version = head + the batch's deltas (the
algebraic merge of ``q_incremental_agg`` — counts and sums add; the
source corpus is NEVER rescanned after the seed).

Idempotence: foreachBatch redelivers a batch whose checkpoint commit was
lost.  The MV table records provenance — each version carries the batch
id that produced it — so a replayed batch whose ``src_batch`` is already
at or behind the head is a no-op, WITHOUT markers: the state table
itself is the ledger (contrast ``streaming.chunk_dedup``, whose marker
is a fast path over the same principle).  The crash window between the
MV append and the checkpoint commit is covered by exactly this check,
and tested by applying the same batch twice.

Scale: each refresh reads one mutation-sized feed commit plus the
group-cardinality-sized MV head, and writes one group-cardinality-sized
version — O(|delta| + |MV|) per commit at any corpus size.  The batch
face (``q_mv_maintain``) is oracle-gated; the stream is pinned to it by
a pytest differential (streamed MV versions == the batch key's rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Persisted MV row layout (the version ledger).
MV_SCHEMA = ("lang string, docs long, chars long, mv_version long, "
             "src_batch long")

#: Column set the maintainer reads back from the feed.
FEED_SCHEMA = ("lang string, change string, delta long, commit_seq long")


def seed_mv(spark: SparkSession, mv_dir: str, base: DataFrame) -> None:
    """Publish MV version 1 — the base aggregate of the source's first
    snapshot, the one corpus-sized pass the maintainer ever needs.
    ``base`` must carry ``(lang, docs, chars)``; ``src_batch = -1``
    marks the seed as preceding every stream batch."""
    (base.select(
        "lang", F.col("docs").cast("long"), F.col("chars").cast("long"),
        F.lit(1).cast("long").alias("mv_version"),
        F.lit(-1).cast("long").alias("src_batch"))
     .write.format("arrowipc").option("snapshots", "true")
     .option("compression", "lz4").mode("append").save(mv_dir))


def _mv_head(spark: SparkSession, mv_dir: str) -> DataFrame:
    """The MV's current head: the max-``mv_version`` row set.  Two cheap
    steps — a 2-column scan for the max (one driver-side scalar), then a
    pruned re-read of just that version's rows — so the head read never
    scales with the version history."""
    versions = (spark.read.format("arrowipc").option("snapshots", "true")
                .option("columns", "mv_version,src_batch")
                .schema("mv_version long, src_batch long").load(mv_dir))
    head = versions.agg(F.max("mv_version").alias("v"),
                        F.max("src_batch").alias("b")).collect()[0]
    rows = (spark.read.format("arrowipc").option("snapshots", "true")
            .schema(MV_SCHEMA).load(mv_dir)
            .filter(F.col("mv_version") == int(head["v"])))
    return rows.withColumn("_head_batch", F.lit(int(head["b"])).cast("long"))


def apply_feed_batch(batch_df: DataFrame, batch_id: int,
                     mv_dir: str) -> None:
    """Apply one feed micro-batch to the persisted MV: head + the
    batch's per-lang deltas → version head+1.  Replay-safe: a batch id
    the ledger has already absorbed is a no-op."""
    spark = batch_df.sparkSession
    if not os.path.isdir(mv_dir):
        raise ValueError(
            f"MV table {mv_dir!r} not seeded — write version 1 with "
            "seed_mv(spark, mv_dir, base_aggregate) before starting "
            "the maintainer (the seed is the only corpus-sized pass)")
    if len(batch_df.take(1)) == 0:
        return  # empty micro-batch: no deltas, no version bump
    head = _mv_head(spark, mv_dir)
    first = head.select("mv_version", "_head_batch").take(1)[0]
    if int(first["_head_batch"]) >= batch_id:
        return  # redelivered batch: its version is already the ledger's
    deltas = batch_df.groupBy("lang").agg(
        F.sum((F.col("change") == "insert").cast("long")
              - (F.col("change") == "delete").cast("long"))
        .cast("long").alias("docs_delta"),
        F.sum("delta").cast("long").alias("chars_delta"))
    # full outer: an insert commit can introduce a lang the MV has
    # never seen; a lang absent from the batch keeps its state.
    new_state = (
        head.select("lang", "docs", "chars")
        .join(deltas, "lang", "full_outer")
        .select(
            "lang",
            (F.coalesce("docs", F.lit(0))
             + F.coalesce("docs_delta", F.lit(0)))
            .cast("long").alias("docs"),
            (F.coalesce("chars", F.lit(0))
             + F.coalesce("chars_delta", F.lit(0)))
            .cast("long").alias("chars"),
            (F.lit(int(first["mv_version"]) + 1)).cast("long")
            .alias("mv_version"),
            F.lit(batch_id).cast("long").alias("src_batch"),
        )
    )
    (new_state.write.format("arrowipc").option("snapshots", "true")
     .option("compression", "lz4").mode("append").save(mv_dir))


def mv_maintain_stream(spark: SparkSession, feed_dir: str, mv_dir: str,
                       checkpoint_dir: str):
    """Start the maintainer: tail ``feed_dir`` (one micro-batch per feed
    commit via manifest-version offsets) and roll ``mv_dir`` forward one
    version per batch.  Returns the ``StreamingQuery``."""
    from bossarrowstorageengine_spark.sources import register_arrowipc

    register_arrowipc(spark)
    feed = (spark.readStream.format("arrowipc")
            .option("columns", "lang,change,delta,commit_seq")
            .schema(FEED_SCHEMA).load(feed_dir))
    return (feed.writeStream
            .foreachBatch(lambda df, bid: apply_feed_batch(df, bid, mv_dir))
            .option("checkpointLocation", checkpoint_dir)
            .start())
