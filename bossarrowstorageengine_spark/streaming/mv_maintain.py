"""Streaming MATERIALIZED-VIEW maintainer — the streaming face of
``q_mv_maintain`` (SURVEY §7 round-13 runway item 1): a ``foreachBatch``
consumer tails the changefeed table through the arrowipc streaming
source and applies the feed's commits to a PERSISTED aggregate table,
writing ONE MV VERSION PER FEED COMMIT — the batch loops over the
distinct ``commit_seq`` values it received, so the MV's version history
mirrors the feed's commit history even when the source collapses
several pending commits into one micro-batch (the stream reader's
``latestOffset`` jumps to the newest manifest version) or the query is
restarted from a fresh checkpoint over a backlog.

State lives in the MV table itself, not executor memory: every version
is a row set stamped with ``(mv_version, src_commit)``, the head is the
max-version row set, and version k+1 = head + commit k+1's deltas (the
algebraic merge of ``q_incremental_agg`` — counts and sums add; the
source corpus is NEVER rescanned after the seed).

Idempotence keys on FEED POSITION, not the checkpoint: ``src_commit``
records the feed commit each version absorbed, so a redelivered or
re-observed commit (foreachBatch replay after a lost checkpoint commit,
or a fresh-checkpoint restart whose first batch spans the whole feed)
filters down to only the commits beyond the head's — no markers, no
dependence on Spark's checkpoint-scoped ``batch_id`` (which resets to 0
on a new checkpoint and would both skip new work and double-apply old
work if used as the ledger key).  The crash window between an MV append
and the checkpoint commit is covered by exactly this check, and tested
by applying the same commit twice.

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

#: Persisted MV row layout (the version ledger): ``src_commit`` is the
#: feed ``commit_seq`` the version absorbed (0 = the seed).
MV_SCHEMA = ("lang string, docs long, chars long, mv_version long, "
             "src_commit long")

#: Column set the maintainer reads back from the feed.
FEED_SCHEMA = ("lang string, change string, delta long, commit_seq long")


def seed_mv(mv_dir: str, base: DataFrame) -> None:
    """Publish MV version 1 — the base aggregate of the source's first
    snapshot, the one corpus-sized pass the maintainer ever needs.
    ``base`` must carry ``(lang, docs, chars)``; ``src_commit = 0``
    marks the seed as preceding every feed commit."""
    (base.select(
        "lang", F.col("docs").cast("long"), F.col("chars").cast("long"),
        F.lit(1).cast("long").alias("mv_version"),
        F.lit(0).cast("long").alias("src_commit"))
     .write.format("arrowipc").option("snapshots", "true")
     .option("compression", "lz4").mode("append").save(mv_dir))


def _mv_head(spark: SparkSession, mv_dir: str) -> tuple[DataFrame, int,
                                                        int]:
    """The MV's current head: ``(rows, head_version, thru_commit)``.
    Two cheap steps — a 2-column scan for the maxima (one driver-side
    row), then a pruned re-read of just the head version's rows — so the
    head read never scales with the version history."""
    versions = (spark.read.format("arrowipc").option("snapshots", "true")
                .option("columns", "mv_version,src_commit")
                .schema("mv_version long, src_commit long").load(mv_dir))
    head = versions.agg(F.max("mv_version").alias("v"),
                        F.max("src_commit").alias("c")).collect()[0]
    if head["v"] is None:
        raise ValueError(
            f"MV table {mv_dir!r} is empty — write version 1 with "
            "seed_mv(mv_dir, base_aggregate) before starting the "
            "maintainer (the seed is the only corpus-sized pass)")
    rows = (spark.read.format("arrowipc").option("snapshots", "true")
            .schema(MV_SCHEMA).load(mv_dir)
            .filter(F.col("mv_version") == int(head["v"])))
    return rows, int(head["v"]), int(head["c"])


def apply_feed_batch(batch_df: DataFrame, batch_id: int,
                     mv_dir: str) -> None:
    """Apply one feed micro-batch to the persisted MV: one new version
    per DISTINCT feed commit beyond the ledger's high-water commit.
    Replay-safe by feed position — commits the ledger has already
    absorbed are filtered out, whatever ``batch_id`` says (it is
    checkpoint-scoped and appears here only because foreachBatch
    supplies it)."""
    spark = batch_df.sparkSession
    if not os.path.isdir(mv_dir):
        raise ValueError(
            f"MV table {mv_dir!r} not seeded — write version 1 with "
            "seed_mv(mv_dir, base_aggregate) before starting the "
            "maintainer (the seed is the only corpus-sized pass)")
    if len(batch_df.take(1)) == 0:
        return  # empty micro-batch: no deltas, no version bump
    # Materialize the batch ONCE before the mixed filtered/unfiltered
    # action sequence below: Spark (≤4.1) caches a Python data source's
    # planned partition list on the shared relation and filter pushdown
    # OVERWRITES it (the hazard documented at arrowipc.pushFilters), so
    # reusing one frame for the distinct-commit scan AND the per-commit
    # filters could silently read a pruned file list.  The checkpoint
    # severs that relation; the batch is mutation-sized, and each commit
    # below re-reads it anyway, so this also avoids N re-scans.
    batch = batch_df.localCheckpoint()
    _, _, thru = _mv_head(spark, mv_dir)
    new_commits = sorted(
        int(r["commit_seq"])
        for r in batch.select("commit_seq").distinct().collect()
        if int(r["commit_seq"]) > thru)
    for seq in new_commits:
        head, head_ver, _ = _mv_head(spark, mv_dir)
        deltas = batch.filter(F.col("commit_seq") == seq).groupBy(
            "lang").agg(
            F.sum((F.col("change") == "insert").cast("long")
                  - (F.col("change") == "delete").cast("long"))
            .cast("long").alias("docs_delta"),
            F.sum("delta").cast("long").alias("chars_delta"))
        # full outer: an insert commit can introduce a lang the MV has
        # never seen; a lang absent from the commit keeps its state.
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
                F.lit(head_ver + 1).cast("long").alias("mv_version"),
                F.lit(seq).cast("long").alias("src_commit"),
            )
        )
        (new_state.write.format("arrowipc").option("snapshots", "true")
         .option("compression", "lz4").mode("append").save(mv_dir))


def mv_maintain_stream(spark: SparkSession, feed_dir: str, mv_dir: str,
                       checkpoint_dir: str, ignore_changes: bool = False):
    """Start the maintainer: tail ``feed_dir`` and roll ``mv_dir``
    forward one version per feed commit.  Returns the
    ``StreamingQuery``.

    ``ignore_changes=True`` lets the tail stream THROUGH feed
    maintenance commits (``compact_feed_thru`` checkpoints rewrite
    already-emitted commit partitions, so the stream source refuses
    them by default): the checkpoint's re-delivered rows carry their
    original ``commit_seq``, and the ledger's feed-position filter in
    ``apply_feed_batch`` makes already-absorbed commits a no-op.

    CONTRACT (the Kafka log-compaction rule): compaction may only cover
    commits this consumer has ALREADY absorbed (``thru`` <= the MV
    ledger's high-water).  The ledger dedupes re-delivery ACROSS
    batches, not within one: a consumer tailing from offset zero over a
    feed compacted mid-backlog receives a commit's original partition
    AND its checkpoint copy in the SAME micro-batch and would
    double-apply.  A fresh consumer over a compacted feed must
    therefore bootstrap with one BATCH apply of the feed's head read
    (each logical row exactly once by manifest construction — the
    fresh-checkpoint backlog pattern) rather than replaying the
    manifest log.  Consumers without a feed-position ledger must leave
    the default (fail loudly) and restart from a fresh checkpoint."""
    from bossarrowstorageengine_spark.sources import register_arrowipc

    register_arrowipc(spark)
    reader = (spark.readStream.format("arrowipc")
              .option("columns", "lang,change,delta,commit_seq")
              .schema(FEED_SCHEMA))
    if ignore_changes:
        reader = reader.option("ignoreChanges", "true")
    feed = reader.load(feed_dir)
    return (feed.writeStream
            .foreachBatch(lambda df, bid: apply_feed_batch(df, bid, mv_dir))
            .option("checkpointLocation", checkpoint_dir)
            .start())
