"""Streaming face of content-defined-chunking dedup (SURVEY §7 r10 item
3): each micro-batch of ``(doc_id, text)`` documents is CDC-chunked with
the SAME array-side core the batch key uses
(``operators.llm_pipeline._cdc_chunks`` — rolling-md5 3-gram boundaries),
probed against a PERSISTENT chunk-hash index, and reported per document;
only previously-unseen hashes append to the index.  This is the
``q_dedup_incremental`` shape applied to the chunk grain: the new batch
probes the index, never batch x batch, never a corpus rescan.

Idempotence: a replayed micro-batch (foreachBatch redelivery after a
failure) must not double-append hashes or double-count reports — each
batch commits a ``_batch-<id>.done`` marker in the index directory and a
replay of a marked batch is a no-op, the same high-water-mark discipline
as the partitioned arrowipc sink.

Scale: the index is one hash-keyed parquet table (bucketable on
chunk_hash at 100 TB so the probe is a co-located join); the per-batch
work is chunking (map-side HOFs) + one semi-join against the index +
one append of the batch's distinct new hashes.  State lives in storage,
not executor memory, so the stream restarts cheaply and the index is
shared by any number of writers processing disjoint batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.operators.llm_pipeline import _cdc_chunks

#: chunks below this token count are ignored (the batch key's floor).
MIN_TOKENS = 5


def chunk_dedup_batch(batch_df: DataFrame, batch_id: int,
                      index_dir: str, report_dir: str) -> None:
    """Process ONE micro-batch: chunk, probe, report, append new hashes.
    Exposed separately from the stream wrapper so tests can drive exact
    batch boundaries and replay semantics directly."""
    spark = batch_df.sparkSession
    marker = os.path.join(index_dir, f"_batch-{batch_id}.done")
    if os.path.exists(marker):
        return  # replayed batch — already committed

    chunks = (_cdc_chunks(batch_df)
              .filter(F.col("n_tokens") >= MIN_TOKENS)
              .localCheckpoint())  # chunk once; probe + report + append reuse
    data_dir = os.path.join(index_dir, "data")
    # isdir check, not try/except: probing a not-yet-born index with
    # spark.read logs a full FileNotFoundException stack per batch.
    have_index = os.path.isdir(data_dir)
    index = (spark.read.parquet(data_dir).select("chunk_hash")
             if have_index else None)

    # A chunk occurrence is a DUP if its hash is already in the index OR
    # an earlier occurrence exists in this batch (earlier = lower
    # (doc_id, chunk_id) — deterministic within the batch).
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_id")
    marked = chunks.withColumn("occ", F.row_number().over(w))
    if have_index:
        known = index.withColumn("known", F.lit(True))
        marked = marked.join(known, "chunk_hash", "left")
    else:
        marked = marked.withColumn("known", F.lit(None).cast("boolean"))
    is_dup = F.coalesce(F.col("known"), F.lit(False)) | (F.col("occ") > 1)
    report = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(is_dup.cast("long")).cast("long").alias("n_dup_chunks"),
            F.sum(F.when(is_dup, F.col("n_tokens")).otherwise(0))
            .cast("long").alias("dup_tokens"),
        )
        .withColumn("batch_id", F.lit(batch_id).cast("long"))
    )
    os.makedirs(report_dir, exist_ok=True)
    report.write.mode("append").parquet(report_dir)

    new_hashes = (
        marked.filter(~F.coalesce(F.col("known"), F.lit(False))
                      & (F.col("occ") == 1))
        .select("chunk_hash")
    )
    new_hashes.write.mode("append").parquet(data_dir)

    # Commit point: report + index rows are in place; the marker makes a
    # redelivered batch a no-op.  (Crash between the writes above and
    # this marker -> the replay re-appends; the index tolerates duplicate
    # hashes because every probe is a semi-join/EXISTS, and the report
    # dedupes on (batch_id, doc_id) at read time if exactly-once matters.)
    with open(marker, "w") as f:
        f.write("done")


def stream_chunk_dedup(docs: DataFrame, index_dir: str, report_dir: str,
                       checkpoint_dir: str):
    """Wire :func:`chunk_dedup_batch` into ``foreachBatch`` — returns the
    StreamingQuery handle."""
    os.makedirs(index_dir, exist_ok=True)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        chunk_dedup_batch(batch_df, batch_id, index_dir, report_dir)

    return (
        docs.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
