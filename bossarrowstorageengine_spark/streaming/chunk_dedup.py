"""Streaming face of content-defined-chunking dedup (SURVEY §7 r10 item
3): each micro-batch of ``(doc_id, text)`` documents is CDC-chunked with
the SAME array-side core the batch key uses
(``operators.llm_pipeline._cdc_chunks`` — rolling-md5 3-gram boundaries),
probed against a PERSISTENT chunk-hash index, and reported per document;
only previously-unseen hashes join the index.  This is the
``q_dedup_incremental`` shape applied to the chunk grain: the new batch
probes the index, never batch x batch, never a corpus rescan.

Idempotence: a replayed micro-batch (foreachBatch redelivery after a
failure) must reproduce EXACTLY the original report and index state.
Two mechanisms compose:

- every per-batch write goes to its own ``batch=<id>`` partition
  directory with overwrite semantics, so a re-run replaces its own
  output instead of appending a second copy;
- the probe EXCLUDES index rows written by the current batch id, so a
  re-run that crashed after its index write still classifies its chunks
  against the same pre-batch state the first attempt saw (without this,
  the replay would find its own hashes and mark everything a dup).

A ``_batch-<id>.done`` marker makes the common replay a cheap no-op;
correctness never depends on it.  The index tolerates the same hash
appearing under several batch ids (concurrent writers on disjoint
batches): the probe reads distinct hashes.

Scale: the index is one hash-keyed parquet table (bucketable on
chunk_hash at 100 TB so the probe is a co-located join); the per-batch
work is chunking (map-side HOFs) + one probe join against the distinct
index hashes + one overwrite of the batch's new-hash partition.  State
lives in storage, not executor memory, so the stream restarts cheaply.
CONTRACT: ``index_dir``/``report_dir`` must be driver-visible POSIX
paths (URI schemes are rejected) — the existence probes and the marker
write use local filesystem calls, which silently see nothing on
``s3://``/``hdfs://`` URIs.
The batch face of this report is oracle-gated as
``q_dedup_chunk_incremental``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.operators.llm_pipeline import (
    _CDC_MIN_TOKENS,
    _cdc_chunks,
)

#: chunks below this token count are ignored — shared with the batch
#: faces (q_dedup_chunk_cdc / q_dedup_chunk_incremental) so the oracle
#: gate and the stream can never silently disagree on the floor.
MIN_TOKENS = _CDC_MIN_TOKENS


def _require_posix_dir(path: str, what: str) -> str:
    """Index/report/marker state is probed and written with driver-local
    filesystem calls (``os.path``, ``open``), so the contract is that
    these directories live on a driver-visible POSIX filesystem.  A URI
    scheme (``s3://``, ``hdfs://``) would make ``os.path.isdir`` silently
    return ``False`` — every batch would treat the index as absent and
    report all chunks unseen — so reject schemes loudly up front instead
    of mis-deduplicating first and crashing on the marker write later."""
    if "://" in path:
        raise ValueError(
            f"{what} must be a driver-visible POSIX path, got URI "
            f"{path!r}; chunk-dedup state probing uses local filesystem "
            "calls (mount object stores, or port the probes to the "
            "Hadoop FileSystem API before pointing this at one)")
    return path


def _index_has_data(data_dir: str) -> bool:
    """True only when the index holds at least one COMMITTED parquet part
    file.  A bare ``isdir`` probe is wrong after a crash that created
    ``data_dir`` (e.g. only a ``_temporary`` dir survives): the read
    would then fail schema inference on every subsequent batch until
    manual cleanup.  Spark's file listing skips ``_``/``.``-prefixed
    paths, so committed ``part-*`` files are the exact signal it needs."""
    if not os.path.isdir(data_dir):
        return False
    for part in os.listdir(data_dir):
        pdir = os.path.join(data_dir, part)
        if not part.startswith("batch=") or not os.path.isdir(pdir):
            continue
        for name in os.listdir(pdir):
            if name.startswith("part-") and not name.endswith(".crc"):
                return True
    return False


def chunk_dedup_batch(batch_df: DataFrame, batch_id: int,
                      index_dir: str, report_dir: str) -> None:
    """Process ONE micro-batch: chunk, probe, report, commit new hashes.
    Exposed separately from the stream wrapper so tests can drive exact
    batch boundaries and replay semantics directly."""
    spark = batch_df.sparkSession
    _require_posix_dir(index_dir, "index_dir")
    _require_posix_dir(report_dir, "report_dir")
    marker = os.path.join(index_dir, f"_batch-{batch_id}.done")
    if os.path.exists(marker):
        return  # replayed batch — already committed (fast path)

    chunks = (_cdc_chunks(batch_df)
              .filter(F.col("n_tokens") >= MIN_TOKENS)
              .localCheckpoint())  # chunk once; probe + report + append reuse
    data_dir = os.path.join(index_dir, "data")
    # Committed-file probe, not try/except: probing a not-yet-born index
    # with spark.read logs a full FileNotFoundException stack per batch,
    # and a bare isdir would trust a crash-orphaned empty directory.
    have_index = _index_has_data(data_dir)
    index = None
    if have_index:
        # Partition column ``batch`` comes from the batch=<id> dirs.
        # Exclude the current batch id (replay safety — see module doc)
        # and collapse to DISTINCT hashes (the same hash may be recorded
        # by several concurrent writers; a plain join would multiply
        # probe rows and inflate every count).
        index = (spark.read.parquet(data_dir)
                 .filter(F.col("batch") != F.lit(batch_id))
                 .select("chunk_hash").distinct())

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
    # Per-batch partition dirs with overwrite: a replay REPLACES its own
    # output (identical content, since the probe excluded this batch's
    # index rows) instead of appending a conflicting second copy.
    report.write.mode("overwrite").parquet(
        os.path.join(report_dir, f"batch={batch_id}"))

    new_hashes = (
        marked.filter(~F.coalesce(F.col("known"), F.lit(False))
                      & (F.col("occ") == 1))
        .select("chunk_hash")
    )
    new_hashes.write.mode("overwrite").parquet(
        os.path.join(data_dir, f"batch={batch_id}"))

    # Fast-path marker only — replay correctness holds without it.
    with open(marker, "w") as f:
        f.write("done")


def stream_chunk_dedup(docs: DataFrame, index_dir: str, report_dir: str,
                       checkpoint_dir: str):
    """Wire :func:`chunk_dedup_batch` into ``foreachBatch`` — returns the
    StreamingQuery handle."""
    _require_posix_dir(index_dir, "index_dir")
    _require_posix_dir(report_dir, "report_dir")
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
