"""Incremental VOCAB REFRESH stream — the streaming face of the unigram
trainer family (SURVEY §7 round-13 runway item 4): a ``foreachBatch``
consumer tokenizes each micro-batch of documents with the SAME word
discipline the batch trainers use (space split, ``0 < len <
_UNI_MAX_WORD``), accumulates the weighted word counts into a PERSISTED
count table, and every ``refresh_every`` applied batches re-runs the
trainers' seed-score step (``operators.curation._unigram_scored`` — the
single shared definition: candidate substrings → coverage chars + top-K
multis → micro-nat log probs) over the UPDATED counts, publishing one
immutable vocab version per refresh.  ``vocab_drift`` reports pieces
entering/leaving the top set between consecutive refreshes — the signal
a tokenizer-maintenance pipeline watches to decide when downstream
models need re-tokenized data.

Idempotence (the chunk_dedup discipline): every per-batch write goes to
its own ``batch=<id>`` partition directory with OVERWRITE semantics, so
a foreachBatch redelivery replaces its own output instead of
double-counting; a refresh is keyed by the TRIGGERING batch id (stable
under replay) and overwrites its own ``refresh=<id>`` directory with a
deterministic recomputation.  A ``_batch-<id>.done`` marker makes the
common replay a cheap no-op; correctness never depends on it.

Scale: the per-batch work is one batch-sized tokenize + groupBy (Zipf-
bounded output) and one small partition write; a refresh aggregates the
word table (Zipf-bounded at any corpus size — the ``q_bpe_train`` trick)
and re-runs the seed-score step, never rescanning documents; the corpus
itself is touched exactly once, as it streams through.  State lives in
storage, not executor memory, so the stream restarts cheaply.
CONTRACT: ``words_dir``/``vocab_dir`` must be driver-visible POSIX paths
(the existence probes and marker writes use local filesystem calls).

The batch face is oracle-gated: ``q_unigram_train``'s (piece, freq,
logp_micro) columns ARE this stream's refreshed vocab on the same
corpus — the pytest differential pins the final refresh to that key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.operators.curation import (
    _UNI_MAX_WORD,
    _unigram_scored,
)
from bossarrowstorageengine_spark.streaming.chunk_dedup import (
    _require_posix_dir,
)

#: Read-back schema of the persisted weighted word-count deltas.
WORDS_SCHEMA = "w string, c long"

#: Read-back schema of one persisted vocab version.
VOCAB_SCHEMA = "piece string, freq long, logp_micro long, refresh_id long"


def _batch_word_counts(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's weighted word counts — the same tokenize the
    batch trainers' ``_unigram_words`` applies, minus the corpus scan."""
    return (
        batch_df.select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.length("w") > 0) & (F.length("w") < _UNI_MAX_WORD))
        .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _applied_batches(words_dir: str) -> list[int]:
    """Batch ids with a published count partition (directory listing —
    O(batches), no data read)."""
    if not os.path.isdir(words_dir):
        return []
    out = []
    for name in os.listdir(words_dir):
        if name.startswith("batch="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def accumulated_words(spark: SparkSession, words_dir: str) -> DataFrame:
    """The union corpus's weighted word table: per-batch deltas summed.
    Zipf-bounded — this never scales with document volume."""
    return (spark.read.schema(WORDS_SCHEMA + ", batch long")
            .option("basePath", words_dir).parquet(words_dir)
            .groupBy("w").agg(F.sum("c").cast("long").alias("c")))


def apply_doc_batch(batch_df: DataFrame, batch_id: int, words_dir: str,
                    vocab_dir: str, refresh_every: int = 2) -> None:
    """Apply one document micro-batch: publish its word-count delta,
    then refresh the vocab when this batch completes a
    ``refresh_every``-sized stride of applied batches."""
    _require_posix_dir(words_dir, "words_dir")
    _require_posix_dir(vocab_dir, "vocab_dir")
    if refresh_every < 1:
        raise ValueError(f"refresh_every must be >= 1, got {refresh_every}")
    spark = batch_df.sparkSession
    marker = os.path.join(words_dir, f"_batch-{batch_id}.done")
    if os.path.exists(marker):
        return  # clean replay: delta + any refresh already published
    (_batch_word_counts(batch_df)
     .write.mode("overwrite")
     .parquet(os.path.join(words_dir, f"batch={batch_id}")))

    if len(_applied_batches(words_dir)) % refresh_every == 0:
        # Refresh keyed by the TRIGGERING batch id: a replayed trigger
        # recomputes the identical vocab (the seed-score step is
        # deterministic — total order with a unique tiebreak) and
        # overwrites its own directory.
        scored = _unigram_scored(accumulated_words(spark, words_dir))
        (scored.withColumn("refresh_id", F.lit(batch_id).cast("long"))
         .write.mode("overwrite")
         .parquet(os.path.join(vocab_dir, f"refresh={batch_id}")))

    with open(marker, "w") as f:
        f.write("done")


def read_vocab(spark: SparkSession, vocab_dir: str,
               refresh_id: int | None = None) -> DataFrame:
    """One persisted vocab version (default: the newest refresh)."""
    v = (spark.read.schema(VOCAB_SCHEMA)
         .option("basePath", vocab_dir).parquet(vocab_dir))
    if refresh_id is None:
        ids = _refresh_ids(vocab_dir)
        if not ids:
            raise ValueError(f"no vocab refresh published under {vocab_dir}")
        refresh_id = ids[-1]
    return v.filter(F.col("refresh_id") == refresh_id).drop("refresh_id")


def _refresh_ids(vocab_dir: str) -> list[int]:
    if not os.path.isdir(vocab_dir):
        return []
    return sorted(int(n.split("=", 1)[1]) for n in os.listdir(vocab_dir)
                  if n.startswith("refresh="))


def vocab_drift(spark: SparkSession, vocab_dir: str) -> DataFrame:
    """Per-refresh drift vs the PREVIOUS refresh: pieces entering /
    leaving / kept in the top set.  The single-partition lag window runs
    over the refresh-id list only (a handful of rows — never the vocab
    itself); the piece-level diff is one vocab×vocab full-outer join per
    adjacent pair, all in one plan."""
    v = (spark.read.schema(VOCAB_SCHEMA)
         .option("basePath", vocab_dir).parquet(vocab_dir))
    ids = (v.select("refresh_id").distinct()
           .withColumn("prev_id",
                       F.lag("refresh_id").over(Window.orderBy("refresh_id")))
           .filter(F.col("prev_id").isNotNull()))
    # Both sides of each adjacent pair labeled with the SUCCESSOR's id,
    # so entering AND leaving pieces attribute to the refresh that
    # caused them (a leaving piece has no row in the successor's vocab).
    cur = (v.join(F.broadcast(ids), "refresh_id")
           .select("refresh_id", "piece", F.lit(1).alias("_in_cur")))
    prev = (v.join(F.broadcast(ids.select(F.col("refresh_id").alias("_rid"),
                                          F.col("prev_id"))),
                   v["refresh_id"] == F.col("prev_id"))
            .select(F.col("_rid").alias("refresh_id"), "piece",
                    F.lit(1).alias("_in_prev")))
    return (
        cur.join(prev, ["refresh_id", "piece"], "full_outer")
        .groupBy("refresh_id")
        .agg(
            F.sum(F.when(F.col("_in_cur").isNotNull()
                         & F.col("_in_prev").isNull(), 1).otherwise(0))
            .cast("long").alias("n_entering"),
            F.sum(F.when(F.col("_in_prev").isNotNull()
                         & F.col("_in_cur").isNull(), 1).otherwise(0))
            .cast("long").alias("n_leaving"),
            F.sum(F.when(F.col("_in_cur").isNotNull()
                         & F.col("_in_prev").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_kept"),
        )
    )


def vocab_refresh_stream(spark: SparkSession, docs_dir: str,
                         words_dir: str, vocab_dir: str,
                         checkpoint_dir: str, refresh_every: int = 2):
    """Start the refresher: tail the arrowipc document table at
    ``docs_dir`` and maintain the count table + vocab versions.
    Returns the ``StreamingQuery``."""
    from bossarrowstorageengine_spark.sources import register_arrowipc

    register_arrowipc(spark)
    docs = (spark.readStream.format("arrowipc")
            .option("columns", "text").schema("text string").load(docs_dir))
    return (docs.writeStream
            .foreachBatch(lambda df, bid: apply_doc_batch(
                df, bid, words_dir, vocab_dir, refresh_every))
            .option("checkpointLocation", checkpoint_dir)
            .start())
