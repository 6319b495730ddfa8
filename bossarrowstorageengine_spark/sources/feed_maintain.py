"""Changefeed CHECKPOINT COMPACTION for the ``arrowipc`` feed layout.

A CDC feed accumulates one small ``commit_seq=k`` partition per source
commit (each holding a mutation-sized handful of part files).  A consumer
catching up from scratch then pays one directory + a few tiny file reads
PER COMMIT — at 100 TB with thousands of commits the listing and per-file
task overhead dominate the actual change volume.  ``compact_feed_thru``
rewrites every commit partition up to ``thru`` into ONE checkpoint file
set (the Debezium/Kafka-compacted-topic "snapshot + tail" idiom applied
to a table-formatted feed):

- the checkpoint parts land under ``compacted_thru=<thru>/`` and keep
  ``commit_seq`` as an ordinary DATA column (the writer always stores
  partition columns physically, so nothing is lost by collapsing the
  directory level) — consumers keep filtering ``commit_seq`` exactly as
  before, the pruning just moves from directory level to file stats;
- the rewrite is sorted by ``commit_seq`` so each checkpoint file's
  min/max stats record the contiguous commit range it covers — a reader
  pruning to commits beyond ``thru`` still skips the checkpoint at plan
  time;
- commits beyond ``thru`` are untouched (compaction runs behind the feed
  head while producers keep appending);
- the swap is a LOGICAL manifest commit (add checkpoints, remove the
  rewritten parts) — readers flip atomically, pre-compaction versions
  stay time-travelable until vacuum, and a concurrent producer append
  survives via the manifest CAS retry loop.

A later compaction with a larger ``thru`` re-absorbs earlier checkpoints
(a ``compacted_thru=N`` set is in scope whenever ``N <= thru``), so the
feed converges to one checkpoint plus a short tail no matter how often
maintenance runs.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

from bossarrowstorageengine_spark.sources.arrowipc import (
    ConcurrentWriteConflict,
    _manifest_versions,
    _read_manifest,
    _write_manifest,
    register_arrowipc,
    stats_path,
)
from bossarrowstorageengine_spark.sources.maintenance import (
    _staged_rows,
    _walk_staged_parts,
)


def _scope_key(path: str, part_file: str) -> int | None:
    """The feed position a part file covers: ``k`` for a file under a
    ``commit_seq=k`` directory, ``n`` for one under ``compacted_thru=n``
    (an earlier checkpoint covers commits 1..n), else ``None`` (not a
    feed-positioned file — never compacted by this routine)."""
    rel = os.path.relpath(os.path.dirname(part_file), path)
    if rel in (".", ""):
        return None
    for seg in rel.split(os.sep):
        for col in ("commit_seq", "compacted_thru"):
            if seg.startswith(col + "="):
                try:
                    return int(seg.split("=", 1)[1])
                except ValueError:
                    return None
    return None


def compact_feed_thru(
    spark: SparkSession,
    path: str,
    thru: int,
    compression: str = "zstd",
    target_files: int = 1,
    schema=None,
) -> dict:
    """Collapse the feed's commit partitions ``1..thru`` (and any earlier
    checkpoints they subsume) into one checkpoint part set under
    ``compacted_thru=<thru>/``.  ``target_files`` bounds the rewrite
    width: at test scale one file is right, but a checkpoint of
    thousands of commits on a real feed wants several — the range
    repartition keeps each output file a CONTIGUOUS ``commit_seq``
    span, so per-file min/max stats still prune commit-range reads.

    ``schema`` (r17, VERDICT r16 item 3): the feed's FULL on-disk row
    schema (DDL string or StructType), when the caller knows it — the
    rewrite's internal read then skips the Python-datasource
    schema-inference plan-worker round trip (~0.2 s of fixed floor per
    call, guide §1.2).  Partition columns (``commit_seq``) are stored
    physically by the writer, so the written frame's schema IS the read
    schema; a type mismatch fails the read loudly via
    ``_validate_declared_schema``.  ``None`` keeps inference (callers
    compacting a feed of unknown layout).

    Returns ``{"files_before", "files_after", "compacted", "rows",
    "version", "thru"}``; no-op (no manifest commit) when nothing is in
    scope."""
    register_arrowipc(spark)
    versions = _manifest_versions(path)
    if not versions:
        raise ValueError(
            f"{path!r} is not a snapshotted feed — checkpoint compaction "
            "needs the manifest log to swap readers atomically and keep "
            "history; write the feed with option('snapshots', 'true')")
    before = _read_manifest(path, versions[-1])
    scope = {f: _scope_key(path, f) for f in before}
    in_scope = sorted(f for f, k in scope.items()
                      if k is not None and k <= thru)
    if not in_scope:
        return {"files_before": len(before), "files_after": len(before),
                "compacted": 0, "rows": 0, "version": versions[-1],
                "thru": thru}

    # Pin the input to the snapshot (same discipline as compact_arrowipc):
    # hard-link exactly the in-scope set into a hidden source dir and scan
    # THAT, so a concurrent producer commit landing mid-compaction is
    # neither rewritten nor removed.
    snapshot = os.path.join(path, f".feedcompact-src-{uuid.uuid4().hex}")
    staging = os.path.join(path, f".feedcompact-{uuid.uuid4().hex}")
    os.makedirs(snapshot, exist_ok=True)
    try:
        for old in in_scope:
            for src in (old, stats_path(old)):
                if not os.path.exists(src):
                    continue
                dst = os.path.join(snapshot, os.path.relpath(src, path))
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)

        # Checkpoint files range-keyed and sorted by feed position, so
        # each file's min/max stats record the exact commit span it
        # covers (readers pruning past `thru` skip them at plan time).
        # commit_seq rides along as a data column — it was stored
        # physically by the partitioned write, so the collapse loses
        # nothing.
        reader = spark.read.format("arrowipc")
        if schema is not None:
            reader = reader.schema(schema)
        (reader.load(snapshot)
         .repartitionByRange(max(1, target_files), "commit_seq")
         .sortWithinPartitions("commit_seq")
         .write.format("arrowipc").option("compression", compression)
         .mode("append")
         .save(os.path.join(staging, f"compacted_thru={thru}")))

        rows = _staged_rows(staging)
        promoted: list[str] = []
        for src, _ in _walk_staged_parts(staging):
            dst = os.path.join(path, os.path.relpath(src, staging))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
            sp = stats_path(src)
            if os.path.exists(sp):
                os.replace(sp, stats_path(dst))
            promoted.append(dst)
        # Logical swap: one manifest version whose visible set replaces the
        # compacted inputs with their checkpoint.  Old parts stay on disk
        # for time travel until vacuum.
        try:
            version = _write_manifest(path, promoted, replace=False,
                                      remove=in_scope,
                                      adds_new_rows=False)
        except ConcurrentWriteConflict:
            # Same orphan rule as compact_arrowipc: an unpublished
            # checkpoint is invisible and must not linger on disk.
            for p in promoted:
                for victim in (p, stats_path(p)):
                    try:
                        os.remove(victim)
                    except FileNotFoundError:
                        pass
            raise
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(snapshot, ignore_errors=True)
    files_after = len(before) - len(in_scope) + len(promoted)
    return {"files_before": len(before), "files_after": files_after,
            "compacted": len(in_scope), "rows": rows, "version": version,
            "thru": thru}
