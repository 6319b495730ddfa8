"""Storage-maintenance operations for the ``arrowipc`` layout.

A storage engine's table directories degrade under streaming/appending
ingest: many small part files (one per micro-batch task) make listings,
footers, and per-file task overhead dominate.  ``compact_arrowipc``
rewrites a directory into few large files — the Arrow-IPC equivalent of
parquet compaction / Delta ``OPTIMIZE``.

Scale design: the rewrite IS a Spark job — ``spark.read.format("arrowipc")``
→ ``repartition(target_files)`` → ``write.format("arrowipc")`` — so
compaction parallelizes across the cluster like any other query; nothing
passes through the driver.  The swap is a two-phase directory commit:
new files land under a hidden ``.compact-*`` staging dir (each part file
itself atomic via the writer's tmp+rename), then replace the old parts.
On a real object store the swap would be a manifest/transaction-log flip;
the staging + atomic-per-file pattern is the same.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

from bossarrowstorageengine_spark.sources.arrowipc import (
    _list_ipc_files,
    register_arrowipc,
    stats_path,
)


def compact_arrowipc(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    compression: str = "zstd",
    ipc_format: str = "file",
    dictionary: str | None = None,
) -> dict:
    """Rewrite an arrowipc directory into ``target_files`` part files.

    Returns ``{"files_before": n, "files_after": m, "rows": r}``.
    The read is the normal distributed scan (batch-range splits), the
    write the normal distributed writer; the directory swap happens only
    after every new part file has committed.
    """
    register_arrowipc(spark)
    before = _list_ipc_files(path)

    # Pin the input to the snapshot: hard-link (fall back to copy) exactly
    # the `before` file set into a hidden source dir and scan THAT, so the
    # count, the rewrite, and the deletion all cover the same files even if
    # a concurrent appender lands new parts mid-compaction (those survive
    # untouched — they are neither rewritten nor removed).
    snapshot = os.path.join(path, f".compact-src-{uuid.uuid4().hex}")
    os.makedirs(snapshot, exist_ok=True)
    for old in before:
        for src in (old, stats_path(old)):
            if not os.path.exists(src):
                continue
            # keep relative layout: partitioned (col=value) part files may
            # share basenames across subdirectories
            dst = os.path.join(snapshot, os.path.relpath(src, path))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)

    df = spark.read.format("arrowipc").load(snapshot)
    rows = df.count()

    staging = os.path.join(path, f".compact-{uuid.uuid4().hex}")
    writer = (
        df.repartition(max(1, target_files))
        .write.format("arrowipc")
        .option("compression", compression)
        .option("ipcFormat", ipc_format)
        .mode("append")
    )
    if dictionary:
        writer = writer.option("dictionary", dictionary)
    writer.save(staging)

    # Swap: remove old parts (+ sidecars), promote staged parts.
    for old in before:
        os.remove(old)
        sp = stats_path(old)
        if os.path.exists(sp):
            os.remove(sp)
    promoted = 0
    for name in sorted(os.listdir(staging)):
        if name.startswith((".", "_")) or not name.endswith(".arrows"):
            continue  # sidecars promoted with their data file below
        os.replace(os.path.join(staging, name), os.path.join(path, name))
        sp = stats_path(os.path.join(staging, name))
        if os.path.exists(sp):
            os.replace(sp, stats_path(os.path.join(path, name)))
        promoted += 1
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(snapshot, ignore_errors=True)
    return {"files_before": len(before), "files_after": promoted, "rows": rows}
