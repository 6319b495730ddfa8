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
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.sources.arrowipc import (
    _list_ipc_files,
    _manifest_file,
    _manifest_versions,
    _read_manifest,
    _write_manifest,
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
    # On a snapshotted table, compact the latest COMMITTED set (the
    # manifest), never the raw listing: a directory listing can include an
    # in-flight appender's renamed-but-uncommitted part, which must be
    # neither rewritten (its own commit would later double its rows) nor
    # deleted.
    versions = _manifest_versions(path)
    before = (_read_manifest(path, versions[-1]) if versions
              else _list_ipc_files(path))

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

    # Swap.  On a snapshotted table (manifests present) the swap is LOGICAL:
    # promote the new parts, then publish one manifest version whose visible
    # set replaces the compacted inputs with their rewrite — readers flip
    # atomically from old parts to new, concurrent appender commits survive
    # (the removal set is applied inside the manifest CAS retry loop), and
    # the old parts stay on disk so time travel to pre-compaction versions
    # keeps working until `vacuum_arrowipc` reclaims them.  On a plain
    # directory there is no manifest to flip, so the swap is physical:
    # delete old parts, promote new.
    snapshotted = bool(versions)
    if not snapshotted:
        for old in before:
            os.remove(old)
            sp = stats_path(old)
            if os.path.exists(sp):
                os.remove(sp)
    promoted = 0
    promoted_paths: list[str] = []
    for name in sorted(os.listdir(staging)):
        if name.startswith((".", "_")) or not name.endswith(".arrows"):
            continue  # sidecars promoted with their data file below
        dst = os.path.join(path, name)
        os.replace(os.path.join(staging, name), dst)
        sp = stats_path(os.path.join(staging, name))
        if os.path.exists(sp):
            os.replace(sp, stats_path(dst))
        promoted += 1
        promoted_paths.append(dst)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(snapshot, ignore_errors=True)
    out = {"files_before": len(before), "files_after": promoted, "rows": rows}
    if snapshotted:
        out["version"] = _write_manifest(
            path, promoted_paths, replace=False, remove=before)
    return out


def delete_arrowipc(
    spark: SparkSession,
    path: str,
    predicate: str,
    compression: str = "zstd",
    ipc_format: str = "file",
) -> dict:
    """Row-level DELETE via copy-on-write at part-file granularity — the
    Delta/Iceberg CoW model on the arrowipc layout.

    ``predicate`` is a Spark SQL boolean expression over the table's
    columns; rows matching it are removed.

    Scale shape: one distributed scan (with ``filenameColumn`` attribution
    and the predicate pushed to the stats-pruned arrowipc reader) finds
    the AFFECTED part files; only the collected artifact is that file-name
    list, never rows.  A second distributed job rewrites just the affected
    files with matching rows dropped; untouched files are not read again.
    On a snapshotted table the swap is one replace-manifest commit (old
    parts retained for time travel until vacuum); otherwise the affected
    files are physically replaced.

    Returns ``{"rows_deleted": n, "files_rewritten": k, "version": v?}``.
    """
    register_arrowipc(spark)
    versions = _manifest_versions(path)
    snapshotted = bool(versions)
    visible = (_read_manifest(path, versions[-1]) if snapshotted
               else _list_ipc_files(path))

    # Pin the input set (hard-link mirror), exactly like compaction: the
    # scan, the rewrite, and the swap must all cover the same files even if
    # appenders land new parts mid-delete.
    pin = os.path.join(path, f".delete-src-{uuid.uuid4().hex}")
    os.makedirs(pin, exist_ok=True)
    pinned_to_orig: dict[str, str] = {}
    for orig in visible:
        for src in (orig, stats_path(orig)):
            if not os.path.exists(src):
                continue
            dst = os.path.join(pin, os.path.relpath(src, path))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
        pinned_to_orig[os.path.join(pin, os.path.relpath(orig, path))] = orig

    fcol = "_part_file"
    df = (spark.read.format("arrowipc")
          .option("filenameColumn", fcol).load(pin))
    matches = df.filter(predicate)
    per_file = (matches.groupBy(fcol)
                .agg(F.count(F.lit(1)).alias("n")).collect())
    if not per_file:
        shutil.rmtree(pin, ignore_errors=True)
        return {"rows_deleted": 0, "files_rewritten": 0}
    affected_pinned = [r[fcol] for r in per_file]
    rows_deleted = sum(r["n"] for r in per_file)
    affected_orig = [pinned_to_orig[p] for p in affected_pinned]

    # Rewrite ONLY the affected files, keeping their non-matching rows.
    staging = os.path.join(path, f".delete-{uuid.uuid4().hex}")
    survivors = (
        df.filter(F.col(fcol).isin(affected_pinned))
        .filter(~F.expr(predicate))
        .drop(fcol)
    )
    (survivors.write.format("arrowipc")
     .option("compression", compression)
     .option("ipcFormat", ipc_format)
     .mode("append").save(staging))

    if not snapshotted:
        for old in affected_orig:
            os.remove(old)
            sp = stats_path(old)
            if os.path.exists(sp):
                os.remove(sp)
    promoted: list[str] = []
    if os.path.isdir(staging):
        for name in sorted(os.listdir(staging)):
            if name.startswith((".", "_")) or not name.endswith(".arrows"):
                continue
            dst = os.path.join(path, name)
            os.replace(os.path.join(staging, name), dst)
            sp = stats_path(os.path.join(staging, name))
            if os.path.exists(sp):
                os.replace(sp, stats_path(dst))
            promoted.append(dst)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(pin, ignore_errors=True)
    out = {"rows_deleted": rows_deleted, "files_rewritten": len(promoted)}
    if snapshotted:
        out["version"] = _write_manifest(
            path, promoted, replace=False, remove=affected_orig)
    return out


def vacuum_arrowipc(path: str, keep_versions: int = 1) -> dict:
    """Reclaim storage on a snapshotted table: drop all but the last
    ``keep_versions`` manifests and delete part files referenced ONLY by
    the dropped versions (the Delta ``VACUUM`` contract — compaction is a
    logical replace, vacuum is the physical delete).

    Safety: a file is removed only if some dropped manifest referenced it
    and no retained manifest does.  Files the manifests never mention
    (e.g. an appender's just-renamed-but-uncommitted part) are untouched.
    """
    versions = _manifest_versions(path)
    if not versions or keep_versions >= len(versions):
        return {"removed_files": 0, "removed_versions": 0,
                "retained_versions": versions}
    keep_versions = max(1, keep_versions)
    kept, dropped = versions[-keep_versions:], versions[:-keep_versions]
    retained: set[str] = set()
    for v in kept:
        retained |= set(_read_manifest(path, v))
    dropped_refs: set[str] = set()
    for v in dropped:
        dropped_refs |= set(_read_manifest(path, v))
    removed = 0
    for f in sorted(dropped_refs - retained):
        if os.path.exists(f):
            os.remove(f)
            removed += 1
        sp = stats_path(f)
        if os.path.exists(sp):
            os.remove(sp)
    for v in dropped:
        os.remove(_manifest_file(path, v))
    return {"removed_files": removed, "removed_versions": len(dropped),
            "retained_versions": kept}
