"""Per-action wall-time trace for one or more query keys (guide §1).

Wraps every eager DataFrame entry point (collect / count / take /
isEmpty / toPandas / localCheckpoint / writer save) with a timer that
records the duration and the repo-side callsite, then runs each key
end-to-end.  Output: one line per action plus a per-callsite rollup —
the evidence base for action-count reductions (VERDICT r16 item 1: the
maintained-ANN/storage keys are compositions of dozens of small actions
whose ~0.1-0.5 s JVM floors dominate).

Usage:
    python tools/action_trace.py q_storage_changefeed [more keys...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/action_trace.py ...
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

TRACE: list[tuple[str, str, float]] = []   # (action, callsite, sec)


def _callsite() -> str:
    for frame in reversed(traceback.extract_stack()):
        fn = frame.filename
        if "bossarrowstorageengine_spark" in fn or fn.endswith(
                "__spark_entry__.py"):
            rel = fn.split("bossarrowstorageengine_spark/")[-1]
            return f"{rel}:{frame.lineno}"
    return "<driver>"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            TRACE.append((name, _callsite(), time.perf_counter() - t0))

    setattr(cls, name, timed)


def main() -> None:
    # Patch the CLASSIC DataFrame (Spark 4: pyspark.sql.DataFrame is the
    # unified facade; classic sessions return a subclass that overrides
    # the action methods, which would shadow a facade-level patch).
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    import __spark_entry__ as entrymod
    from bossarrowstorageengine_spark.catalog import load_table
    from bossarrowstorageengine_spark.session import build_session

    for m in ("collect", "count", "take", "isEmpty", "toPandas",
              "localCheckpoint"):
        _wrap(DataFrame, m)
    _wrap(DataFrameWriter, "save")

    keys = sys.argv[1:]
    if not keys:
        raise SystemExit("usage: action_trace.py <query key> [keys...]")

    spark = build_session("action-trace", master=f"local[{CPUS}]")
    qs = entrymod.queries()
    # Warmup (mirrors bench.py's spirit, minimal): JVM + workers + footers.
    load_table(spark, SF_DIR, "region").collect()
    spark.range(100).toPandas()

    for key in keys:
        for run in (1, 2):
            TRACE.clear()
            t0 = time.perf_counter()
            qs[key](spark, SF_DIR).collect()
            total = time.perf_counter() - t0
            if run == 1:
                continue          # report the warm run
            print(f"\n=== {key}: run {run} total {total:.3f}s, "
                  f"{len(TRACE)} traced actions, "
                  f"traced sum {sum(t for *_, t in TRACE):.3f}s ===")
            for act, site, sec in TRACE:
                print(f"  {sec:7.3f}s  {act:<16s} {site}")
            rollup: dict[str, tuple[int, float]] = {}
            for act, site, sec in TRACE:
                n, s = rollup.get(site, (0, 0.0))
                rollup[site] = (n + 1, s + sec)
            print("  -- rollup by callsite --")
            for site, (n, s) in sorted(rollup.items(), key=lambda kv: -kv[1][1]):
                print(f"  {s:7.3f}s  x{n:<3d} {site}")


if __name__ == "__main__":
    main()
