"""Local oracle-differential checker — mimics the driver's t2 gate.

Runs each ``queries()[key]`` on Spark and the matching ``oracle_sql()[key]``
on DuckDB over the same parquet tables, then compares:

- row count
- schema (column names; dtype kinds after canonicalization, warning on
  int-width or precision mismatches that could trip a stricter driver hash)
- order-insensitive value equality (columns sorted by name, rows sorted)

Usage:
    python tools/check.py                # all queries at sf0.01
    python tools/check.py q_agg_basic    # subset
    SF_DIR=/root/testdata/sf0.001 python tools/check.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from bossarrowstorageengine_spark.catalog import TABLES  # noqa: E402
from bossarrowstorageengine_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns,
    ints unified to int64, floats to float64, timestamps tz-stripped."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s
    df = df.sort_values(by=list(df.columns), na_position="last",
                        kind="mergesort", ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    # raw dtype comparison before canonicalization (warn-level detail)
    for c in s_cols:
        st, dt = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        if st != dt:
            problems.append(f"DTYPE-WARN {c}: spark={st} duck={dt}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        try:
            neq = (a.fillna("<NULL>") != b.fillna("<NULL>"))
            if neq.to_numpy().any():
                bad_cols = [c for c in a.columns if neq[c].any()]
                idx = neq.any(axis=1)
                ex = pd.concat(
                    [a[idx].head(3).add_prefix("spark_"),
                     b[idx].head(3).add_prefix("duck_")], axis=1)
                problems.append(f"VALUES differ in {bad_cols}\n{ex.to_string()}")
        except Exception as exc:
            problems.append(f"compare failed: {exc}")
    return problems


def main() -> int:
    keys = sys.argv[1:]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if not keys:
        keys = list(qs)
    if os.environ.get("CHECK_VANILLA") == "1":
        # Driver rehearsal: a plain SparkSession exactly like the driver's —
        # every engine conf must be applied at query time (entry wrapper's
        # apply_engine_conf), not inherited from build_session.
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local[8]")
                 .appName("check-vanilla").getOrCreate())
    else:
        spark = build_session("check")
    con = duck_connect(SF_DIR)
    n_fail = 0
    for k in keys:
        t0 = time.time()
        try:
            spdf = qs[k](spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {k}: SPARK EXCEPTION\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if k not in oracles:
            status = "ROWS" if len(spdf) >= 0 else "EMPTY"
            print(f"ok?  {k}: {status}-only, rows={len(spdf)}  "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[k]).df()
        except Exception:
            print(f"FAIL {k}: ORACLE EXCEPTION\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(k, spdf, dpdf)
        hard = [p for p in problems if not p.startswith("DTYPE-WARN")]
        warns = [p for p in problems if p.startswith("DTYPE-WARN")]
        if hard:
            n_fail += 1
            print(f"FAIL {k} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"    {p}")
        else:
            msg = f"PASS {k}: rows={len(spdf)} ({time.time()-t0:.1f}s)"
            if warns:
                msg += "  [" + "; ".join(warns) + "]"
            print(msg)
    print(f"\n{len(keys)-n_fail}/{len(keys)} ok")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
