"""Result-comparison helpers shared by tools/check.py and the pytest suite.

Mirrors the driver's t2 gate: row count + column names + order-insensitive
value equality after canonicalization (ints → int64, floats → float64,
timestamps → tz-naive µs).
"""

from __future__ import annotations

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns."""
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
    return df.sort_values(by=list(df.columns), na_position="last",
                          kind="mergesort", ignore_index=True)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Hard problems (mismatches) + ``DTYPE-WARN`` soft notes; [] = match."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    for c in s_cols:
        st, dt = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        if st != dt:
            problems.append(f"DTYPE-WARN {c}: spark={st} duck={dt}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        try:
            neq = a.fillna("<NULL>") != b.fillna("<NULL>")
            if neq.to_numpy().any():
                bad_cols = [c for c in a.columns if neq[c].any()]
                idx = neq.any(axis=1)
                ex = pd.concat(
                    [a[idx].head(3).add_prefix("spark_"),
                     b[idx].head(3).add_prefix("duck_")], axis=1)
                problems.append(f"VALUES differ in {bad_cols}\n{ex.to_string()}")
        except Exception as exc:  # incomparable frames
            problems.append(f"compare failed: {exc}")
    return problems


def hard_problems(problems: list[str]) -> list[str]:
    return [p for p in problems if not p.startswith("DTYPE-WARN")]
