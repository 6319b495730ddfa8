"""Z-order (Morton-curve) clustering expressions — static JVM bit math,
no UDFs.  Used by the q_zorder_layout query and ``compact_arrowipc``'s
``zorder`` option."""

from __future__ import annotations

from pyspark.sql import functions as F


def morton16(a, b):
    """Interleave the low 16 bits of two non-negative int columns into a
    32-bit Morton (Z-order) code — a static 64-term JVM expression."""
    z = F.lit(0).cast("long")
    for i in range(16):
        z = (
            z
            + F.shiftleft(
                F.shiftright(a, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i)
            + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long"),
                2 * i + 1)
        )
    return z


def norm10(col, lo_col: str, hi_col: str):
    """Normalize a numeric column to a 10-bit [0, 1023] position within
    broadcast global bounds — interleaving raw values would let the
    higher-magnitude dimension dominate the curve's high bits (the reason
    Delta's ZORDER interleaves range-partition ids, not raw values)."""
    width = F.col(hi_col) - F.col(lo_col) + 1
    return F.least(
        F.lit(1023), ((col - F.col(lo_col)) * 1024 / width).cast("int"))
