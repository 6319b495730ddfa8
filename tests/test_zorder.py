"""Z-order layout quality: files written by ``write_zorder_orders`` must be
small rectangles in BOTH clustering dimensions (o_custkey, o_orderdate), so
parquet min/max stats can skip files for predicates on either dimension —
the property a single-column sort cannot provide."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from bossarrowstorageengine_spark.operators.scans import (
    _scratch,
    write_zorder_orders,
)

SF = "/root/testdata/sf0.01"


def _file_spans(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet part file, from footer stats only."""
    spans = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min
                 for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max
                 for g in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def _mean_span_fraction(spans: list[tuple]) -> float:
    glo = min(lo for lo, _ in spans)
    ghi = max(hi for _, hi in spans)
    width = (ghi - glo) or 1
    fracs = [(hi - lo) / width for lo, hi in spans]
    return sum(fracs) / len(fracs)


def test_zorder_files_cluster_both_dimensions(spark):
    path = _scratch(SF, "zorder_quality")
    write_zorder_orders(spark, SF, path)

    cust = _mean_span_fraction(_file_spans(path, "o_custkey"))
    date = _mean_span_fraction(
        [(lo.timestamp(), hi.timestamp())
         for lo, hi in _file_spans(path, "o_orderdate")])

    # 8 z-ordered files each cover ~1/8 of the curve, i.e. roughly a
    # sqrt(1/8) ≈ 0.35 slice of EACH dimension; a single-column sort
    # would leave one dimension at ~1.0.  0.7 is a loose upper bound
    # that still rules out any single-dimension layout.
    assert cust < 0.7, f"custkey span fraction {cust:.2f}"
    assert date < 0.7, f"orderdate span fraction {date:.2f}"
