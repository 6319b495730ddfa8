"""Fixture-robustness: ``events.ts`` physical-type drift must not break queries.

Round 2 post-mortem (VERDICT.md): the driver's testdata changed ``events.ts``
from parquet ``timestamp[ns]`` to ``timestamp[us]`` (no isAdjustedToUTC), which
Spark reads as TIMESTAMP_NTZ — silently breaking ``unix_micros``/``unix_millis``
epoch math in two queries while their old driver-green rows went stale.

The fix is centralized in ``catalog.load_table``: every physical variant is
normalized to one engine type, TIMESTAMP (LTZ), under the pinned-UTC session.
These tests pin that contract:

1. ``load_table`` yields byte-identical rows and a TimestampType ``ts`` for all
   three physical encodings (ns, us-naive/NTZ, us-UTC-adjusted/LTZ).  Since
   operators only ever consume ``load_table`` output, this invariant makes the
   whole query surface immune to the next fixture re-encode.
2. The two queries that broke in round 2 run end-to-end, with identical
   results, on every variant — an integration sentinel on top of (1).
3. A lint sweep: no operator module may call the NTZ-fragile epoch functions
   on a column that hasn't passed through ``load_table`` — enforced loosely by
   requiring the only call sites to live in event_time.py (whose inputs are
   all load_table-normalized).
"""

from __future__ import annotations

import re
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators import QUERIES

SF = "/root/testdata/sf0.001"
PKG = Path(__file__).resolve().parents[1] / "bossarrowstorageengine_spark"

VARIANTS = ("ns", "us_ntz", "us_ltz")


def _rewrite_events(tmpdir: Path, variant: str) -> str:
    """Re-encode sf0.001 events.parquet with a given ts physical type and
    return an sf_dir-shaped directory containing it."""
    tbl = pq.read_table(f"{SF}/events.parquet")
    idx = tbl.schema.get_field_index("ts")
    col = tbl.column(idx)
    # Normalize to naive us first (whatever the current fixture encoding is).
    base = col.cast(pa.timestamp("us"))
    if variant == "ns":
        new = base.cast(pa.timestamp("ns"))
    elif variant == "us_ntz":
        new = base
    else:  # us_ltz — UTC-adjusted storage, reads back as Spark TIMESTAMP
        new = base.cast(pa.timestamp("us", tz="UTC"))
    out = tbl.set_column(idx, pa.field("ts", new.type), new)
    d = tmpdir / variant
    d.mkdir(parents=True, exist_ok=True)
    # version='2.6' preserves nanos as TIMESTAMP(NANOS) instead of coercing.
    pq.write_table(out, d / "events.parquet", version="2.6")
    return str(d)


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ts_variants")
    return {v: _rewrite_events(root, v) for v in VARIANTS}


def _canon_rows(df):
    rows = df.select("event_id", "ts").orderBy("event_id").limit(2000).collect()
    return [(r.event_id, r.ts) for r in rows]


def test_load_table_normalizes_all_physical_types(spark, variant_dirs):
    baseline = None
    for v in VARIANTS:
        df = load_table(spark, variant_dirs[v], "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
            f"variant {v}: ts is {df.schema['ts'].dataType}, want TIMESTAMP")
        rows = _canon_rows(df)
        if baseline is None:
            baseline = rows
        else:
            assert rows == baseline, f"variant {v}: row drift vs ns baseline"


@pytest.mark.parametrize(
    "key", ["q_sessionize", "q_stream_session", "q_win_session_gap"])
def test_round2_breakage_sentinels_on_every_variant(spark, variant_dirs, key):
    fn = QUERIES[key]
    results = {}
    for v in VARIANTS:
        out = fn(spark, variant_dirs[v])
        cols = sorted(out.columns)
        rows = sorted(tuple(r[c] for c in cols) for r in out.collect())
        results[v] = rows
        assert rows, f"{key} on {v}: empty result"
    assert results["us_ntz"] == results["ns"] == results["us_ltz"], (
        f"{key}: results differ across ts physical types")


def test_ntz_fragile_calls_confined_to_event_time():
    """unix_millis/unix_micros/to_utc_timestamp crash or shift on NTZ input;
    keep call sites confined to event_time.py, whose event inputs all pass
    through load_table's normalization."""
    pat = re.compile(r"\b(unix_millis|unix_micros|to_utc_timestamp|from_utc_timestamp)\s*\(")
    offenders = []
    for py in PKG.rglob("*.py"):
        if py.name == "event_time.py":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if pat.search(line) and not line.lstrip().startswith("#"):
                offenders.append(f"{py.relative_to(PKG)}:{i}: {line.strip()}")
    assert not offenders, (
        "NTZ-fragile timestamp calls outside event_time.py:\n" + "\n".join(offenders))
