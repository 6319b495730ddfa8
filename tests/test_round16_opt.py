"""Round-16 optimization regression tests.

The optimization round must not change what any query computes; these
tests pin the *mechanisms* the optimizations rely on so a later refactor
cannot silently re-introduce the cost (or break the semantics).
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from bossarrowstorageengine_spark import catalog
from bossarrowstorageengine_spark.catalog import load_table, table_path

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _clear_schema_cache():
    saved = dict(catalog._SCHEMA_CACHE)
    catalog._SCHEMA_CACHE.clear()
    yield
    catalog._SCHEMA_CACHE.clear()
    catalog._SCHEMA_CACHE.update(saved)


def test_load_table_schema_cached_and_identical(spark):
    """First load infers and caches; second load passes the cached schema
    explicitly and must produce an identical DataFrame schema."""
    first = load_table(spark, SF_DIR, "lineitem")
    path = table_path(SF_DIR, "lineitem")
    assert path in catalog._SCHEMA_CACHE
    assert catalog._SCHEMA_CACHE[path] == first.schema
    second = load_table(spark, SF_DIR, "lineitem")
    assert second.schema == first.schema
    # and the data itself is identical (same count, same checksum)
    agg = [
        r.asDict()
        for r in first.selectExpr(
            "count(*) n", "sum(l_orderkey) s").collect()
    ]
    agg2 = [
        r.asDict()
        for r in second.selectExpr(
            "count(*) n", "sum(l_orderkey) s").collect()
    ]
    assert agg == agg2


def test_load_table_events_normalization_survives_cache(spark):
    """events.ts must arrive as TIMESTAMP on both the inferring first
    load and the cached-schema second load (the ns→µs normalization
    runs on the RAW cached schema, not on the normalized output)."""
    first = load_table(spark, SF_DIR, "events")
    second = load_table(spark, SF_DIR, "events")
    for df in (first, second):
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert first.schema == second.schema
    a = first.selectExpr("min(ts) lo", "max(ts) hi", "count(*) n").collect()
    b = second.selectExpr("min(ts) lo", "max(ts) hi", "count(*) n").collect()
    assert a == b


def test_schema_cache_is_metadata_only(spark):
    """The cache holds StructTypes keyed by path — never DataFrames or
    rows (result caching across runs is forbidden; schemas are plan
    metadata, the metastore role)."""
    load_table(spark, SF_DIR, "nation")
    for k, v in catalog._SCHEMA_CACHE.items():
        assert isinstance(k, str)
        assert isinstance(v, T.StructType)
