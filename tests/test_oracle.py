"""Oracle-differential tests — every declared query vs DuckDB at sf0.001
(the driver runs the same comparison at sf0.01; SURVEY.md §5.1)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from bossarrowstorageengine_spark.catalog import TABLES
from bossarrowstorageengine_spark.testing import compare_frames, hard_problems

SF = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def test_every_query_has_callable_and_key_parity():
    assert QUERIES, "no queries registered"
    missing_oracle = set(ORACLES) - set(QUERIES)
    assert not missing_oracle, f"oracles without queries: {missing_oracle}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_matches_oracle(key, spark, duck):
    sdf = QUERIES[key](spark, SF).toPandas()
    if key not in ORACLES:
        # ROWS-only ops: must at least run deterministically twice
        again = QUERIES[key](spark, SF).toPandas()
        assert len(sdf) == len(again)
        return
    ddf = duck.execute(ORACLES[key]).df()
    problems = hard_problems(compare_frames(sdf, ddf))
    assert not problems, f"{key}: {problems}"
