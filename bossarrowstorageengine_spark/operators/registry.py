"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string.  ``__spark_entry__.py`` simply re-exports these dicts.

Determinism rules applied across the surface (SURVEY.md §8): float aggregates
rounded (2dp money / 4dp stats / 6dp cosine), every order-sensitive operator
carries a unique tiebreak key, int-typed results cast so Spark and DuckDB
agree on int64, timestamps in UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` declares a ROWS-only check
    (non-SQL-expressible op — the driver falls back to a rows-only gate)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
