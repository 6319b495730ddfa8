"""B.6 sorts / limits / top-k (SURVEY.md §2.B6).

Global ORDER BY + LIMIT is planned by Spark as TakeOrderedAndProject: each
partition keeps only its local top-k, the driver merges k·p rows — no global
sort shuffle.  That is exactly the 100 TB-safe shape; an unbounded global
sort of the fact table never appears on this surface.

Tiebreak discipline (§8.3): every ordering ends in a unique key so results
are deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice
    FROM orders
    ORDER BY o_orderdate DESC, o_totalprice ASC, o_orderkey
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit → TakeOrderedAndProject (per-partition top-k).

    The date key is emitted as an ISO yyyy-MM-dd string on both engines
    (same ordering as the timestamp) so the compare is dtype-exact."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
        )
        .orderBy(F.desc("o_orderdate"), F.asc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS revenue
    FROM lineitem
    ORDER BY round(l_extendedprice * (1 - l_discount), 2) DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by computed measure with unique tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
    return (
        li.select("l_orderkey", "l_linenumber", rev.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(10)
    )
