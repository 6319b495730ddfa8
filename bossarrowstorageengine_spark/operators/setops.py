"""B.7 set operations (SURVEY.md §2.B7).

UNION ALL is shuffle-free (plan concatenation); UNION/INTERSECT/EXCEPT add
a distinct-style aggregate on the full row — at scale that shuffle is keyed
on all columns, so these queries project down to narrow key sets first
(project-then-setop is the 100 TB-friendly order of operations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_set_union_all",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_rows, round(sum(o_totalprice), 2) AS sum_price
    FROM (
        SELECT o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 250000
        UNION ALL
        SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY o_orderstatus
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — duplicates preserved (rows matching both filters count twice)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select("o_orderstatus", "o_totalprice")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus", "o_totalprice")
    return (
        a.unionByName(b)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_set_union_distinct",
    oracle="""
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_totalprice > 250000
    UNION
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — union + distinct on a narrow projection."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select("o_orderstatus", "o_orderpriority")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus", "o_orderpriority")
    return a.unionByName(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present in both customer and supplier."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys with customers but no suppliers (set difference).

    ``subtract`` is SQL EXCEPT (set semantics) — ``exceptAll`` would be bag
    semantics and keep keys whose left multiplicity exceeds the right's.
    """
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)
