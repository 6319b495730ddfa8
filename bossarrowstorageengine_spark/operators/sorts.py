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


@query(
    "q_abc_analysis",
    oracle="""
    WITH rev AS (
        SELECT p.p_brand,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    ),
    ranked AS (
        SELECT p_brand, cents,
               sum(cents) OVER (ORDER BY cents DESC, p_brand
                                ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cents) OVER ()                         AS tot
        FROM rev
    )
    SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                WHEN cum * 100 <= tot * 95 THEN 'B'
                ELSE 'C' END              AS abc_class,
           CAST(count(*) AS BIGINT)       AS n_brands,
           CAST(sum(cents) AS BIGINT)     AS class_cents
    FROM ranked
    GROUP BY 1
    """,
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis: brands classified by cumulative revenue share
    (A = the head that carries 80% of revenue, B → 95%, C = tail) — the
    inventory-prioritization classic.

    Scale framing: the cumulative ranking runs over the AGGREGATED brand
    table (dimension-cardinality rows), never the fact table — so the one
    unpartitioned cumulative window is over a tiny frame regardless of
    corpus size; the heavy work is a map-side-combined revenue aggregation
    behind a broadcast fact⋈dim join.  Integer-cents cumulative sums make
    the 80/95% class boundaries exact integer comparisons.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w_cum = (Window.orderBy(F.desc("cents"), "p_brand")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy()
    ranked = rev.select(
        "p_brand", "cents",
        F.sum("cents").over(w_cum).alias("cum"),
        F.sum("cents").over(w_tot).alias("tot"),
    )
    cls = (F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
           .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
           .otherwise("C"))
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.sum("cents").cast("long").alias("class_cents"),
    )
