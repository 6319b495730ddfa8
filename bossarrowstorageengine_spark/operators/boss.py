"""BOSS-expression queries (SURVEY.md §1.2/§3.1): the reference's host-side
expression language compiled onto Catalyst via ``boss_expr.compile_expr``.

These two queries are authored AS s-expressions — the form a user of the
reference's BOSS stack writes — and compile to the same DataFrame plans the
rest of the surface uses, so Catalyst still gets pushdown/broadcast
opportunities.  The oracle replays each relationally in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.boss_expr import compile_expr
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_boss_select_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'A'
    """,
)
def q_boss_select_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Project(Select(Table, Where(...)), ...)`` — filter + computed
    projection written as a BOSS s-expression.  The predicate reaches the
    parquet scan as PushedFilters exactly as the native-DataFrame version
    would (the compiler emits Column expressions, not UDFs).

    Per-row money emits as integer cents (``floor(x*100 + 0.5)`` in both
    engines) — per-row ``round(..., 2)`` of a 4-decimal product sits on
    .xx5 ties whose direction depends on binary representation (§8).
    """
    expr = (
        "Project",
        ("Select",
         ("Table", "lineitem"),
         ("Where", ("And",
                    ("Greater", "l_quantity", 45),
                    ("Equal", "l_returnflag", ("Symbol", "A"))))),
        "l_orderkey",
        "l_linenumber",
        ("As", "revenue_raw",
         ("Times", "l_extendedprice", ("Minus", 1, "l_discount"))),
    )
    df = compile_expr(spark, expr, sf_dir)
    return df.select(
        "l_orderkey", "l_linenumber",
        F.floor(F.col("revenue_raw") * 100 + 0.5).cast("long")
            .alias("revenue_cents"),
    )


@query(
    "q_boss_group_join",
    oracle="""
    SELECT c_mktsegment,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_boss_group_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Group(Join(orders, customer), By(segment), aggregates)`` as a BOSS
    s-expression.  The compiled plan is a plain equi-join + hash aggregate,
    so Catalyst broadcasts the dimension side exactly as in
    ``q_join_broadcast``.
    """
    expr = (
        "Group",
        ("Join",
         ("Table", "orders"),
         ("Table", "customer"),
         ("Where", ("Equal", "o_custkey", "c_custkey"))),
        ("By", "c_mktsegment"),
        ("As", "n_orders", ("Count",)),
        ("As", "sum_price_raw", ("Sum", "o_totalprice")),
    )
    df = compile_expr(spark, expr, sf_dir)
    return df.select(
        "c_mktsegment",
        F.col("n_orders"),
        F.round("sum_price_raw", 2).alias("sum_price"),
    )
