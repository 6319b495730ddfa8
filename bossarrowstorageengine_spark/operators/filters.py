"""B.2 projections / filters / predicates (SURVEY.md §2.B2).

All predicates are declarative Column expressions, so Catalyst pushes them
into the parquet scan (`PushedFilters` in .explain) and prunes columns to
the projected set — at 100 TB these queries read only the referenced
columns' pages and skip row groups via parquet min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 30 AND l_returnflag = 'R'
    """,
)
def q_filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate — fully pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity").between(5, 30)) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@query(
    "q_filter_complex",
    oracle="""
    SELECT p_partkey, p_brand, p_type, p_size
    FROM part
    WHERE p_size IN (1, 5, 9, 14) OR (p_type LIKE '%BRASS%' AND NOT p_brand = 'Brand#1')
    """,
)
def q_filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR / NOT / IN / LIKE predicate tree."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_size").isin(1, 5, 9, 14)
            | (F.col("p_type").like("%BRASS%") & ~(F.col("p_brand") == "Brand#1"))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )


@query(
    "q_filter_null",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
      AND o_orderkey % 100 = 0
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL predicates (corpus has no nulls — the filter is a
    semantic no-op but exercises the null-test operators end-to-end)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isNotNull()
            & F.col("o_totalprice").isNotNull()
            & (F.col("o_orderkey") % 100 == 0)
        )
        .select("o_orderkey", "o_orderstatus")
    )


@query(
    "q_project_exprs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS revenue_cents,
           CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT) AS charged_cents
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_quantity < 10
    """,
)
def q_project_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections (TPC-H revenue expression) emitted as integer
    cents.

    Row-level ``round(x, 2)`` is NOT portable: Spark rounds the shortest
    decimal repr (BigDecimal HALF_UP) while DuckDB rounds the binary value —
    ~0.2 % of rows land on half-cent boundaries and differ by one cent.
    ``floor(x*100 + 0.5)`` is the same IEEE op sequence in both engines, so
    it is bit-identical (verified empirically; SURVEY.md §8.1 refinement).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter((F.col("l_returnflag") == "A") & (F.col("l_quantity") < 10))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor(rev * 100 + 0.5).cast("long").alias("revenue_cents"),
            F.floor(rev * (1 + F.col("l_tax")) * 100 + 0.5).cast("long").alias("charged_cents"),
        )
    )


@query(
    "q_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot'
                WHEN o_orderpriority IN ('2-HIGH', '3-MEDIUM') THEN 'warm'
                ELSE 'cold' END                                   AS heat,
           coalesce(nullif(o_orderstatus, 'O'), 'open')           AS status_alias,
           CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF conditional expressions."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderpriority") == "1-URGENT", "hot")
            .when(F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"), "warm")
            .otherwise("cold")
            .alias("heat"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
            .alias("status_alias"),
            F.when(F.col("o_totalprice") > 200000, "big").otherwise("small")
            .alias("size_class"),
        )
    )


@query(
    "q_skyline_pareto",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_brand, p_size, p_retailprice FROM part
    ),
    frontier AS (
        SELECT a.* FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.p_brand = a.p_brand
              AND b.p_size >= a.p_size
              AND b.p_retailprice <= a.p_retailprice
              AND (b.p_size > a.p_size
                   OR b.p_retailprice < a.p_retailprice)
        )
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT)        AS n_frontier,
           CAST(sum(p_partkey) AS BIGINT)  AS key_checksum,
           round(min(p_retailprice), 2)    AS min_price
    FROM frontier GROUP BY p_brand
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query per brand: parts not dominated on
    (maximize size, minimize price) — the multi-criteria shortlist
    operator ("show me the options where nothing else is at least as big
    AND at least as cheap").  Ties on both axes survive together (neither
    strictly dominates).

    Scale: the dominance test is an anti-join against dominators BLOCKED
    by brand, so the quadratic pair expansion is bounded per block (the
    standard distributed block-nested-loop skyline; at whale-block scale
    the refinement is a pre-filter by a grid of per-block min/max).  No
    global structure, no driver loop.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice")
    frontier = pareto_frontier(
        p, block="p_brand", maximize="p_size", minimize="p_retailprice")
    return frontier.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_frontier"),
        F.sum("p_partkey").cast("long").alias("key_checksum"),
        F.round(F.min("p_retailprice"), 2).alias("min_price"),
    )


def pareto_frontier(df: DataFrame, block: str, maximize: str,
                    minimize: str) -> DataFrame:
    """Rows not dominated within their ``block`` on (maximize ↑,
    minimize ↓): b dominates a iff b ≥ a on the maximized axis, ≤ on the
    minimized axis, and strictly better on at least one.  Ties on both
    axes survive together.  One blocked anti-join — quadratic per block,
    never per table."""
    a, b = df.alias("a"), df.alias("b")
    dominated = (
        (F.col(f"b.{block}") == F.col(f"a.{block}"))
        & (F.col(f"b.{maximize}") >= F.col(f"a.{maximize}"))
        & (F.col(f"b.{minimize}") <= F.col(f"a.{minimize}"))
        & ((F.col(f"b.{maximize}") > F.col(f"a.{maximize}"))
           | (F.col(f"b.{minimize}") < F.col(f"a.{minimize}")))
    )
    return a.join(b, dominated, "left_anti")
