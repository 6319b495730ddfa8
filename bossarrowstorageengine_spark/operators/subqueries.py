"""Subquery operators (scalar / IN / correlated EXISTS) and composite
TPC-H-shaped flagship queries, exercised through the SQL entry point (E2 in
SURVEY.md §3.2) over registered temp views.

Catalyst rewrites every subquery below into a join before execution
(scalar → broadcast of a 1-row aggregate; IN → left-semi; correlated
EXISTS → decorrelated left-semi, SURVEY.md §4), so the physical plans are
the same shuffle/broadcast shapes as the explicit-join queries — there is
no per-row subquery evaluation anywhere, at any scale.

The Spark SQL text and the DuckDB oracle text are intentionally identical
ANSI SQL where possible — the differential check then validates the whole
parse→plan→execute pipeline rather than a hand-translated twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bossarrowstorageengine_spark.catalog import register_views
from bossarrowstorageengine_spark.operators.registry import query

_SCALAR_SQL = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
"""

_IN_SQL = """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)          AS n_cust,
           CAST(sum(c_nationkey) AS BIGINT)  AS sum_nk
    FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey IN (1, 3)
    )
    GROUP BY c_mktsegment
"""

_EXISTS_SQL = """
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_big_spenders
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
    )
    GROUP BY c.c_nationkey
"""

_Q3_SQL = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""

_Q10_SQL = """
    SELECT c_custkey,
           c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


_Q5_SQL = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""

_Q6_SQL = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT)                    AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""

_Q14_SQL = """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END) /
                 sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""

_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""

_Q13_SQL = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

_Q15_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""

_Q17_SQL = """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
"""

_Q22_SQL = """
    SELECT c_nationkey AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
          )
    GROUP BY c_nationkey
    ORDER BY cntrycode
"""

_Q18_SQL = """
    SELECT c_custkey,
           o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate,
           round(o_totalprice, 2)    AS o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
"""


# -- the remaining TPC-H queries ---------------------------------------------
#
# The driver's tables are a REDUCED TPC-H schema: no partsupp table, and no
# l_shipmode / l_commitdate / l_receiptdate / p_container / p_mfgr / comment
# columns.  Each query below keeps its canonical TPC-H *plan shape* (the
# thing that matters at 100 TB — the same joins, subquery decorrelations,
# disjunctive pushdowns, and aggregation patterns) with predicates adapted
# to the columns that exist:
#   Q2   ps_supplycost  → min observed lineitem unit price per (part, supp)
#   Q4   commit<receipt → shipped >60 days after order date
#   Q9   ps_supplycost  → 0.5 × p_retailprice
#   Q11  partsupp value → lineitem revenue in integer cents (exact HAVING
#        threshold via multiply-through, no FP boundary flakes)
#   Q12  l_shipmode     → l_returnflag buckets, "late" = >90 days
#   Q16  partsupp       → distinct lineitem suppliers; comment filter →
#        negative-balance suppliers
#   Q19  p_container    → p_size bands
#   Q20  availability   → shipped quantity per supplier over a year
#   Q21  receipt>commit → shipped >90 days after order date

_Q1_SQL = """
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2)                         AS sum_qty,
           round(sum(l_extendedprice), 2)                    AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                             AS sum_charge,
           round(avg(l_quantity), 4)                         AS avg_qty,
           round(avg(l_extendedprice), 4)                    AS avg_price,
           round(avg(l_discount), 4)                         AS avg_disc,
           CAST(count(*) AS BIGINT)                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

_Q2_SQL = """
    WITH supply AS (
        SELECT l_partkey AS ps_partkey,
               l_suppkey AS ps_suppkey,
               min(round(l_extendedprice / l_quantity, 2)) AS ps_supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT round(s_acctbal, 2) AS s_acctbal,
           s_name, n_name, p_partkey, p_type
    FROM part, supply, supplier, nation, region
    WHERE p_partkey = ps_partkey
      AND s_suppkey = ps_suppkey
      AND p_size = 15
      AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT min(ps_supplycost)
          FROM supply, supplier, nation, region
          WHERE p_partkey = ps_partkey
            AND s_suppkey = ps_suppkey
            AND s_nationkey = n_nationkey
            AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

_Q4_SQL = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

_Q8_SQL = """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT)  AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name                          AS nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey
          AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""

_Q9_SQL = """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
        SELECT n_name                            AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey
          AND p_partkey = l_partkey
          AND l_orderkey = o_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""

_Q11_SQL = """
    WITH stock AS (
        SELECT l_partkey AS ps_partkey,
               CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT) AS cents
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name IN ('NATION_1', 'NATION_6')
    )
    SELECT ps_partkey,
           round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS value
    FROM stock
    GROUP BY ps_partkey
    HAVING sum(cents) * 1000 > (SELECT sum(cents) FROM stock)
    ORDER BY value DESC, ps_partkey
"""

_Q12_SQL = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

_Q16_SQL = """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

_Q19_SQL = """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT)                          AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
            AND l_quantity BETWEEN 20 AND 30))
"""

_Q20_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        )
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
    )
      AND s_nationkey = n_nationkey
      AND n_regionkey = 2
    ORDER BY s_suppkey
"""

_Q21_SQL = """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


def _sql_query(name: str, sql: str):
    @query(name, oracle=sql)
    def _fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    _fn.__name__ = name
    _fn.__doc__ = f"SQL-entry query (identical text runs on the oracle):\n{sql}"
    return _fn


q_subquery_scalar = _sql_query("q_subquery_scalar", _SCALAR_SQL)
q_subquery_in = _sql_query("q_subquery_in", _IN_SQL)
q_subquery_exists = _sql_query("q_subquery_exists", _EXISTS_SQL)
q_tpch_q3 = _sql_query("q_tpch_q3", _Q3_SQL)
q_tpch_q10 = _sql_query("q_tpch_q10", _Q10_SQL)
q_tpch_q5 = _sql_query("q_tpch_q5", _Q5_SQL)
q_tpch_q6 = _sql_query("q_tpch_q6", _Q6_SQL)
q_tpch_q14 = _sql_query("q_tpch_q14", _Q14_SQL)
q_tpch_q7 = _sql_query("q_tpch_q7", _Q7_SQL)
q_tpch_q13 = _sql_query("q_tpch_q13", _Q13_SQL)
q_tpch_q15 = _sql_query("q_tpch_q15", _Q15_SQL)
q_tpch_q17 = _sql_query("q_tpch_q17", _Q17_SQL)
q_tpch_q22 = _sql_query("q_tpch_q22", _Q22_SQL)
q_tpch_q18 = _sql_query("q_tpch_q18", _Q18_SQL)
q_tpch_q1 = _sql_query("q_tpch_q1", _Q1_SQL)
q_tpch_q2 = _sql_query("q_tpch_q2", _Q2_SQL)
q_tpch_q4 = _sql_query("q_tpch_q4", _Q4_SQL)
q_tpch_q8 = _sql_query("q_tpch_q8", _Q8_SQL)
q_tpch_q9 = _sql_query("q_tpch_q9", _Q9_SQL)
q_tpch_q11 = _sql_query("q_tpch_q11", _Q11_SQL)
q_tpch_q12 = _sql_query("q_tpch_q12", _Q12_SQL)
q_tpch_q16 = _sql_query("q_tpch_q16", _Q16_SQL)
q_tpch_q19 = _sql_query("q_tpch_q19", _Q19_SQL)
q_tpch_q20 = _sql_query("q_tpch_q20", _Q20_SQL)
q_tpch_q21 = _sql_query("q_tpch_q21", _Q21_SQL)


_LATERAL_SQL = """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT)         AS n_picked,
           CAST(sum(t.o_orderkey) AS BIGINT) AS key_checksum,
           round(sum(t.o_totalprice), 2)     AS top2_value
    FROM customer c,
    LATERAL (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 2
    ) t
    GROUP BY c.c_mktsegment
"""

#: LATERAL correlated subquery (top-2 orders per customer) — SQL:2016
#: lateral derived tables, identical text on both engines.  Catalyst
#: rewrites the correlated ORDER BY/LIMIT into a ranked window join (no
#: per-row subquery execution), so the physical plan is the same
#: partition-topk shape as ``q_win_topk_group`` — scale-safe at any
#: customer cardinality.
q_lateral_topk = _sql_query("q_lateral_topk", _LATERAL_SQL)


@query(
    "q_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)    AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 / SQL:2023-direction ``|>`` operator
    chaining): the same logical plan as the ANSI form, written as a
    linear dataflow — Catalyst parses both to identical plans, so this
    attests the NEW SQL surface produces byte-identical results to the
    classic one (the oracle is the ANSI twin).
    """
    register_views(spark, sf_dir)
    return spark.sql("""
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS sum_price,
                     round(max(o_totalprice), 2) AS max_price
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, sum_price, max_price
    """)
