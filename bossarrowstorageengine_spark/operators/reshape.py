"""Reshaping + ordered/conditional aggregate operators: pivot, unpivot
(melt), ordered string aggregation, exact percentiles, and conditional /
boolean aggregates.

These extend the SURVEY.md §2 Part B surface with the table-reshaping
operators an analytics engine is expected to carry (the reference snapshot
implements no operators at all — see SURVEY.md §0; the target surface is
driver-defined).

Scale notes (100 TB design point):
- ``pivot`` with an explicit value list is a single partial+final hash
  aggregate (one shuffle); never call pivot without values at scale — the
  value-discovery pass is a second full scan.
- ``unpivot`` is a map-side expand (no shuffle).
- exact ``percentile`` needs the full group in memory — fine for bounded
  groups; at unbounded cardinality switch to ``approx_percentile`` (the
  same trade as q_agg_approx_distinct).
- ordered string-agg sorts within each group's collected array (bounded by
  group size, not partition size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_F,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_O,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_P,
           round(COALESCE(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 0), 2) AS sum_F,
           round(COALESCE(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 0), 2) AS sum_O,
           round(COALESCE(sum(o_totalprice) FILTER (o_orderstatus = 'P'), 0), 2) AS sum_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders: status values become columns (explicit value list —
    one aggregate pass, no value-discovery scan)."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("sum"))
    )
    # Spark names pivot output "<value>_<agg-alias>"; align with the oracle
    # and make empty cells 0 (FILTER-on-empty yields NULL count=0 in DuckDB,
    # pivot yields NULL for both — coalesce both sides' sums, counts to 0).
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(f"{v}_n"), F.lit(0)).cast("long").alias(f"n_{v}")
          for v in ("F", "O", "P")],
        *[F.round(F.coalesce(F.col(f"{v}_sum"), F.lit(0.0)), 2).alias(f"sum_{v}")
          for v in ("F", "O", "P")],
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'retail', round(p_retailprice, 2) FROM part
    )
    WHERE p_partkey <= 500
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) part measures into (metric, val) long form — a
    map-side expand, no shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return (
        p.select("p_partkey",
                 F.col("p_size").cast("double").alias("size"),
                 F.round("p_retailprice", 2).alias("retail"))
        .unpivot("p_partkey", ["size", "retail"], "metric", "val")
    )


@query(
    "q_agg_string_ordered",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment)
               FILTER (c_custkey % 100 = 0)          AS segs,
           CAST(count(*) AS BIGINT)                  AS n_cust
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q_agg_string_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (deterministic: sorted within group)."""
    c = load_table(spark, sf_dir, "customer")
    segs = F.array_join(
        F.array_sort(F.collect_list(
            F.when(F.col("c_custkey") % 100 == 0, F.col("c_mktsegment")))),
        ",")
    return c.groupBy("c_nationkey").agg(
        # collect_list drops the when()'s NULLs, matching FILTER
        F.nullif(segs, F.lit("")).alias("segs"),
        F.count(F.lit(1)).alias("n_cust"),
    )


@query(
    "q_agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4)      AS p50_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(median(l_discount), 4)                  AS med_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` — verified equal on this corpus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.median("l_discount"), 4).alias("med_disc"),
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_totalprice > 150000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0)                              AS all_pos,
           bool_or(o_orderstatus = 'P')                            AS any_pending,
           round(avg(o_totalprice) FILTER (o_orderstatus = 'F'), 2) AS avg_f
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional + boolean aggregates (count_if / every / any / filtered
    avg) — all partial+final hash aggregates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("count_if(o_totalprice > 150000)").alias("n_big"),
        F.expr("every(o_totalprice > 0)").alias("all_pos"),
        F.expr("any(o_orderstatus = 'P')").alias("any_pending"),
        F.round(F.avg(F.when(F.col("o_orderstatus") == "F",
                             F.col("o_totalprice"))), 2).alias("avg_f"),
    )


@query(
    "q_price_bands",
    oracle="""
    WITH bounds AS (
        SELECT quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.50) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT CASE WHEN o_totalprice < q1 THEN 'B1'
                WHEN o_totalprice < q2 THEN 'B2'
                WHEN o_totalprice < q3 THEN 'B3'
                ELSE 'B4' END           AS band,
           CAST(count(*) AS BIGINT)     AS n_orders,
           round(sum(o_totalprice), 2)  AS sum_price,
           round(min(o_totalprice), 2)  AS band_floor
    FROM orders, bounds
    GROUP BY 1
    """,
)
def q_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth banding: assign every order to its exact price quartile
    via broadcast boundaries and aggregate per band — the
    histogram-equalization pass behind balanced range partitioning and
    price-tier reporting (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
    the equivalence ``q_agg_percentiles`` established).

    Scale: ONE exact-percentile aggregation produces a 1-row boundary
    table broadcast to the scan (at unbounded scale swap in
    ``approx_percentile`` — same plan); banding is then a map-side CASE,
    and the shuffle carries 4 partial rows.  This is also exactly how a
    range-partitioner picks split points without a global sort.
    """
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    band = (
        F.when(F.col("o_totalprice") < F.col("q1"), "B1")
        .when(F.col("o_totalprice") < F.col("q2"), "B2")
        .when(F.col("o_totalprice") < F.col("q3"), "B3")
        .otherwise("B4")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.min("o_totalprice"), 2).alias("band_floor"),
        )
    )


@query(
    "q_customer_rfm",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                    CAST((SELECT max(o_orderdate) FROM orders) AS DATE))
                    AS BIGINT)                                  AS recency_d,
               CAST(count(*) AS BIGINT)                         AS freq,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT)                                  AS cents
        FROM orders GROUP BY o_custkey
    ),
    bounds AS (
        SELECT quantile_cont(recency_d, 0.25) AS r1,
               quantile_cont(recency_d, 0.50) AS r2,
               quantile_cont(recency_d, 0.75) AS r3,
               quantile_cont(freq, 0.25) AS f1,
               quantile_cont(freq, 0.50) AS f2,
               quantile_cont(freq, 0.75) AS f3,
               quantile_cont(cents, 0.25) AS m1,
               quantile_cont(cents, 0.50) AS m2,
               quantile_cont(cents, 0.75) AS m3
        FROM per_cust
    )
    SELECT CAST(5 - (1 + CAST(recency_d > r1 AS INT)
                       + CAST(recency_d > r2 AS INT)
                       + CAST(recency_d > r3 AS INT)) AS BIGINT) AS r_score,
           CAST(1 + CAST(freq > f1 AS INT) + CAST(freq > f2 AS INT)
                  + CAST(freq > f3 AS INT) AS BIGINT)            AS f_score,
           CAST(1 + CAST(cents > m1 AS INT) + CAST(cents > m2 AS INT)
                  + CAST(cents > m3 AS INT) AS BIGINT)           AS m_score,
           CAST(count(*) AS BIGINT)                              AS n_customers,
           CAST(sum(o_custkey) AS BIGINT)                        AS cust_checksum
    FROM per_cust, bounds
    GROUP BY 1, 2, 3
    """,
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1-4 on Recency (days since
    last order — lower is better, so the score inverts), Frequency, and
    Monetary (cent-exact lifetime spend) against corpus quartiles — the
    classic CRM segmentation grid, reported as per-(r,f,m)-cell counts.

    Determinism: metrics are exact integers; quartile boundaries come from
    one ``percentile`` aggregate (≡ DuckDB quantile_cont) and scores are
    pure integer comparisons against them.

    Scale: one keyed aggregation builds per-customer metrics, one 1-row
    boundary aggregate broadcasts back, scoring is map-side CASE
    arithmetic — no global sort, no ntile window over raw customers.
    """
    o = load_table(spark, sf_dir, "orders")
    hwm = o.agg(F.max("o_orderdate").alias("hwm"))
    per_cust = (
        o.join(F.broadcast(hwm))
        .groupBy("o_custkey")
        .agg(
            # date arithmetic, not epoch micros: o_orderdate arrives as
            # TIMESTAMP_NTZ from parquet and day-granularity diffs are
            # timezone-free on both engines.
            F.datediff(F.max(F.col("hwm").cast("date")),
                       F.max(F.col("o_orderdate").cast("date")))
            .cast("long").alias("recency_d"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long").alias("cents"),
        )
    )
    bounds = per_cust.agg(*[
        F.expr(f"percentile({m}, {q})").alias(f"{m[0]}{i}")
        for m in ("recency_d", "freq", "cents")
        for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
    ])

    def score(col, b):
        return (1 + (F.col(col) > F.col(f"{b}1")).cast("int")
                + (F.col(col) > F.col(f"{b}2")).cast("int")
                + (F.col(col) > F.col(f"{b}3")).cast("int"))

    return (
        per_cust.crossJoin(F.broadcast(bounds))
        .groupBy(
            (5 - score("recency_d", "r")).cast("long").alias("r_score"),
            score("freq", "f").cast("long").alias("f_score"),
            score("cents", "c").cast("long").alias("m_score"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("o_custkey").cast("long").alias("cust_checksum"),
        )
    )
