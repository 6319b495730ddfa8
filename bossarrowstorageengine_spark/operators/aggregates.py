"""B.4 aggregations (SURVEY.md §2.B4).

All aggregates lean on Catalyst's partial→shuffle→final planning (map-side
combine is automatic); at 100 TB the shuffle carries only per-group partial
states, never raw rows.  Group-by keys here are low-cardinality, so skew is
bounded; high-cardinality variants would rely on AQE skew handling
(session.py turns it on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                        AS sum_qty,
           round(sum(l_extendedprice), 2)                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4)                        AS avg_qty,
           count(*)                                         AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship hash aggregate — TPC-H Q1 shape.

    Catalyst plans HashAggregate(partial) → Exchange → HashAggregate(final);
    the shuffle moves 6 groups, not 600 k rows — the shape that scales to
    100 TB unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_custs,
           count(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate — planned as a two-phase expand/aggregate; the
    distinct key set shuffles, not the fact rows."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*)                 AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                   AS n_rows,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)  AS g_flag,
           grouping(l_linestatus)  AS g_status,
           count(*)                AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets with GROUPING() discriminators, via the SQL
    entry point (SURVEY.md §3.2 E2 — temp views make E1/E2 interchangeable)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT)  AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT)  AS g_status,
               count(*)                             AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 12
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)                 AS sd_qty,
           round(var_samp(l_quantity), 4)                    AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qty_price"),
    )


@query(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE                      AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++) — the sketch that replaces
    exact distinct at 100 TB (no giant distinct-key shuffle, fixed-size
    mergeable state).

    HLL++ estimates are engine-specific by design, so the EXACT-checkable
    face emits the exact distinct count plus a boolean asserting the HLL
    estimate (rsd=2%) landed within 5% of it — the oracle expects TRUE, so
    a broken sketch fails the hash, while the estimate's engine-specific
    value never enters the comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                < 0.05
            ).alias("within_5pct"),
        )
    )


@query(
    "q_agg_distinct_rows",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def q_agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@query(
    "q_agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_orderkey) AS BIGINT) AS band,
           CAST(bit_or(l_orderkey) AS BIGINT)  AS bor,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS bxor
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/bit_or/bit_xor) — partial+final like any
    hash aggregate; verified bit-identical to DuckDB."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_and(l_orderkey)").alias("band"),
        F.expr("bit_or(l_orderkey)").alias("bor"),
        F.expr("bit_xor(l_orderkey)").alias("bxor"),
    )


@query(
    "q_agg_argminmax",
    oracle="""
    SELECT o_orderpriority,
           CAST(arg_max(o_orderkey, o_totalprice) AS BIGINT) AS priciest_key,
           CAST(arg_min(o_orderkey, o_totalprice) AS BIGINT) AS cheapest_key,
           round(max(o_totalprice), 2) AS max_price,
           round(min(o_totalprice), 2) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argument-extrema aggregates: ``max_by``/``min_by`` (DuckDB
    ``arg_max``/``arg_min``) fetch a companion column's value at the
    group's extreme — one pass, no self-join or window.  Both engines
    leave ties implementation-defined; verified unique per-group extrema
    at every test SF, so the comparison is exact.  At scale this is a
    partial+final hash aggregate carrying one (value, ordering) pair per
    group — the cheap form of "row with the max" when only one companion
    column is needed (the struct-max idiom generalizes it to whole rows).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").cast("long").alias("priciest_key"),
        F.min_by("o_orderkey", "o_totalprice").cast("long").alias("cheapest_key"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


@query(
    "q_agg_histogram",
    oracle="""
    WITH bounds AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 10)), 9) AS BIGINT)
             AS bucket,
           CAST(count(*) AS BIGINT)     AS n_orders,
           round(min(o_totalprice), 2)  AS bucket_min,
           round(max(o_totalprice), 2)  AS bucket_max
    FROM orders, bounds
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 buckets over [min, max]): the binning
    expression ``least(floor((x-lo)/w), 9)`` is portable SQL (no engine
    histogram UDAF), with the max value clamped into the last bucket.

    Shape: min/max is a 1-row broadcast joined onto the fact scan — two
    passes over data but no driver round-trip; the bucket groupBy has 10
    keys, so the final aggregate is a trivial shuffle.  At 100 TB the
    bounds pass would be replaced by catalog/file-stats bounds (the
    arrowipc sidecars carry exactly these min/max values).
    """
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_totalprice").alias("lo"),
                   F.max("o_totalprice").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / 10
    return (
        o.join(F.broadcast(bounds))
        .groupBy(F.least(F.floor((F.col("o_totalprice") - F.col("lo")) / width),
                         F.lit(9)).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@query(
    "q_agg_heavy_hitters",
    oracle="""
    WITH per_user AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), thresh AS (
      SELECT avg(n) * 1.2 AS t FROM per_user
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events
    FROM per_user, thresh
    WHERE n > t
    """,
)
def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: keys whose frequency exceeds 1.2× the mean
    per-key count.  Shape: one keyed aggregate, then a 1-row broadcast of
    the threshold — no second scan of the fact table.  At 100 TB the same
    two-phase plan holds (the per-key aggregate is the only full shuffle);
    a sketch (count-min / Misra-Gries via mapInPandas) would replace it
    only when the key cardinality itself is unmanageable."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    thresh = per_user.agg((F.avg("n") * 1.2).alias("t"))
    return (
        per_user.join(F.broadcast(thresh))
        .filter(F.col("n") > F.col("t"))
        .select("user_id", F.col("n").cast("long").alias("n_events"))
    )


@query(
    "q_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a,
           b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
)
def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item co-occurrence (market-basket shape): users-per-unordered-pair of
    event types.  The self-join runs on the deduplicated (user, type) frame
    — both sides share the user_id partitioning, and the pair space is
    |types|^2, so the final aggregate is tiny no matter the input size."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "q_sketch_rollup",
    oracle="""
    SELECT lang,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_docs,
           TRUE                                   AS within_5pct
    FROM documents
    GROUP BY lang
    """,
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-(lang, source) HLL sketches of doc_id
    are UNIONED into per-lang estimates (``hll_sketch_agg`` →
    ``hll_union_agg``, the DataSketches pair) — the pre-aggregation
    pattern that makes distinct-count dashboards possible at 100 TB: raw
    data is sketched once at the finest grain, and every coarser rollup
    merges kilobyte sketches instead of rescanning rows.  The oracle
    checks the exact-companion column plus a within-5% bound on the
    estimate (HLL at lgK=12 carries ~1.6% standard error)."""
    d = load_table(spark, sf_dir, "documents")
    fine = d.groupBy("lang", "source").agg(
        F.expr("hll_sketch_agg(doc_id)").alias("sk"))
    merged = fine.groupBy("lang").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    exact = d.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("exact_docs"))
    return (
        exact.join(merged, "lang")
        .select(
            "lang", "exact_docs",
            (F.abs(F.col("est") - F.col("exact_docs"))
             <= 0.05 * F.col("exact_docs")).alias("within_5pct"),
        )
    )


@query(
    "q_incremental_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a stored per-key partial
    state (count, sum) built from the base 90% of events is merged with
    the partial state of a 10% delta batch — the merge re-aggregates two
    partial-state tables and never rescans base rows.

    The partial states are algebraic (counts and sums add), so refresh
    cost is O(|delta| + |MV|) instead of O(|base|): at 100 TB this is the
    difference between an hourly refresh touching gigabytes and one
    touching the whole corpus.  The oracle recomputes from scratch, so a
    hash match proves the incremental path equals the full recompute."""
    from bossarrowstorageengine_spark.operators.scans import _scratch

    ev = load_table(spark, sf_dir, "events")
    mv_path = _scratch(sf_dir, "incr_mv")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("p_count"),
            F.sum("value").alias("p_sum"),
        )

    # Build + store the MV from the base (in production this already
    # exists; rebuilding here makes the query self-contained).
    partial(ev.filter(F.col("event_id") % 10 != 0)) \
        .write.mode("overwrite").parquet(mv_path)
    mv = spark.read.parquet(mv_path)
    delta = partial(ev.filter(F.col("event_id") % 10 == 0))
    return (
        mv.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("p_count").cast("long").alias("n_events"),
            F.round(F.sum("p_sum"), 2).alias("sum_value"),
        )
    )


@query(
    "q_agg_approx_quantile",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
           round(quantile_cont(o_totalprice, 0.95), 2) AS exact_p95,
           TRUE AS within_2pct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) — the mergeable
    fixed-size quantile state that replaces exact percentile sorts at
    100 TB, companion to ``q_agg_approx_distinct``'s HLL.

    Sketch estimates are engine-specific, so the EXACT-checkable face
    emits the exact p50/p95 plus a boolean asserting the approx sketch
    (accuracy 10000) landed within 2% of each — the oracle expects TRUE,
    so a broken sketch fails the hash while the estimate's exact value
    never enters the comparison."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", [0.5, 0.95], 10000)
                .alias("approx"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        )
        .select(
            "o_orderpriority",
            F.round("p50", 2).alias("exact_p50"),
            F.round("p95", 2).alias("exact_p95"),
            (
                (F.abs(F.col("approx")[0] - F.col("p50")) / F.col("p50") < 0.02)
                & (F.abs(F.col("approx")[1] - F.col("p95")) / F.col("p95") < 0.02)
            ).alias("within_2pct"),
        )
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ),
    r AS (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM c
    )
    SELECT user_id,
           event_type           AS mode_event_type,
           CAST(n AS BIGINT)    AS mode_count
    FROM r WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode: each user's most frequent event type, ties
    broken by lexicographically smallest type (a deterministic MODE()
    WITHIN GROUP equivalent).

    Scale: the window runs over the (user, type) COUNT table — cardinality
    ≤ users × distinct types, tiny next to the event stream — so the
    expensive pass is a plain map-side-combine aggregation and the
    ordering never touches raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("n").cast("long").alias("mode_count"),
        )
    )
