"""B.3 joins (SURVEY.md §2.B3).

Scale notes (100 TB design point):
- Dimension tables (region/nation/customer/supplier/part) are broadcast —
  explicitly hinted where the optimizer might not see the size, so the fact
  table never shuffles for those joins.
- Fact⋈fact (orders⋈lineitem shapes) shuffle on the join key; AQE handles
  skew splitting (session.py).
- The as-of join is a union + running-`last` window rather than a pairwise
  range join: one shuffle on (user_id), state linear in events — the same
  shape works as a streaming stateful op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_join_inner_hash",
    oracle="""
    SELECT c_mktsegment,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, orders⋈customer; Spark picks SMJ/SHJ under AQE."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT p_brand,
           count(*)                  AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join — the dimension ships to every executor, the fact
    table never shuffles.  The hint changes the plan, not the result."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: one fact⋈fact shuffle (lineitem⋈orders), everything
    else broadcast; region filter prunes before joining."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@query(
    "q_join_left_outer",
    oracle="""
    SELECT c_nationkey,
           count(*)                                                       AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_nationkey
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — unmatched customers survive with null order columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("long").alias("n_no_orders"),
        )
    )


@query(
    "q_join_full_outer",
    oracle="""
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, count(*) AS n_supp
          FROM supplier GROUP BY s_nationkey) s
    USING (nationkey)
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer/supplier counts — keys present
    on only one side survive with nulls on the other."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "nationkey", "full")
        .select("nationkey", "n_cust", "n_supp")
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_cust
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS) — probe side streams, no row multiplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_cust
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS) — customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT count(*)                              AS n_rows,
           CAST(sum(r_regionkey * 100 + n_nationkey) AS BIGINT) AS key_checksum
    FROM region CROSS JOIN nation
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (5 × 25) — cardinality + key checksum."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("r_regionkey") * 100 + F.col("n_nationkey"))
        .cast("long").alias("key_checksum"),
    )


@query(
    "q_join_theta_range",
    oracle="""
    SELECT s_nationkey,
           count(*)                           AS n_pairs,
           round(sum(c_acctbal - s_acctbal), 2) AS bal_gap
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    GROUP BY s_nationkey
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: the equi part (nationkey) executes as a hash join, the
    range residual (acctbal <) filters probe matches — so the non-equi
    condition costs no extra shuffle."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(F.col("c_acctbal") - F.col("s_acctbal")), 2).alias("bal_gap"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.user_id, p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS matched_err_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the most recent error at-or-before
    its timestamp for the same user.

    Spark has no native ASOF JOIN; rather than a pairwise range join
    (quadratic per user), union both streams and take a running
    ``last(err_ts, ignorenulls)`` over a (user_id, ts) window — one shuffle,
    linear state, and the same shape works incrementally under streaming.
    Errors sort before purchases at equal ts (prio 0 < 1) so an
    equal-timestamp error matches, mirroring DuckDB's ``>=`` bound.
    """
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(0).alias("prio"),
        F.col("ts").alias("err_ts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("prio"),
        F.lit(None).cast("timestamp").alias("err_ts"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "prio")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        err.unionByName(pur)
        .withColumn("matched_err_ts", F.last("err_ts", ignorenulls=True).over(w))
        .filter(F.col("prio") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("purchase_ts"),
            F.date_format("matched_err_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("matched_err_ts"),
        )
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH l AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk
        FROM customer
    ), r AS (
        SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS nk,
               n_name
        FROM nation
    )
    SELECT CAST(count(*) AS BIGINT)            AS n_rows,
           CAST(count(l.nk) AS BIGINT)         AS n_nonnull_keys,
           CAST(sum(c_custkey) AS BIGINT)      AS sum_cust
    FROM l JOIN r ON l.nk IS NOT DISTINCT FROM r.nk
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` ≡ ``IS NOT DISTINCT FROM``): NULL keys
    match each other instead of disappearing — still a hash join (the
    null bucket is just another key), unlike a ``=`` join with OR-IS-NULL
    fallbacks which degrades to nested-loop."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
         .otherwise(F.col("c_nationkey")).alias("nk"))
    n = load_table(spark, sf_dir, "nation").select(
        F.when(F.col("n_nationkey") % 5 == 0, None)
         .otherwise(F.col("n_nationkey")).alias("nk"),
        "n_name")
    joined = c.join(n, c.nk.eqNullSafe(n.nk))
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(c.nk).alias("n_nonnull_keys"),
        F.sum("c_custkey").cast("long").alias("sum_cust"),
    )


@query(
    "q_join_right_outer",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)   AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_no_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — the preserved side is the build-side mirror of
    q_join_left_outer (Spark plans it as the flipped left join)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey, "right")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
         .cast("long").alias("n_no_orders"),
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)  AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈fact join (``plans.salted_join``) — result-identical
    to the plain join (the oracle proves it), but no single reducer ever
    owns a hot key: the probe side gets a deterministic row-hash salt in
    [0, S), the build side is replicated S×, and the shuffle key becomes
    (l_orderkey, salt), splitting each hot orderkey across S reducers.
    S=8 here; at 100 TB, S is sized to cap the largest (key, salt) cell
    and salting targets only detected heavy hitters (AQE skew-split
    handles moderate skew; this is the explicit extreme-skew fallback)."""
    from bossarrowstorageengine_spark.plans import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "okey")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority")
    return (
        salted_join(li, o, "okey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
        )
    )


@query(
    "q_join_bloom",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 450000
    GROUP BY l_returnflag
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-bloom-filter-pruned fact⋈fact join: lineitem ⋈ the ~5% of
    orders with ``o_totalprice > 450000``.

    Catalyst's ``InjectRuntimeFilter`` builds a bloom filter over the
    filtered orders keys and pushes ``might_contain(l_orderkey)`` beneath
    the lineitem scan, so ~95% of the big side is dropped BEFORE the join
    shuffle instead of after it.  At 100 TB this is the difference between
    shuffling the whole fact table and shuffling the matching twentieth.

    session.py zeroes the application-side size threshold (default 10 GB)
    so scan size never vetoes the rule; the remaining gate is Spark's
    "probably a shuffle join" check — at toy SF the filtered orders side
    can broadcast by size, so the optimizer (correctly) skips the bloom
    filter, and at cluster scale, where neither side broadcasts, it fires.
    tests/test_plans.py locks exactly that: with broadcast disabled (the
    at-scale condition) the plan applies ``might_contain(bloom_filter_agg
    (o_orderkey..))`` under the lineitem side.  The ``merge`` hint keeps
    the benchmarked shape the at-scale one.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .hint("merge")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
        )
    )


@query(
    "q_join_shuffle_hash",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)  AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_quantity >= 30
    GROUP BY o_orderpriority
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join with an explicit SHUFFLE_HASH hint: when neither side
    broadcasts but one side's per-partition share fits in memory, a hash
    join skips BOTH sort passes a sort-merge join would pay — on a 100 TB
    fact⋈fact shuffle those sorts (and their spills) dominate the stage.

    The hint pins the physical strategy so the benchmarked shape is the
    at-scale choice regardless of AQE's size estimates at toy SF;
    tests/test_plans.py locks ``ShuffledHashJoin`` into the plan.  Join
    semantics (and the oracle) are unchanged — this query is the planner-
    control face of the join family, like ``q_join_bloom`` for runtime
    filters.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
    SELECT p.user_id, p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CASE WHEN e.ts IS NOT NULL
                     AND epoch_us(p.ts) - epoch_us(e.ts) <= 900 * 1000000
                THEN strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') END
               AS matched_err_ts,
           CASE WHEN e.ts IS NOT NULL
                     AND epoch_us(p.ts) - epoch_us(e.ts) <= 900 * 1000000
                THEN CAST((epoch_us(p.ts) - epoch_us(e.ts)) // 1000000
                          AS BIGINT) END
               AS gap_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: each purchase matches the most
    recent same-user error at-or-before it ONLY if that error is at most
    15 minutes old — the feature-store lookup rule ("use the latest
    reading unless it has gone stale").  Too-old matches become NULL, not
    the next-older error (ASOF-with-tolerance semantics).

    Scale: identical linear shape to ``q_join_asof`` — union both
    streams, one (user_id) shuffle, running ``last(ignorenulls)`` —
    plus a map-side gap test.  No pairwise range join at any size.
    """
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.lit(0).alias("prio"),
        F.col("ts").alias("err_ts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("prio"),
        F.lit(None).cast("timestamp").alias("err_ts"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "prio")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from bossarrowstorageengine_spark.operators.event_time import epoch_us

    gap_us = epoch_us(F.col("ts")) - epoch_us(F.col("matched_err_ts"))
    fresh = F.col("matched_err_ts").isNotNull() \
        & (gap_us <= 900 * 1_000_000)
    return (
        err.unionByName(pur)
        .withColumn("matched_err_ts",
                    F.last("err_ts", ignorenulls=True).over(w))
        .filter(F.col("prio") == 1)
        .select(
            "user_id", "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("purchase_ts"),
            F.when(fresh, F.date_format("matched_err_ts",
                                        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
                .alias("matched_err_ts"),
            F.when(fresh, (gap_us / 1_000_000).cast("long"))
                .alias("gap_seconds"),
        )
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH pur AS (
        SELECT user_id, event_id AS pid, ts AS pts FROM events
        WHERE event_type = 'purchase'
    ), err AS (
        SELECT user_id, event_id AS eid, ts AS ets FROM events
        WHERE event_type = 'error'
    ), cand AS (
        SELECT p.user_id, p.pid, p.pts, e.eid, e.ets,
               epoch_us(e.ets) - epoch_us(p.pts) AS gap_us
        FROM pur p JOIN err e ON p.user_id = e.user_id
        WHERE abs(epoch_us(e.ets) - epoch_us(p.pts)) <= 600000000
    ), best AS (
        SELECT * FROM (
            SELECT user_id, pid, pts, eid, gap_us,
                   row_number() OVER (PARTITION BY pid
                       ORDER BY abs(gap_us), gap_us, eid) AS rn
            FROM cand
        ) WHERE rn = 1
    )
    SELECT CAST(p.user_id AS BIGINT)  AS user_id,
           CAST(p.pid AS BIGINT)      AS event_id,
           strftime(p.pts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CAST(b.eid AS BIGINT)      AS matched_err_id,
           CAST(b.gap_us AS BIGINT)   AS gap_us
    FROM pur p LEFT JOIN best b ON p.pid = b.pid
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction = NEAREST with tolerance (the pandas
    ``merge_asof(direction='nearest')`` face; ``q_join_asof`` is backward,
    ``q_join_asof_tolerance`` backward-with-staleness-bound): each
    purchase matches the same-user error CLOSEST in time within ±10
    minutes, either side.  Tie between an earlier and later error at
    equal distance → the EARLIER one (gap ascending after abs(gap) — the
    pandas backward-preference convention), then lower event_id.

    Scale: nearest-direction cannot ride the union+running-last trick
    (matches may lie in the future), so candidates come from a BANDED
    equi-join: timestamps bucket by the tolerance width and each purchase
    probes its own + two adjacent buckets (3 candidate buckets, constant
    fan-out) — never a per-user cross join.  The per-purchase pick is a
    rank over the few in-band candidates; unmatched purchases survive via
    the final left join (an enrichment must never drop facts).
    """
    from bossarrowstorageengine_spark.operators.event_time import epoch_us

    TOL_US = 600 * 1_000_000
    ev = load_table(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"), epoch_us(F.col("ts")).alias("pus"))
    # integer div, not float /: epoch-µs values are ~2^50 and a double
    # quotient truncation could misplace an exact-boundary timestamp.
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("eid"),
        epoch_us(F.col("ts")).alias("eus"),
    ).withColumn("bucket", F.expr(f"eus div {TOL_US}"))
    pbucket = F.expr(f"pus div {TOL_US}")
    purx = pur.withColumn(
        "bucket", F.explode(F.array(pbucket - 1, pbucket, pbucket + 1)))
    gap = F.col("eus") - F.col("pus")
    cand = (purx.join(err, ["user_id", "bucket"])
            .withColumn("gap_us", gap)
            .filter(F.abs("gap_us") <= TOL_US))
    w = Window.partitionBy("pid").orderBy(
        F.abs("gap_us"), F.col("gap_us"), F.col("eid"))
    best = (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("pid", "eid", "gap_us"))
    return (
        pur.join(best, "pid", "left")
        .select(
            F.col("user_id").cast("long"),
            F.col("pid").cast("long").alias("event_id"),
            F.date_format("pts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("purchase_ts"),
            F.col("eid").cast("long").alias("matched_err_id"),
            F.col("gap_us").cast("long").alias("gap_us"),
        )
    )
