"""B.5 window functions (SURVEY.md §2.B5).

Window execution shuffles once on the partition key, then sorts within
partitions — at 100 TB the partition key choice (o_orderstatus, user_id,
o_custkey) bounds per-task state; none of these windows is global/unbounded
over the whole table except via explicit low-cardinality partitions.

Tiebreak discipline (§8.3): every ORDER BY ends with a unique key.
Rank-family outputs are cast to long — Spark emits int32, DuckDB BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 50
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over (status, price DESC, key) with top-50 filter."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 50)
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic offsets per user ordered by (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER w, 2) AS moving_sum,
           round(avg(o_totalprice) OVER w, 4) AS moving_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frame: 3-row moving sum/avg per customer.

    Frames ≤3 rows keep the float-summation order identical in both engines
    (left-to-right over the same rows), so round() is safe here.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("moving_sum"),
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg"),
    )


@query(
    "q_win_frame_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(count(*) OVER w AS BIGINT) AS n_in_range
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
                 RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: count of rows within quantity
    distance 5.  COUNT (not float sum) keeps it order-insensitive."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(-5, Window.currentRow)
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        F.count(F.lit(1)).over(w).alias("n_in_range"),
    )


@query(
    "q_win_distribution",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           ntile(4) OVER w                 AS quartile
    FROM orders
    WHERE o_orderkey % 10 = 0
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution family: percent_rank / cume_dist / ntile(4)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q_win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS running_last_price
    FROM orders
    WHERE o_custkey % 5 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over a running frame."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 5 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("running_last_price"),
    )


@query(
    "q_win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the standard window+filter top-k idiom.
    At scale this is the shuffle-once alternative to a self-join max."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_frame_interval",
    oracle="""
    SELECT CAST(event_id AS BIGINT)     AS event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_10min,
           round(sum(value) OVER w, 2)  AS sum_10min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
    """,
)
def q_win_frame_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per-user rolling 10-minute count/sum.
    Value-based frames are deterministic without a tiebreak (equal
    timestamps share a frame), unlike ROWS frames (§8.3)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("win_interval_src")
    return spark.sql("""
        SELECT CAST(event_id AS BIGINT)        AS event_id,
               count(*) OVER w                 AS n_10min,
               round(sum(value) OVER w, 2)     AS sum_10min
        FROM win_interval_src
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
    """)


@query(
    "q_win_running_distinct",
    oracle="""
    WITH f AS (
        SELECT event_id, user_id, ts,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM events
        WHERE user_id % 4 = 0
    )
    SELECT event_id, user_id,
           CAST(sum(is_first) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS distinct_types_so_far
    FROM f
    """,
)
def q_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per user — how many distinct event types each
    user has touched as of each event.  Window engines reject DISTINCT in
    frames, so this uses the standard two-window rewrite: flag each
    (user, type)'s first occurrence, then running-sum the flags.

    Scale: both windows partition by user_id (the second by the same key),
    so there is ONE shuffle and per-key linear state — no per-row distinct
    set materializes anywhere.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 4 == 0)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_id", "user_id", "ts",
        (F.row_number().over(w_first) == 1).cast("int").alias("is_first"),
    )
    return flagged.select(
        "event_id", "user_id",
        F.sum("is_first").over(w_run).cast("long")
            .alias("distinct_types_so_far"),
    )


@query(
    "q_win_ratio_share",
    oracle="""
    WITH cents AS (
        SELECT o_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    shared AS (
        SELECT o_custkey, o_orderkey,
               (c * 1000000) // sum(c) OVER (PARTITION BY o_custkey)
                   AS share_ppm,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY c DESC, o_orderkey) AS rn
        FROM cents
    )
    SELECT o_custkey,
           CAST(o_orderkey AS BIGINT)  AS top_orderkey,
           CAST(share_ppm AS BIGINT)   AS share_ppm
    FROM shared WHERE rn = 1 AND share_ppm < 1000000
    """,
)
def q_win_ratio_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report window: each order's share of its customer's total
    spend (ppm), keeping the dominant order per customer — the
    concentration metric behind whale detection ("one order is 80% of the
    account").  Single-order customers (share = 100%) are excluded as
    trivially concentrated.

    Determinism: shares are integer ppm over cent-exact totals — the
    windowed sum is integer addition, so no float-summation-order drift;
    the per-customer winner has a total (value, key) tiebreak.

    Scale: one o_custkey shuffle serves BOTH window functions (same
    partition spec); per-key state is O(1).
    """
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        "o_custkey", "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    w = Window.partitionBy("o_custkey")
    wr = Window.partitionBy("o_custkey").orderBy(
        F.desc("c"), "o_orderkey")
    return (
        cents.select(
            "o_custkey", "o_orderkey",
            F.expr("c * 1000000").alias("scaled"),
            F.sum("c").over(w).alias("tot"),
            F.row_number().over(wr).alias("rn"),
        )
        .withColumn("share_ppm", F.expr("scaled div tot"))
        .filter((F.col("rn") == 1) & (F.col("share_ppm") < 1000000))
        .select(
            "o_custkey",
            F.col("o_orderkey").cast("long").alias("top_orderkey"),
            F.col("share_ppm").cast("long").alias("share_ppm"),
        )
    )



@query(
    "q_win_salted",
    oracle="""
    SELECT CAST(doc_id AS BIGINT)  AS doc_id,
           lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars)
                AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY lang ORDER BY n_chars)
                AS BIGINT) AS drnk,
           CAST((1000 * count(*) OVER (PARTITION BY lang ORDER BY n_chars
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                // (count(*) OVER (PARTITION BY lang)) AS BIGINT)
               AS cume_permille
    FROM documents
    """,
)
def q_win_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEW-SAFE windowed rank over a deliberately HOT partition key
    (SURVEY §7 round-12 runway item 4): per-``lang`` rank / dense_rank /
    cumulative-permille of every document by ``n_chars``.  ``lang`` has a
    handful of distinct values, so the naive
    ``Window.partitionBy("lang")`` serializes the whole corpus into a
    handful of tasks — the windowed twin of the condition
    ``q_agg_salted`` fixes for aggregation.

    Decomposition: rank(v) = 1 + count of rows with a smaller value,
    dense_rank(v) = ordinal of v among the key's DISTINCT values, and
    cume(v) = running count through v's full tie group — all functions
    of the per-(lang, value) COUNT TABLE, not of row order.  So phase 1
    aggregates by (lang, n_chars) — the VALUE spreads the hot key across
    the cluster, doing the job an explicit salt column does for
    q_agg_salted but exactly (a literal per-salt local rank cannot be
    offset-merged; per-value counts can) — phase 2 runs the window over
    that value-cardinality-bounded table, and phase 3 broadcast-joins
    the rank columns back to the corpus.  No task ever sees more than
    one (lang, value) group's rows in phase 1, and the only window runs
    over the distinct-value table.

    cume is integer permille ((1000·running) div total) so the division
    replays exactly in both engines (§8.8).

    Scale: phase 1 is one map-side-combinable shuffle on (lang, value);
    the window input is |distinct values per lang| rows (bounded by the
    value domain, independent of corpus size); the join back is
    broadcast.  The oracle is the NAIVE single-window SQL — same answer
    by the rank/count identities above.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    counts = d.groupBy("lang", "n_chars").agg(
        F.count(F.lit(1)).alias("cnt"))
    wv = Window.partitionBy("lang").orderBy("n_chars")
    w_all = Window.partitionBy("lang")
    offs = counts.select(
        "lang", "n_chars",
        (F.coalesce(
            F.sum("cnt").over(
                wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)) + 1).cast("long").alias("rnk"),
        F.row_number().over(wv).cast("long").alias("drnk"),
        F.sum("cnt").over(
            wv.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running"),
        F.sum("cnt").over(w_all).alias("total"),
    ).withColumn(
        "cume_permille",
        F.expr("(1000 * running) div total").cast("long"),
    ).drop("running", "total")
    return (
        d.join(F.broadcast(offs), ["lang", "n_chars"])
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
            "rnk", "drnk", "cume_permille",
        )
    )
