"""B.9 event-time / streaming-capable operators (SURVEY.md §2.B9).

Each query is declared with batch semantics (oracle-checkable); the same
transformations run under Structured Streaming via ``readStream`` — the
streaming harness in ``bossarrowstorageengine_spark.streaming`` exercises
that path in the pytest suite (watermarks, late data, state).

Scale: windowed aggregates shuffle on (window, keys); session windows
shuffle on user_id — per-key state is bounded by the gap/watermark, which is
exactly how the same plan holds on an unbounded 100 TB stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


def epoch_us(col) -> "F.Column":
    """Epoch microseconds of a TIMESTAMP column.

    Lives HERE (not at each call site) because ``unix_micros`` crashes or
    shifts on TIMESTAMP_NTZ input — the round-2 incident
    (tests/test_ts_robustness.py confines the fragile call to this module);
    callers must feed timestamps normalized by ``catalog.load_table``.
    """
    return F.unix_micros(col)


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*)                      AS n_events,
           round(sum(value), 2)          AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window × event_type.  Spark ``window()`` bucket start
    ≡ DuckDB ``time_bucket`` (§8.7, verified); emitted as an ISO string on
    both engines (dtype-exact compare).  Streaming variant adds
    ``withWatermark("ts", ...)`` — same aggregation code."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type", "n_events", "sum_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                    - k.k * INTERVAL '15 minutes',
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour length, 15 min slide — every event lands in
    exactly 4 windows; the oracle replays the 4 slide offsets explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type", "n_events", "sum_value",
        )
    )


@query(
    "q_stream_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    ), per_session AS (
        SELECT user_id, session_id,
               min(ts)  AS session_start,
               count(*) AS n_events
        FROM sess
        GROUP BY user_id, session_id
    )
    SELECT user_id,
           count(*)                                   AS n_sessions,
           CAST(sum(n_events) AS BIGINT)              AS n_events,
           CAST(sum(epoch_ms(session_start)) AS BIGINT) AS start_checksum_ms
    FROM per_session
    GROUP BY user_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-min inactivity gap) per user.

    Spark merges an event into the current session iff it starts strictly
    before session end (= prev ts + gap), i.e. a new session opens when
    ``ts - prev_ts >= gap``... empirically Spark uses ``>`` (gap-equal events
    merge); the oracle's gaps-and-islands uses the same strict ``>``.
    ``start_checksum_ms`` (sum of per-session start epochs) verifies the
    boundary placement, not just the counts.
    """
    ev = load_table(spark, sf_dir, "events")
    per_session = (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum(F.unix_millis(F.col("sw.start"))).cast("long").alias("start_checksum_ms"),
        )
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT user_id, event_type,
           CAST(min(event_id) AS BIGINT) AS first_event_id,
           count(*)                      AS n_dupes
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup: one row per (user_id, event_type), keeping min
    event_id (deterministic variant of streaming ``dropDuplicates``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").cast("long").alias("first_event_id"),
        F.count(F.lit(1)).alias("n_dupes"),
    )


@query(
    "q_stream_late",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts),
                    '%Y-%m-%d %H:%M:%S')          AS win_start,
           event_type,
           count(*)                               AS n_events
    FROM events, wm
    WHERE ts >= wm.wm
    GROUP BY 1, 2
    """,
)
def q_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark / late-data handling, batch-simulated.

    In streaming, ``withWatermark("ts", "1 hour")`` drops events arriving
    more than 1 h behind the max observed event time.  Batch simulation
    (this is also the declared oracle face): compute the terminal watermark
    (max ts − 1 h) and the tumbling-window aggregate over surviving events.
    The true micro-batch behavior (state eviction, append-mode emission) is
    asserted in the streaming pytest harness with a crafted late-event file
    sequence.
    """
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("wm"))
    return (
        ev.join(F.broadcast(wm))
        .filter(F.col("ts") >= F.col("wm"))
        .groupBy(F.window("ts", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type", "n_events",
        )
    )


@query(
    "q_stream_profile",
    oracle="""
    WITH totals AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT)               AS n_events,
             round(sum(value), 2)                   AS total_value,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type ASC) AS rn
      FROM events GROUP BY user_id, event_type
    )
    SELECT t.user_id, t.n_events, t.total_value, t.n_types,
           r.event_type AS top_type
    FROM totals t JOIN ranked r ON t.user_id = r.user_id AND r.rn = 1
    """,
)
def q_stream_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the ``transformWithStateInPandas`` stateful operator
    (``streaming.pipelines.user_event_profile``): per-user event count,
    value sum, distinct-type count, and modal event type (lexicographic
    tie-break).  In streaming mode the same builder maintains this profile
    incrementally in ValueState + MapState (Spark 4 StatefulProcessor);
    the batch plan here is what the oracle can check."""
    from bossarrowstorageengine_spark.streaming.pipelines import user_event_profile

    return user_event_profile(load_table(spark, sf_dir, "events"))


@query(
    "q_stream_interval_join",
    oracle="""
    SELECT v.user_id,
           CAST(v.event_id AS BIGINT)      AS view_id,
           CAST(epoch_us(v.ts) AS BIGINT)  AS view_us,
           CAST(c.event_id AS BIGINT)      AS click_id,
           CAST(epoch_us(c.ts) AS BIGINT)  AS click_us
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND c.ts >  v.ts
     AND c.ts <= v.ts + INTERVAL 2 HOUR
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle face of the STREAM-STREAM interval join (VERDICT r6 item
    4): the exact pair rows ``streaming.pipelines.view_click_followups``
    emits — each view matched to the same user's clicks in the following
    window — produced by calling the SAME builder on the batch events
    table, so the driver's DuckDB gate now covers the last
    harness-only streaming family (the watermarked streaming execution
    itself stays under tests/test_streaming.py's differential harness).

    The follow window is 2 hours here (the synthetic events table is
    sparse per user — a 5-minute window matches ~3 pairs at sf0.01,
    too few to gate on); timestamps ship as epoch MICROSECOND longs
    (both engines floor ns -> µs identically, catalog.load_table note).

    Scale: in batch this is a sort-merge equi-join on ``user_id`` with
    the interval as a residual predicate — per-user event counts bound
    the candidate set; the banded-bucket variant for heavy keys is
    ``q_join_range_events``.  In streaming, the watermark + interval let
    Spark evict join state past ``view_ts + follow`` (the builder's
    window parameter) — the property that makes the join runnable
    forever.
    """
    from bossarrowstorageengine_spark.streaming.pipelines import (
        view_click_followups,
    )

    ev = load_table(spark, sf_dir, "events")
    pairs = view_click_followups(ev, follow="2 hours")
    return pairs.select(
        "user_id",
        F.col("view_id").cast("long").alias("view_id"),
        epoch_us(F.col("view_ts")).cast("long").alias("view_us"),
        F.col("click_id").cast("long").alias("click_id"),
        epoch_us(F.col("click_ts")).cast("long").alias("click_us"),
    )


@query(
    "q_join_range_events",
    oracle="""
    SELECT e1.user_id,
           CAST(e1.event_id AS BIGINT)  AS view_id,
           CAST(count(*) AS BIGINT)     AS n_follow
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts >  e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
    WHERE e1.event_type = 'view' AND e2.event_type = 'click'
    GROUP BY e1.user_id, e1.event_id
    """,
)
def q_join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for each view, count clicks by the same user within the
    next 5 minutes.

    Scale path: a naive time-range join is a broadcast-nested-loop at
    worst.  Joining on (user_id, 5-minute bucket) — each left row probes
    its own AND the next bucket — turns it into an equi-join (hash
    shuffle on bounded keys) with the range predicate as a residual
    filter.  Bucket width = range width, so each row lands in exactly 2
    candidate buckets and the candidate set stays O(events-per-10-min).
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("view_id"),
                F.col("ts").alias("ts1"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("ts2"))
    )
    bucket = lambda c: (F.unix_timestamp(c) / 300).cast("long")
    # left row probes bucket b and b+1; right side keyed by its own bucket
    views_b = views.withColumn(
        "bkt", F.explode(F.array(bucket(F.col("ts1")),
                                 bucket(F.col("ts1")) + 1)))
    clicks_b = clicks.withColumn("bkt", bucket(F.col("ts2")))
    joined = views_b.join(clicks_b, ["user_id", "bkt"]).filter(
        (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 5 MINUTES")))
    return joined.groupBy("user_id", "view_id").agg(
        F.count(F.lit(1)).alias("n_follow"))


@query(
    "q_rollup_time",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d')    AS bucket_day,
           strftime(CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                         THEN date_trunc('hour', ts) END,
                    '%Y-%m-%d %H:%M:%S')                  AS bucket_hour,
           event_type,
           CAST(count(*) AS BIGINT)                       AS n_events,
           round(sum(value), 2)                           AS sum_value
    FROM events
    GROUP BY GROUPING SETS (
        (date_trunc('day', ts), date_trunc('hour', ts), event_type),
        (date_trunc('day', ts), event_type)
    )
    """,
)
def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hourly and daily
    continuous aggregates in one pass (GROUPING SETS share the scan and
    the partial aggregation; one shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_rollup_src")
    return spark.sql("""
        SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS bucket_day,
               date_format(CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                                THEN date_trunc('hour', ts) END,
                           'yyyy-MM-dd HH:mm:ss')               AS bucket_hour,
               event_type,
               CAST(count(*) AS BIGINT)                         AS n_events,
               round(sum(value), 2)                             AS sum_value
        FROM events_rollup_src
        GROUP BY GROUPING SETS (
            (date_trunc('day', ts), date_trunc('hour', ts), event_type),
            (date_trunc('day', ts), event_type)
        )
    """)


@query(
    "q_rollup_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
      FROM events
    ), days AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket_day
      FROM bounds
    ), actual AS (
      SELECT date_trunc('day', ts)  AS bucket_day,
             CAST(count(*) AS BIGINT) AS n_events,
             round(sum(value), 2)     AS sum_value
      FROM events GROUP BY 1
    )
    SELECT strftime(d.bucket_day, '%Y-%m-%d') AS bucket_day,
           COALESCE(a.n_events, 0)   AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM days d LEFT JOIN actual a USING (bucket_day)
    """,
)
def q_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily rollup (the ``time_bucket_gapfill`` idiom): every
    day between min and max event time appears, zero-filled when no events
    landed — downstream dashboards and window models need dense series.

    Spark shape: the day spine comes from ``sequence()`` over the global
    min/max (a 1-row broadcast — no driver round-trip), exploded to one
    row per day, left-joined to the actual daily aggregate.  At 100 TB the
    spine is ~years × 365 rows — broadcast side — while the aggregate
    shuffles once on the day bucket; gap density never touches the fact
    scan.
    """
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY")))
        .alias("bucket_day"))
    actual = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket_day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    return (
        F.broadcast(days).join(actual, "bucket_day", "left")
        .select(
            F.date_format("bucket_day", "yyyy-MM-dd").alias("bucket_day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


@query(
    "q_cdc_upsert",
    oracle="""
    WITH unioned AS (
      SELECT *, 0 AS is_change FROM events WHERE event_id % 2 = 0
      UNION ALL
      SELECT *, 1 AS is_change FROM events WHERE event_id % 2 = 1
    ), ranked AS (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM unioned
    )
    SELECT user_id, event_type,
           CAST(event_id AS BIGINT) AS last_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           round(value, 2)          AS last_value
    FROM ranked WHERE rn = 1
    """,
)
def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert / merge-latest: apply a change set to a base snapshot,
    keeping the newest version per key — the batch face of a Delta-style
    ``MERGE`` (keys here: ``(user_id, event_type)``; version order:
    ``(ts, event_id)``, the unique id making "latest" total).

    Shape: union(base, changes) → one shuffle on the key → window rn=1.
    At 100 TB the union never materializes — both legs stream into the
    same hash partitioning; AQE-coalesced output becomes the new snapshot
    (at which point you'd write it partitioned by a stable key prefix so
    the next merge co-locates).  Deletes would ride the same plan as
    tombstone rows filtered after rank.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 2 == 0)
    changes = ev.filter(F.col("event_id") % 2 == 1)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (
        base.unionByName(changes)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type",
            F.col("event_id").cast("long").alias("last_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
            F.round("value", 2).alias("last_value"),
        )
    )


@query(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t0
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t1
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_full_funnel
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): each stage keeps users
    whose first stage-N event strictly follows their first stage-(N-1)
    event.

    Shape: three keyed min-aggregates joined on user_id — every shuffle is
    on the same key, so at 100 TB one hash partitioning on user_id serves
    the whole funnel, and each stage's survivor set only shrinks (later
    joins are broadcast candidates under AQE)."""
    ev = load_table(spark, sf_dir, "events")

    def first_at(stage: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == stage)
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )

    v = first_at("view")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v.select("user_id", F.col("t").alias("t0")), "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t1"), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firstseen AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT CAST(f.cohort_date AS VARCHAR)     AS cohort_date,
           date_diff('day', f.cohort_date, a.d) AS day_offset,
           CAST(count(*) AS BIGINT)             AS n_active
    FROM firstseen f JOIN activity a ON f.user_id = a.user_id
    WHERE date_diff('day', f.cohort_date, a.d) IN (0, 1, 3, 7)
    GROUP BY f.cohort_date, day_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen date, counted on the
    days they return (offsets 0/1/3/7).

    Shape: both legs are keyed aggregates on user_id and join on user_id —
    one partitioning serves firstseen, activity, and the join; only the
    final (cohort_date, offset) rollup re-shuffles, and its cardinality is
    days x 4 regardless of input size."""
    ev = load_table(spark, sf_dir, "events")
    firstseen = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_date")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    off = F.datediff(F.col("d"), F.col("cohort_date"))
    return (
        firstseen.join(activity, "user_id")
        .filter(off.isin(0, 1, 3, 7))
        .groupBy(
            F.col("cohort_date").cast("string").alias("cohort_date"),
            off.cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "q_sessionize",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800000000
                         OR lag(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), numbered AS (
        SELECT user_id, ts_us,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marked
    )
    SELECT CAST(user_id AS BIGINT)            AS user_id,
           CAST(session_seq AS BIGINT)        AS session_seq,
           CAST(count(*) AS BIGINT)           AS n_events,
           CAST(min(ts_us) // 1000 AS BIGINT) AS start_ms,
           CAST((max(ts_us) - min(ts_us)) // 1000 AS BIGINT) AS duration_ms
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): per user, a new session
    starts when the gap to the previous event exceeds 30 minutes; emits one
    row per session with its ordinal, event count, start, and duration.
    The per-session face of ``q_stream_session`` (which rolls sessions up
    per user via ``session_window``), built on the classic running-sum-of-
    boundary-markers pattern that also powers funnels and CDC ordering.

    Timestamps are compared as integer epoch-µs on both engines, so the
    boundary predicate (strict ``>`` — gap-equal events merge) is exact.

    Scale: both windows partition by user_id — one shuffle, then fully
    parallel per-key linear scans; the session rollup re-uses the same
    partitioning (no second exchange of the corpus).  No global order
    exists anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ts_us = F.unix_micros("ts")
    marked = ev.select(
        "user_id", "event_id", ts_us.alias("ts_us")
    ).withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_seq",
        F.sum("is_new").over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("session_seq").cast("long").alias("session_seq"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("min(ts_us) div 1000").alias("start_ms"),
            F.expr("(max(ts_us) - min(ts_us)) div 1000").alias("duration_ms"),
        )
    )


#: Per-key state bound for event-pattern matching: at most this many events
#: (first-K in event-time order) serialize into one user's code string.
#: Results are exact for users at or under the cap; whale keys are matched
#: on their first-K prefix and marked ``truncated`` — an explicit answer
#: instead of a single task holding an unbounded string.
_EVENT_PATTERN_CAP = 4096


def _event_pattern_frame(ev: DataFrame, cap: int) -> DataFrame:
    """Core of q_event_pattern over an events frame (testable cap)."""
    code = (
        F.when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "purchase", "P")
        .when(F.col("event_type") == "signup", "S")
        .otherwise("E")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", F.struct("ts", "event_id").alias("ord"), code.alias("code"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("_total"),
    )
    seqs = (
        ranked.filter(F.col("_rn") <= cap)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "code"))),
                    lambda s: s.code), "").alias("seq"),
            F.max("_total").alias("n_events"),
        )
    )
    vp = F.regexp_count(F.col("seq"), F.lit("V[^E]*?P"))
    eb = F.regexp_count(F.col("seq"), F.lit("E+"))
    return (
        seqs.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n_events").cast("long").alias("n_events"),
            vp.cast("long").alias("n_view_to_purchase"),
            eb.cast("long").alias("n_error_bursts"),
            F.when(F.col("n_events") > cap, 1).otherwise(0)
            .cast("long").alias("truncated"),
        )
        .filter((F.col("n_view_to_purchase") > 0) | (F.col("n_error_bursts") > 0))
    )


@query(
    "q_event_pattern",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'V'
                               WHEN 'click' THEN 'C'
                               WHEN 'purchase' THEN 'P'
                               WHEN 'signup' THEN 'S'
                               ELSE 'E' END AS code,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS total
        FROM events
    ), seqs AS (
        SELECT user_id,
               string_agg(code, '' ORDER BY ts, event_id) AS seq,
               max(total) AS n_events
        FROM ranked WHERE rn <= {_EVENT_PATTERN_CAP}
        GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, 'V[^E]*?P')) AS BIGINT)
               AS n_view_to_purchase,
           CAST(len(regexp_extract_all(seq, 'E+')) AS BIGINT)
               AS n_error_bursts,
           CAST(CASE WHEN n_events > {_EVENT_PATTERN_CAP} THEN 1 ELSE 0 END
                AS BIGINT) AS truncated
    FROM seqs
    WHERE len(regexp_extract_all(seq, 'V[^E]*?P')) > 0
       OR len(regexp_extract_all(seq, 'E+')) > 0
    """,
)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (the MATCH_RECOGNIZE class, which
    Spark has no native operator for): per user, serialize the totally-
    ordered event history into a code string and count regex pattern
    occurrences — here view→purchase journeys not interrupted by an error
    (lazy ``V[^E]*?P``, non-overlapping), and error bursts (``E+``).

    The lazy quantifier makes each journey end at its FIRST purchase, so
    counting is insensitive to regex-engine longest-match differences —
    Java (Spark) and RE2 (DuckDB) agree by construction.

    Scale: one shuffle (user_id); the per-key sort is the window's
    external (spillable) sort, and only the first ``_EVENT_PATTERN_CAP``
    events per user survive into the collect/regex stage, so a whale key
    with 10^8 events costs a linear scan, never an unbounded in-memory
    string.  Whale keys report pattern counts over their first-K prefix
    with ``truncated = 1`` (exact for everyone else) — mirrored exactly
    in the oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    return _event_pattern_frame(ev, _EVENT_PATTERN_CAP)


@query(
    "q_cdc_scd2",
    oracle="""
    WITH changes AS (
        SELECT user_id, ts, event_id, value
        FROM events
        WHERE event_type = 'purchase' AND user_id % 5 = 0
    )
    SELECT CAST(user_id AS BIGINT)  AS user_id,
           round(value, 4)          AS value,
           CAST(epoch_ms(ts) AS BIGINT) AS effective_from_ms,
           CAST(COALESCE(epoch_ms(lead(ts) OVER w), -1) AS BIGINT)
                                    AS effective_to_ms,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2: turn a change log into validity
    intervals — each change row becomes a version effective from its own
    timestamp until the next change (open-ended for the current version).
    The warehouse-history counterpart to ``q_cdc_upsert`` (which keeps
    only the latest version).

    Scale: one shuffle (user_id), then a per-key linear ``lead`` pass; the
    history table this produces is exactly what ``q_join_asof`` probes.
    Total tiebreak (ts, event_id) makes interval edges deterministic.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 5 == 0))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.round("value", 4).alias("value"),
        F.unix_millis(F.col("ts")).cast("long").alias("effective_from_ms"),
        F.coalesce(F.unix_millis(nxt), F.lit(-1)).cast("long")
            .alias("effective_to_ms"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH mx AS (
        SELECT max(ts) AS max_ts FROM events
    ), iv AS (
        SELECT user_id,
               epoch_us(ts) AS s_us,
               epoch_us(COALESCE(lead(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id),
                                 (SELECT max_ts FROM mx))) AS e_us
        FROM events
        WHERE event_type = 'purchase' AND user_id % 7 = 0
    ), outage AS (
        SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hbin,
               count(*) AS n_errors
        FROM events WHERE event_type = 'error'
        GROUP BY 1 HAVING count(*) >= 5
    ), banded AS (
        SELECT iv.user_id, iv.s_us, o.hbin, o.n_errors
        FROM iv, unnest(range(iv.s_us // 3600000000,
                              (iv.e_us - 1) // 3600000000 + 1)) AS u(hb)
        JOIN outage o ON o.hbin = u.hb
        WHERE iv.e_us > iv.s_us
    )
    SELECT CAST(user_id AS BIGINT)              AS user_id,
           CAST(count(*) AS BIGINT)             AS n_overlaps,
           CAST(count(DISTINCT s_us) AS BIGINT) AS n_windows_hit,
           CAST(count(DISTINCT hbin) AS BIGINT) AS n_outage_hours,
           CAST(sum(n_errors) AS BIGINT)        AS err_exposure
    FROM banded
    GROUP BY user_id
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval OVERLAP join — which per-user purchase validity
    windows intersect corpus-wide outage windows (hours with ≥5 error
    events).  The general no-equi-key overlap join, solved by BANDING:
    each validity interval explodes into the integer hour bins it covers,
    outage windows are hour-aligned (exactly one bin each), and the
    overlap reduces to an EQUI-join on the bin — no cross product, no
    nested-loop theta join anywhere in the plan.

    Scale: banding duplication is interval_length / bin_size per row (pick
    the bin so typical intervals cover a handful of bins); the join is a
    plain shuffled hash join on the bin key, and the outage side is tiny
    (aggregated hours), so Spark broadcasts it.  Validity windows come
    from a per-user ``lead`` (one user_id shuffle, linear per-key state).
    """
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("max_ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 7 == 0))
        .withColumn("nxt", F.lead("ts").over(w))
        .crossJoin(F.broadcast(max_ts))
        .select(
            "user_id",
            F.unix_micros("ts").alias("s_us"),
            F.unix_micros(F.coalesce("nxt", "max_ts")).alias("e_us"),
        )
        .filter(F.col("e_us") > F.col("s_us"))
    )
    hour_us = 3_600_000_000
    outage = (
        ev.filter(F.col("event_type") == "error")
        .groupBy((F.unix_micros("ts") / hour_us).cast("long").alias("hbin"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .filter(F.col("n_errors") >= 5)
    )
    banded = (
        iv.select(
            "user_id", "s_us",
            F.explode(F.sequence(
                (F.col("s_us") / hour_us).cast("long"),
                ((F.col("e_us") - 1) / hour_us).cast("long"),
            )).alias("hbin"),
        )
        .join(F.broadcast(outage), "hbin")
    )
    return banded.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.count_distinct("s_us").alias("n_windows_hit"),
        F.count_distinct("hbin").alias("n_outage_hours"),
        F.sum("n_errors").cast("long").alias("err_exposure"),
    )


@query(
    "q_user_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               (CAST(ts AS DATE) - DATE '1970-01-01') AS d
        FROM events
    ),
    isl AS (
        SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, count(*) AS len
        FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT)  AS n_active_days,
           CAST(max(len) AS BIGINT)  AS max_streak,
           CAST(count(*) AS BIGINT)  AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user (the retention/DAU-streak
    metric): longest run of back-to-back active days, total active days,
    and number of distinct streaks — via the gaps-and-islands trick on
    integer epoch days (``day − row_number`` is constant within a run).

    Scale: distinct (user, day) first — the shuffle carries active-day
    rows, not raw events — then a user-partitioned window and two keyed
    aggregations; all integer arithmetic, no date-string parsing.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.max("len").cast("long").alias("max_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


@query(
    "q_rollup_interpolate",
    oracle="""
    WITH actual AS (
        SELECT event_type,
               (CAST(ts AS DATE) - DATE '1970-01-01') AS d,
               avg(value) AS v
        FROM events
        WHERE event_id % 4 = 0
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(d) AS lo, max(d) AS hi
        FROM actual GROUP BY event_type
    ),
    spine AS (
        SELECT event_type, unnest(range(lo, hi + 1)) AS d
        FROM bounds
    ),
    joined AS (
        SELECT s.event_type, s.d, a.v
        FROM spine s LEFT JOIN actual a USING (event_type, d)
    ),
    ctx AS (
        SELECT event_type, d, v,
               last_value(v IGNORE NULLS) OVER w_prev  AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
                   OVER w_prev                         AS pd,
               first_value(v IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
                   OVER w_next                         AS nd
        FROM joined
        WINDOW
          w_prev AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_next AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           CAST(d AS BIGINT) AS epoch_day,
           CASE WHEN v IS NOT NULL THEN 'actual' ELSE 'interp' END AS src,
           round(CASE WHEN v IS NOT NULL THEN v
                      ELSE pv + (nv - pv) * (d - pd) / (nd - pd)
                 END, 4) AS value
    FROM ctx
    """,
)
def q_rollup_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily rollup with LINEAR INTERPOLATION (the
    ``interpolate()`` half of the timeseries gapfill idiom —
    ``q_rollup_gapfill`` zero-fills, this draws the line between the
    neighboring actual points): per event type, every day between its
    first and last active day carries either the actual daily mean or the
    linear interpolation between the surrounding actuals.

    Interior gaps always have both neighbors (the spine is bounded by
    per-type min/max active days), so no edge extrapolation arises.

    Scale: the spine explodes from a per-type (lo, hi) bound table, and the
    daily aggregate it left-joins (one shuffle on the day bucket upstream)
    is type×days-sized — broadcastable at any fact scale; the prev/next
    context comes from two frames over the SAME type-partitioned ordering
    (one shuffle), carrying forward only (value, day) scalars — linear
    state, the running-fill shape that survives any gap density.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 0)
    actual = (
        ev.groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
                .alias("d"))
        .agg(F.avg("value").alias("v"))
    )
    bounds = actual.groupBy("event_type").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("d"))
    joined = spine.join(F.broadcast(actual), ["event_type", "d"], "left")
    w_prev = (Window.partitionBy("event_type").orderBy("d")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy("event_type").orderBy("d")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    day_if_actual = F.when(F.col("v").isNotNull(), F.col("d"))
    ctx = joined.select(
        "event_type", "d", "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(day_if_actual, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(day_if_actual, ignorenulls=True).over(w_next).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) \
        * (F.col("d") - F.col("pd")) / (F.col("nd") - F.col("pd"))
    return ctx.select(
        "event_type",
        F.col("d").cast("long").alias("epoch_day"),
        F.when(F.col("v").isNotNull(), F.lit("actual"))
            .otherwise(F.lit("interp")).alias("src"),
        F.round(F.when(F.col("v").isNotNull(), F.col("v"))
                .otherwise(interp), 4).alias("value"),
    )


@query(
    "q_session_paths",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800000000
                         OR lag(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), numbered AS (
        SELECT user_id, event_id, event_type, ts_us,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM marked
    ), paths AS (
        SELECT user_id, session_seq,
               string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
        FROM numbered
        GROUP BY user_id, session_seq
    )
    SELECT path,
           CAST(count(*) AS BIGINT)               AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 25
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: the top-25 within-session event-type
    sequences (`view>click>purchase`-style paths) by session count — the
    navigation-pattern report built on the same gaps-and-islands
    sessionization as ``q_sessionize``.

    Determinism: the path string is ordered by (ts, event_id) — a total
    order — on both engines (`array_sort` of (ts_us, event_id, type)
    structs here, ordered `string_agg` in the oracle).

    Scale: one user_id shuffle for the session windows, one
    (user, session) aggregation whose state is the session's own events
    (bounded by session length, not history), a path-keyed count, and
    TakeOrdered top-k.  A whale session would bound via the same first-K
    cap as `q_event_pattern`.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", "event_id", "event_type",
        epoch_us(F.col("ts")).alias("ts_us"),
        F.when(
            (epoch_us(F.col("ts"))
             - F.lag(epoch_us(F.col("ts"))).over(w) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(), 1).otherwise(0).alias("is_new"),
    )
    w_run = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    numbered = marked.withColumn(
        "session_seq", F.sum("is_new").over(w_run))
    paths = (
        numbered.groupBy("user_id", "session_seq")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("ts_us", "event_id", "event_type"))),
                lambda s: s["event_type"]),
            ">").alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(25)
    )


@query(
    "q_churn_cohorts",
    oracle="""
    WITH corpus AS (SELECT max(ts) AS mx FROM events),
    activity AS (
        SELECT user_id,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT strftime(date_trunc('day', first_ts), '%Y-%m-%d') AS cohort_day,
           CASE WHEN epoch_us(c.mx) - epoch_us(a.last_ts)
                     > CAST(72 AS BIGINT) * 3600 * 1000000
                THEN 'churned' ELSE 'active' END AS status,
           CAST(count(*) AS BIGINT)        AS n_users,
           CAST(sum(n_events) AS BIGINT)   AS n_events
    FROM activity a, corpus c
    GROUP BY 1, 2
    """,
)
def q_churn_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn segmentation by acquisition cohort: users whose last activity
    is more than 72 h behind the corpus high-water mark are churned;
    reported per first-seen day — the lifecycle report behind retention
    dashboards (the cohort face of ``q_cohort_retention``'s grid).

    Scale: one keyed min/max/count aggregation per user (map-side
    combined), a 1-row broadcast high-water mark, and a cohort×status
    rollup — no windows over raw events, no driver collects.
    """
    ev = load_table(spark, sf_dir, "events")
    activity = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    mx = ev.agg(F.max("ts").alias("mx"))
    churned = (
        epoch_us(F.col("mx")) - epoch_us(F.col("last_ts"))
        > 72 * 3600 * 1_000_000)
    return (
        activity.crossJoin(F.broadcast(mx))
        .select(
            F.date_format(F.date_trunc("day", "first_ts"), "yyyy-MM-dd")
                .alias("cohort_day"),
            F.when(churned, F.lit("churned")).otherwise(F.lit("active"))
                .alias("status"),
            "n_events",
        )
        .groupBy("cohort_day", "status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
    )


@query(
    "q_dedup_within_window",
    oracle="""
    WITH bucketed AS (
        SELECT user_id, event_type, ts, event_id, value,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hbin
        FROM events
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type, hbin
                   ORDER BY ts, event_id) AS rn
        FROM bucketed
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT)        AS n_kept,
           CAST(sum(event_id) AS BIGINT)   AS kept_id_checksum,
           round(sum(value), 2)            AS kept_value_sum
    FROM ranked WHERE rn = 1
    GROUP BY user_id, event_type
    """,
)
def q_dedup_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed deduplication: keep the FIRST event per
    (user, type) within each 1-hour bucket — the batch face of streaming
    ``dropDuplicatesWithinWatermark`` (dedup state that expires instead of
    growing forever, the only dedup that is viable on an unbounded
    stream).  ``q_stream_dedup`` keeps one row per key EVER; this keeps
    one per key per window.

    Scale: one (user, type, bucket) window with linear per-key state; in
    streaming the same keys + a watermark bound the state store size to
    active windows.  Checksums pin WHICH representative survived.
    """
    ev = load_table(spark, sf_dir, "events")
    # Floor division, matching the oracle's `//`: plain `/` + cast('long')
    # truncates toward zero, which mis-buckets pre-1970 timestamps.  The
    # pmod form stays in integer arithmetic (no double rounding near bucket
    # boundaries): e - pmod(e, B) is e rounded DOWN to a multiple of B.
    e = epoch_us(F.col("ts"))
    bucket = F.lit(3600 * 1_000_000)
    hbin = ((e - F.pmod(e, bucket)) / bucket).cast("long")
    w = Window.partitionBy("user_id", "event_type", "hbin").orderBy(
        "ts", "event_id")
    return (
        ev.withColumn("hbin", hbin)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("event_id").cast("long").alias("kept_id_checksum"),
            F.round(F.sum("value"), 2).alias("kept_value_sum"),
        )
    )


@query(
    "q_event_attribution",
    oracle="""
    WITH seq AS (
        SELECT event_id, user_id, event_type, ts, value,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN ts END IGNORE NULLS)
                   OVER w AS attr_ts,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS)
                   OVER w AS attr_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT COALESCE(CASE WHEN epoch_us(ts) - epoch_us(attr_ts)
                              <= 604800000000
                         THEN attr_type END, 'none') AS channel,
           CAST(count(*) AS BIGINT)                  AS n_purchases,
           round(sum(value), 2)                      AS attributed_value
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent preceding click/view within a 7-day lookback, else 'none' — the
    marketing-analytics workhorse that joins conversions to touchpoints
    WITHOUT a self-join (one ordered pass per user).

    Scale: a single per-user window (``last(..., ignorenulls=True)`` over
    rows-preceding) carries the candidate touchpoint forward — state is
    O(1) per user regardless of history length, the exact shape streaming
    attribution uses; the aggregation shuffle carries only per-channel
    partials.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.col("event_type").isin("click", "view")
    seq = ev.select(
        "event_id", "user_id", "event_type", "ts", "value",
        F.last(F.when(touch, F.col("ts")), ignorenulls=True)
            .over(w).alias("attr_ts"),
        F.last(F.when(touch, F.col("event_type")), ignorenulls=True)
            .over(w).alias("attr_type"),
    )
    within = (epoch_us(F.col("ts")) - epoch_us(F.col("attr_ts"))
              <= 7 * 86400 * 1_000_000)
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.when(within, F.col("attr_type")),
                            F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@query(
    "q_rollup_multi_grain",
    oracle="""
    WITH d AS (
        SELECT event_type, value,
               strftime(date_trunc('day', ts),
                        '%Y-%m-%d %H:%M:%S') AS day_b,
               strftime(date_trunc('hour', ts),
                        '%Y-%m-%d %H:%M:%S') AS hour_b
        FROM events
    )
    SELECT event_type, day_b, hour_b,
           CAST(grouping(day_b) AS BIGINT)  AS g_day,
           CAST(grouping(hour_b) AS BIGINT) AS g_hour,
           CAST(count(*) AS BIGINT)  AS n_events,
           round(sum(value), 2)      AS sum_value
    FROM d
    GROUP BY GROUPING SETS (
        (event_type, day_b, hour_b), (event_type, day_b), (event_type))
    """,
)
def q_rollup_multi_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hourly, daily, and
    per-type-total aggregates of the event stream in ONE scan via GROUPING
    SETS — the rollup tree a continuous-aggregate store maintains, produced
    without three passes.

    Scale: Catalyst's Expand replicates rows per grouping set BEFORE the
    partial aggregate, so the shuffle carries only (hours + days + types)
    group states — time-bucket cardinality, never event cardinality.  The
    grouping flags disambiguate grain levels for downstream readers.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type", "value",
        F.date_format(F.date_trunc("day", "ts"),
                      "yyyy-MM-dd HH:mm:ss").alias("day_b"),
        F.date_format(F.date_trunc("hour", "ts"),
                      "yyyy-MM-dd HH:mm:ss").alias("hour_b"),
    )
    return (
        d.groupingSets(
            [["event_type", "day_b", "hour_b"],
             ["event_type", "day_b"],
             ["event_type"]],
            "event_type", "day_b", "hour_b")
        .agg(
            F.grouping("day_b").cast("long").alias("g_day"),
            F.grouping("hour_b").cast("long").alias("g_hour"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "q_event_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT)     AS n_hours,
               CAST(sum(cnt) AS BIGINT)     AS s,
               CAST(sum(cnt * cnt) AS BIGINT) AS ss
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type,
           max(st.n_hours)                                   AS n_hours,
           CAST(sum(CASE WHEN abs(h.cnt - CAST(st.s AS DOUBLE) / st.n_hours)
                         > 2 * sqrt((st.ss - CAST(st.s AS DOUBLE) * st.s
                                     / st.n_hours) / st.n_hours)
                    THEN 1 ELSE 0 END) AS BIGINT)            AS n_anomalies,
           CAST(max(h.cnt) AS BIGINT)                        AS max_hourly,
           round(max(CAST(st.s AS DOUBLE) / st.n_hours), 4)  AS mean_hourly
    FROM hourly h JOIN stats st USING (event_type)
    GROUP BY h.event_type
    """,
)
def q_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly detection on event rates: flag hours whose count
    deviates from the type's hourly mean by more than 2 population standard
    deviations — the ops-monitoring pass behind rate alerts.

    Determinism: the hourly counts are integers, so Σcnt and Σcnt² are
    exact; mean/σ derive from them in a FIXED expression (no float
    accumulation across partitions), making the 2σ comparison
    engine-identical without rounding tricks.

    Scale: events reduce to (type, hour) counts (map-side combine); the
    per-type stats table is type-cardinality-sized and broadcast back —
    two aggregations, one broadcast join, nothing row-scale after the
    first reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_hours")
    var = (F.col("ss") - F.col("s").cast("double") * F.col("s")
           / F.col("n_hours")) / F.col("n_hours")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_hours").cast("long").alias("n_hours"),
            F.sum(
                (F.abs(F.col("cnt") - mean) > 2 * F.sqrt(var)).cast("int")
            ).cast("long").alias("n_anomalies"),
            F.max("cnt").cast("long").alias("max_hourly"),
            F.round(F.max(mean), 4).alias("mean_hourly"),
        )
    )


@query(
    "q_data_freshness",
    oracle="""
    WITH hw AS (SELECT max(ts) AS hwm FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT)                          AS n_events,
           CAST(epoch_us(max(ts)) AS BIGINT)                 AS latest_us,
           CAST((epoch_us(hw.hwm) - epoch_us(max(ts))) // 1000000
                AS BIGINT)                                   AS staleness_sec,
           CAST(sum(CASE WHEN ts >= hw.hwm - INTERVAL 1 HOUR
                    THEN 1 ELSE 0 END) AS BIGINT)            AS n_last_hour
    FROM events, hw
    GROUP BY event_type, hw.hwm
    """,
)
def q_data_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-freshness SLA report: per event type, how far its newest
    event lags the corpus high-water mark and how much volume arrived in
    the final hour — the first dashboard a streaming pipeline's operator
    reads (a type with growing staleness = a stuck upstream producer).

    Scale: the high-water mark is a 1-row aggregate broadcast into a
    single map-side-combined per-type aggregation — two passes, no
    windows, no per-event state.
    """
    ev = load_table(spark, sf_dir, "events")
    hw = ev.agg(F.max("ts").alias("hwm"))
    lag_sec = ((epoch_us(F.col("hwm")) - epoch_us(F.max("ts")))
               / 1_000_000).cast("long")
    return (
        ev.join(F.broadcast(hw))
        .groupBy("event_type", "hwm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            epoch_us(F.max("ts")).cast("long").alias("latest_us"),
            lag_sec.alias("staleness_sec"),
            F.sum((F.col("ts") >= F.col("hwm") - F.expr("INTERVAL 1 HOUR"))
                  .cast("int")).cast("long").alias("n_last_hour"),
        )
        .drop("hwm")
    )


@query(
    "q_trend_linreg",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_us(date_trunc('hour', ts)) // 3600000000
                    AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    rebased AS (
        SELECT event_type,
               h - min(h) OVER (PARTITION BY event_type) AS x, y
        FROM hourly
    ),
    sums AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT)     AS n,
               CAST(sum(x) AS BIGINT)       AS sx,
               CAST(sum(y) AS BIGINT)       AS sy,
               CAST(sum(x * y) AS BIGINT)   AS sxy,
               CAST(sum(x * x) AS BIGINT)   AS sxx
        FROM rebased GROUP BY event_type
    )
    SELECT event_type, n AS n_hours,
           CAST(floor(1000000.0 * (n * sxy - sx * sy)
                      / (n * sxx - sx * sx)) AS BIGINT)
               AS slope_micro_per_hour,
           sy AS total_events
    FROM sums WHERE n * sxx - sx * sx != 0
    """,
)
def q_trend_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event-rate trend: closed-form least-squares slope of
    hourly counts over time — the capacity-planning signal ("error rate is
    growing N events/hour²").  Types with a degenerate x-spread are
    excluded (undefined slope).

    Determinism: x (rebased hour index) and y (hourly count) are exact
    integers, so all five regression sums are order-independent integer
    adds; the slope is ONE double division truncated to micro-units.

    Scale: events reduce to (type, hour) counts map-side; the per-type
    min-hour rebase is a window over the tiny hourly table; regression
    sums are one more keyed aggregation.  The closed form needs no
    iteration and no driver math.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
            .cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = Window.partitionBy("event_type")
    rebased = hourly.select(
        "event_type",
        (F.col("h") - F.min("h").over(w)).alias("x"), "y")
    sums = rebased.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.filter(den != 0).select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.floor(1000000.0 * num / den).cast("long")
            .alias("slope_micro_per_hour"),
        F.col("sy").alias("total_events"),
    )


@query(
    "q_event_pattern_alt",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'V'
                               WHEN 'click' THEN 'C'
                               WHEN 'purchase' THEN 'P'
                               WHEN 'signup' THEN 'S'
                               ELSE 'E' END AS code,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), seqs AS (
        SELECT user_id,
               string_agg(code, '' ORDER BY ts, event_id) AS seq
        FROM ranked WHERE rn <= {_EVENT_PATTERN_CAP}
        GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(len(regexp_extract_all(seq, '(V|C)+P')) AS BIGINT)
               AS n_browse_purchase,
           CAST(len(regexp_extract_all(seq, 'SC{{2,}}')) AS BIGINT)
               AS n_signup_engage,
           CAST(len(regexp_extract_all(seq, 'P[VC]*?P')) AS BIGINT)
               AS n_repeat_purchase
    FROM seqs
    WHERE len(regexp_extract_all(seq, '(V|C)+P')) > 0
       OR len(regexp_extract_all(seq, 'SC{{2,}}')) > 0
       OR len(regexp_extract_all(seq, 'P[VC]*?P')) > 0
    """,
)
def q_event_pattern_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style patterns with ALTERNATION and bounded
    QUANTIFIERS (SURVEY §7 runway — extends ``q_event_pattern``'s single
    symbol classes): per user, three quantified journey patterns over the
    serialized event-code history —

    - ``(V|C)+P``: a browse burst (one or more views OR clicks, the
      alternation) converting to a purchase; greedy is deterministic here
      because the alternation's alphabet excludes the terminator.
    - ``SC{{2,}}``: signup followed immediately by 2+ clicks (bounded
      quantifier — the "engaged onboarding" signal).
    - ``P[VC]*?P``: repeat purchase with only browsing between (LAZY so
      each match ends at the FIRST next purchase — non-overlapping
      counting then tiles maximal purchase chains as P..P pairs, the
      same insensitivity trick q_event_pattern relies on).

    Java regex (Spark) and RE2-style (DuckDB) agree on all three by
    construction: no backreferences, terminators excluded from the
    repeated classes, lazy quantifiers only where both engines scan
    left-to-right to the first terminator.

    Scale: identical shape to ``q_event_pattern`` — one user_id shuffle,
    spillable per-key sort, first-``cap`` prefix bound on the
    collect/regex stage (whale keys cost a linear scan, never an
    unbounded string)."""
    ev = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "purchase", "P")
        .when(F.col("event_type") == "signup", "S")
        .otherwise("E")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", F.struct("ts", "event_id").alias("ord"),
        code.alias("code"),
        F.row_number().over(w).alias("_rn"),
    )
    seqs = (
        ranked.filter(F.col("_rn") <= _EVENT_PATTERN_CAP)
        .groupBy("user_id")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "code"))),
                lambda s: s.code), "").alias("seq"))
    )
    bp = F.regexp_count(F.col("seq"), F.lit("(V|C)+P"))
    se = F.regexp_count(F.col("seq"), F.lit("SC{2,}"))
    rp = F.regexp_count(F.col("seq"), F.lit("P[VC]*?P"))
    return (
        seqs.select(
            F.col("user_id").cast("long").alias("user_id"),
            bp.cast("long").alias("n_browse_purchase"),
            se.cast("long").alias("n_signup_engage"),
            rp.cast("long").alias("n_repeat_purchase"),
        )
        .filter((F.col("n_browse_purchase") > 0)
                | (F.col("n_signup_engage") > 0)
                | (F.col("n_repeat_purchase") > 0))
    )


@query(
    "q_win_session_gap",
    oracle="""
    WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
    ), marked AS (
        SELECT event_id, user_id, ts_us,
               (ts_us - lag(ts_us) OVER w) // 1000 AS gap_ms,
               CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), numbered AS (
        SELECT *, sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq,
               count(*) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
                   AS n_burst_5min
        FROM marked
    )
    SELECT event_id, user_id,
           CAST(gap_ms AS BIGINT)       AS gap_ms,
           CAST(session_seq AS BIGINT)  AS session_seq,
           CAST(row_number() OVER ws AS BIGINT) AS pos_in_session,
           CAST(count(*) OVER (PARTITION BY user_id, session_seq)
                AS BIGINT)              AS session_events,
           CAST((max(ts_us) OVER (PARTITION BY user_id, session_seq)
                 - min(ts_us) OVER (PARTITION BY user_id, session_seq))
                // 1000 AS BIGINT)      AS session_ms,
           CAST(n_burst_5min AS BIGINT) AS n_burst_5min
    FROM numbered
    WINDOW ws AS (PARTITION BY user_id, session_seq
                  ORDER BY ts_us, event_id)
    """,
)
def q_win_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT gaps-and-islands annotation (the window-family face of
    sessionization, where ``q_sessionize`` rolls islands up): each event
    carries its gap to the previous event, its session ordinal (new
    island when the gap exceeds 30 minutes, strict ``>`` so gap-equal
    events merge — §8.7), its position and the island's size/span via a
    second window over (user, session), and a value-based RANGE frame
    over event time — events in the trailing 5 minutes (``n_burst_5min``,
    the burst signal a rate-limit audit reads alongside session
    boundaries).

    Determinism: all arithmetic is integer epoch-µs (``unix_micros``
    both engines); the RANGE frame orders by the µs value itself, so
    equal timestamps share a frame with no tiebreak needed (§8.3), and
    every ROWS window ends with the unique event_id.

    Scale: every window partitions by user_id (the island windows by
    (user_id, session_seq), a refinement) — ONE shuffle on user_id then
    per-key linear scans; the RANGE frame keeps O(window-span) state per
    key.  No global order anywhere.
    """
    return _session_gap_annotate(
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts"))


def _session_gap_annotate(ev: DataFrame) -> DataFrame:
    """Core of :func:`q_win_session_gap` over any
    ``(event_id, user_id, ts)`` frame — factored so the STREAMING face
    (``streaming.pipelines.session_gap_annotate``) can use it as its
    batch twin and its differential oracle."""
    ev = ev.select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lag_us = F.lag("ts_us").over(w)
    marked = ev.select(
        "event_id", "user_id", "ts_us",
        F.expr("ts_us - lag(ts_us) OVER (PARTITION BY user_id "
               "ORDER BY ts_us, event_id)").alias("gap_us"),
        F.when(lag_us.isNull() | (F.col("ts_us") - lag_us > 1_800_000_000),
               1).otherwise(0).alias("is_new"),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_burst = (
        Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-300_000_000, Window.currentRow)
    )
    numbered = marked.select(
        "event_id", "user_id", "ts_us",
        F.expr("gap_us div 1000").alias("gap_ms"),
        F.sum("is_new").over(w_run).alias("session_seq"),
        F.count(F.lit(1)).over(w_burst).alias("n_burst_5min"),
    )
    ws = Window.partitionBy("user_id", "session_seq")
    ws_ord = ws.orderBy("ts_us", "event_id")
    return numbered.select(
        "event_id", "user_id",
        F.col("gap_ms").cast("long").alias("gap_ms"),
        F.col("session_seq").cast("long").alias("session_seq"),
        F.row_number().over(ws_ord).cast("long").alias("pos_in_session"),
        F.count(F.lit(1)).over(ws).cast("long").alias("session_events"),
        F.expr("(max(ts_us) OVER (PARTITION BY user_id, session_seq) "
               "- min(ts_us) OVER (PARTITION BY user_id, session_seq)) "
               "div 1000").cast("long").alias("session_ms"),
        F.col("n_burst_5min").cast("long").alias("n_burst_5min"),
    )
