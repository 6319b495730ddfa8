"""B.8 scalar functions: string / regex / date / math / array / explode /
JSON (SURVEY.md §2.B8).

Everything here is a built-in Catalyst expression — JVM-side, inside
whole-stage codegen; no Python executes per row.  Cross-engine determinism
rules from SURVEY.md §8 are annotated per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query


@query(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                         AS brand_upper,
           lower(p_type)                          AS type_lower,
           substring(p_name, 1, 8)                AS name_prefix,
           CAST(length(p_name) AS BIGINT)         AS name_len,
           concat(p_brand, ':', p_type)           AS brand_type,
           replace(p_type, ' ', '_')              AS type_snake,
           trim(concat('  ', p_brand, '  '))      AS brand_trim
    FROM part
    WHERE p_partkey % 7 = 0
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions (1-based substring in both engines)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
    )


@query(
    "q_str_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '[0-9]+')           AS cust_digits,
           CAST(length(string_split(c_name, '#')) AS BIGINT) AS n_hash_parts
    FROM customer
    WHERE c_custkey % 11 = 0
    """,
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract + split — patterns restricted to [0-9]+ simplicity
    (Java regex vs RE2, §8.5)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 11 == 0)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "[0-9]+", 0).alias("cust_digits"),
        F.size(F.split("c_name", "#")).cast("long").alias("n_hash_parts"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS BIGINT)           AS yr,
           CAST(month(o_orderdate) AS BIGINT)           AS mon,
           CAST(day(o_orderdate)   AS BIGINT)           AS dom,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                                                        AS days_since_1995
    FROM orders
    WHERE o_orderkey % 13 = 0
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions.  Spark ``datediff(end, start)`` ≡ DuckDB
    ``date_diff('day', start, end)`` — argument order flips (§8.4)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd")
        .alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long").alias("days_since_1995"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT s_suppkey,
           round(abs(s_acctbal), 2)                   AS abs_bal,
           CAST(ceil(s_acctbal)  AS BIGINT)           AS ceil_bal,
           CAST(floor(s_acctbal) AS BIGINT)           AS floor_bal,
           round(sqrt(abs(s_acctbal)), 4)             AS sqrt_bal,
           round(ln(abs(s_acctbal) + 1), 4)           AS ln_bal,
           round(pow(s_nationkey, 2), 1)              AS nation_sq,
           s_suppkey % 7                              AS key_mod
    FROM supplier
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (4dp rounding for irrational outputs, §8.1)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.round(F.abs("s_acctbal"), 2).alias("abs_bal"),
        F.ceil("s_acctbal").cast("long").alias("ceil_bal"),
        F.floor("s_acctbal").cast("long").alias("floor_bal"),
        F.round(F.sqrt(F.abs("s_acctbal")), 4).alias("sqrt_bal"),
        F.round(F.log(F.abs(F.col("s_acctbal")) + 1), 4).alias("ln_bal"),
        F.round(F.pow("s_nationkey", F.lit(2)), 1).alias("nation_sq"),
        (F.col("s_suppkey") % 7).alias("key_mod"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT)                    AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)            AS first_elem,
           round(CAST(embedding[64] AS DOUBLE), 6)           AS last_elem,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
    FROM embeddings
    WHERE vec_id % 5 = 0
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over embeddings via higher-order functions — float→double
    cast before arithmetic (§8.1); element_at is 1-based in both engines."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at(F.col("embedding"), 64).cast("double"), 6).alias("last_elem"),
        F.round(
            F.sqrt(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x)), 4
        ).alias("l2_norm"),
    )


@query(
    "q_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    HAVING count(*) >= 25
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/unnest (table-generating) — word frequencies over documents.
    At 100 TB the explode is pipelined (no materialized cross product) and
    the count aggregates map-side before the word shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_type,
           count(*)                                                AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``props`` string column (§8.9: both engines
    return the raw string; cast to int on both sides)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q_explode_outer",
    oracle="""
    WITH src AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN NULL
                    ELSE string_split(text, ' ')[1:3] END AS toks
        FROM documents WHERE doc_id % 25 = 0
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_rows,
           CAST(sum(CASE WHEN tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_rows,
           CAST(count(DISTINCT doc_id) AS BIGINT)          AS n_docs
    FROM (SELECT doc_id,
                 unnest(CASE WHEN toks IS NULL THEN [NULL] ELSE toks END) AS tok
          FROM src)
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: rows with NULL arrays survive with a NULL element
    (plain explode drops them) — the null-preserving unnest a sparse
    multimodal/metadata column needs."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    src = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, None)
         .otherwise(F.slice(F.split("text", " "), 1, 3)).alias("toks"))
    ex = src.select("doc_id", F.explode_outer("toks").alias("tok"))
    return ex.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("tok").isNull(), 1).otherwise(0))
         .cast("long").alias("n_null_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "q_json_from_json",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_high,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
               AS avg_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def q_json_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-projected JSON parse: ``from_json(props, 'k long')`` turns
    the string column into a typed struct once, then ordinary column
    pruning/filtering applies — the scalable alternative to repeated
    ``get_json_object`` path extraction (one parse, N field reads; at
    100 TB parse cost dominates, so parse-once wins for multi-field
    access)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k long"))
    return (
        parsed.filter(F.col("p.k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            F.round(F.avg("p.k"), 4).alias("avg_k"),
        )
    )


@query(
    "q_hof_array",
    oracle="""
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           len(list_filter(embedding, x -> x > 0.5)) > 0            AS any_big,
           len(list_filter(embedding, x -> x <= -10)) = 0           AS all_gt,
           round(list_sum(list_transform(range(1, len(embedding) + 1),
                 i -> CAST(embedding[i] AS DOUBLE) *
                      CAST(embedding[len(embedding) + 1 - i] AS DOUBLE))), 4)
                                                                    AS rev_dot
    FROM embeddings
    WHERE vec_id % 7 = 0
    """,
)
def q_hof_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: ``filter`` / ``exists`` / ``forall`` /
    ``zip_with`` + ``aggregate`` over the embedding column — all JVM-side
    Catalyst expressions (no Python), so the per-element work stays inside
    whole-stage codegen at any scale.  Elements are cast to double before
    arithmetic so both engines sum the same sequence in the same precision
    (SURVEY.md §8.1)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 7 == 0)
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    rev_dot = F.aggregate(
        F.zip_with(emb_d, F.reverse(emb_d), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.size(F.filter(emb_d, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(emb_d, lambda x: x > 0.5).alias("any_big"),
        F.forall(emb_d, lambda x: x > -10.0).alias("all_gt"),
        F.round(rev_dot, 4).alias("rev_dot"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT user_id,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                  THEN 1 END), 0) AS BIGINT) AS n_purchase,
           min(event_type) AS first_type
    FROM events
    GROUP BY user_id
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a per-user event_type→count map with
    ``map_from_entries`` (entries sorted first — ``collect_list`` order is
    nondeterministic), then read it back with ``size`` / ``element_at`` /
    ``map_keys``.  The oracle states the same results in plain SQL — the
    map is the mechanism under test, not the output schema.  The map stays
    a per-row value built inside one keyed aggregate, so nothing here
    changes shape at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0))
        .cast("long").alias("n_purchase"),
        F.element_at(F.map_keys("m"), 1).alias("first_type"),
    )


@query(
    "q_str_fuzzy",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           CAST(levenshtein(p_name, p_type)  AS BIGINT) AS dist_name_type,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS dist_brand_type
    FROM part
    WHERE p_partkey % 11 = 0
    """,
)
def q_str_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via Levenshtein edit distance (both engines
    implement the same unit-cost dynamic program — verified identical).
    Per-row, shuffle-free, codegen'd: the building block for fuzzy joins,
    which at scale pair it with a blocking key so only candidate pairs pay
    the O(len^2) distance."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 11 == 0)
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.levenshtein("p_name", "p_type").cast("long").alias("dist_name_type"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("dist_brand_type"),
    )


@query(
    "q_json_variant",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT)          AS sum_k,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
                              AS BIGINT) > 50 THEN 1 ELSE 0 END)
                AS BIGINT)          AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): ``parse_json`` turns the
    props string into a binary VARIANT once, and ``variant_get`` extracts
    typed paths from the encoded form — the open-format answer to
    schema-on-read JSON columns (parse once, extract many, no per-access
    string re-parse; the binary encoding also pushes through shuffles
    smaller than the source text).

    The oracle extracts the same paths with DuckDB's JSON functions —
    value equality proves the VARIANT encode/decode is faithful.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'long')")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(k).cast("long").alias("sum_k"),
        F.sum((k > 50).cast("int")).cast("long").alias("n_high"),
    )
