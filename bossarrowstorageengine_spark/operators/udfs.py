"""B.11 UDF / UDAF / UDTF surface (SURVEY.md §2.B11).

The declared showcase of every Python-execution pathway Spark offers,
ordered slowest→fastest:

- row-at-a-time Python UDF (``q_udf_python``) — the anti-pattern baseline;
  kept ONLY as the declared showcase, never used elsewhere in the engine.
- Arrow-vectorized pandas UDF (``q_udf_pandas``) — batch columnar exchange.
- grouped-agg pandas UDF (``q_udaf_pandas``) — custom UDAF.
- ``applyInPandas`` (``q_udtf_apply``) — grouped-map (UDTF-shaped).
- ``mapInArrow`` (``q_map_in_arrow``) — raw RecordBatch transform, the same
  pathway the Arrow IPC data source uses for decompression.

All computations are also SQL-expressible so each carries an EXACT oracle —
the point is exercising the Python boundary, not novel semantics.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query

_REV_CENTS_ORACLE = """
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
               AS revenue_cents
    FROM lineitem
    WHERE l_orderkey % 50 = 0
"""


@query("q_udf_python", oracle=_REV_CENTS_ORACLE)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow-path baseline)."""
    import math

    @F.udf(returnType="long")
    def revenue_cents(price: float, discount: float) -> int:
        return int(math.floor(price * (1.0 - discount) * 100.0 + 0.5))

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey", "l_linenumber",
        revenue_cents("l_extendedprice", "l_discount").alias("revenue_cents"),
    )


@query("q_udf_pandas", oracle=_REV_CENTS_ORACLE)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF — Arrow batch exchange, ~10-100× the row UDF."""
    import numpy as np

    @F.pandas_udf("long")
    def revenue_cents(price: pd.Series, discount: pd.Series) -> pd.Series:
        return pd.Series(
            np.floor(price.to_numpy() * (1.0 - discount.to_numpy()) * 100.0 + 0.5)
        ).astype("int64")

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey", "l_linenumber",
        revenue_cents("l_extendedprice", "l_discount").alias("revenue_cents"),
    )


@query(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (custom UDAF): quantity-weighted mean price."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        q = qty.to_numpy()
        return float(np.dot(price.to_numpy(), q) / q.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 4)
        .alias("weighted_avg_price")
    )


@query(
    "q_udtf_apply",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderstatus))
                 / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderstatus), 4)
               AS price_zscore
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def q_udtf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (UDTF-shaped): per-group z-score.
    pandas ``std(ddof=1)`` ≡ SQL ``stddev_samp`` (§8.1)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        return pd.DataFrame({
            "o_orderkey": pdf["o_orderkey"],
            "o_orderstatus": pdf["o_orderstatus"],
            "price_zscore": ((pdf["o_totalprice"] - mu) / sd).round(4),
        })

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.groupBy("o_orderstatus").applyInPandas(
        zscore, "o_orderkey long, o_orderstatus string, price_zscore double")


@query(
    "q_map_in_arrow",
    oracle="""
    SELECT l_orderkey,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
               AS revenue_cents,
           CAST(l_quantity * 10 AS BIGINT) AS deci_qty
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: whole-RecordBatch transform in pyarrow — the pathway
    the arrowipc data source shares (batch in, batch out, zero pandas)."""

    def batch_revenue(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            price = batch.column("l_extendedprice")
            disc = batch.column("l_discount")
            qty = batch.column("l_quantity")
            rev = pc.floor(pc.add(pc.multiply(pc.multiply(
                price, pc.subtract(pa.scalar(1.0), disc)), pa.scalar(100.0)),
                pa.scalar(0.5)))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("l_orderkey"),
                    pc.cast(rev, pa.int64()),
                    pc.cast(pc.multiply(qty, pa.scalar(10.0)), pa.int64()),
                ],
                names=["l_orderkey", "revenue_cents", "deci_qty"],
            )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_quantity")
    )
    return li.mapInArrow(
        batch_revenue, "l_orderkey long, revenue_cents long, deci_qty long")


@query(
    "q_udtf_python",
    oracle="""
    SELECT CAST(doc_id AS BIGINT)   AS doc_id,
           CAST(u.i - 1 AS INT)     AS pos,
           u.tok                    AS token,
           CAST(len(u.tok) AS INT)  AS token_len
    FROM (SELECT doc_id, string_split(text, ' ') AS ts
          FROM documents WHERE doc_id % 50 = 0),
         LATERAL (SELECT unnest(ts) AS tok,
                         unnest(range(1, len(ts) + 1)) AS i) u
    WHERE len(u.tok) >= 6
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF (``@udtf``): one input row → many output rows with
    per-row computed columns — the table-function API surface proper
    (``q_udtf_apply`` covers the grouped-map variant).  Arrow-optimized
    UDTF execution is enabled by the session conf."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, token string, token_len int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for pos, tok in enumerate(text.split(" ")):
                if len(tok) >= 6:
                    yield pos, tok, len(tok)

    spark.udtf.register("tokenize_long", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    d.createOrReplaceTempView("udtf_docs_src")
    return spark.sql("""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, t.pos, t.token, t.token_len
        FROM udtf_docs_src, LATERAL tokenize_long(text) AS t
    """)


@query(
    "q_cogroup_apply",
    oracle="""
    WITH ocnt AS (
        SELECT o_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders WHERE o_custkey % 8 = 0 GROUP BY o_custkey
    ),
    ccnt AS (
        SELECT c_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_cust_rows
        FROM customer WHERE c_custkey % 8 = 0 GROUP BY c_custkey
    )
    SELECT coalesce(o.custkey, c.custkey)  AS custkey,
           coalesce(o.n_orders, 0)         AS n_orders,
           coalesce(o.sum_price, 0.0)      AS sum_price,
           coalesce(c.n_cust_rows, 0)      AS n_cust_rows
    FROM ocnt o FULL OUTER JOIN ccnt c USING (custkey)
    """,
)
def q_cogroup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map ``applyInPandas`` — the two-sided grouped-map entry
    point (``df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas``): each
    key's order rows AND customer rows arrive together as two pandas
    frames, the custom-merge shape (asof joins, per-entity reconciliation)
    that a single-sided UDAF can't express.  Keys present on either side
    appear (full-outer cogroup semantics).

    Determinism: counts are integers; ``sum_price`` sums exact-2dp money
    doubles inside one pandas call and rounds to 2dp.

    Scale: both sides shuffle once on the key; each task processes its
    co-partitioned groups through Arrow batches — the same per-key linear
    state as a shuffled join, with Python touching only grouped frames.
    Cost model (SCALING.md): wall time is LINEAR in key count at ~3 ms/key
    — the pandas-frame construction per group, not data volume; the key
    domain is filtered to ``custkey % 8`` (VERDICT r8 item 5: the API
    showcase doesn't need every key to demonstrate the cogroup shape,
    and halving the domain halves the dominant per-key constant).  When the
    merge is columnar arithmetic, ``q_cogroup_arrow`` (applyInArrow) cuts
    that per-key cost ~4×; when it's expressible relationally, the
    built-in full-outer join (the oracle's own shape) is the production
    path and this API is for merges joins can't express.
    """
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") % 8 == 0)
         .select("o_custkey", "o_totalprice"))
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") % 8 == 0)
         .select("c_custkey"))

    def merge(key, opdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "custkey": [int(key[0])],
            "n_orders": [len(opdf)],
            "sum_price": [round(float(opdf["o_totalprice"].sum()), 2)
                          if len(opdf) else 0.0],
            "n_cust_rows": [len(cpdf)],
        })

    grouped = (
        o.withColumn("custkey", F.col("o_custkey")).groupBy("custkey")
        .cogroup(
            c.withColumn("custkey", F.col("c_custkey")).groupBy("custkey"))
    )
    return grouped.applyInPandas(
        merge,
        "custkey long, n_orders long, sum_price double, n_cust_rows long")


@query(
    "q_udf_arrow",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '[aeiou]'))) AS BIGINT)
               AS sum_vowels
    FROM documents
    GROUP BY lang
    """,
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``useArrow=True``): the Spark-4
    middle path between row-pickled Python UDFs (~100× slow) and full
    Pandas UDFs — same per-row author model as ``q_udf_python``, but the
    exchange is Arrow-batched, so serialization stops dominating.  The
    declared showcase for the pathway; hot paths still prefer built-ins
    (the oracle recomputes the same vowel count as a JVM regex).
    """
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType(), useArrow=True)
    def vowel_count(s: str) -> int:
        return sum(1 for ch in s if ch in "aeiou")

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(vowel_count("text")).cast("long").alias("sum_vowels"),
    )


@query(
    "q_cogroup_arrow",
    oracle="""
    WITH ocnt AS (
        SELECT o_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey
    ),
    ccnt AS (
        SELECT c_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_cust_rows
        FROM customer WHERE c_custkey % 3 = 0 GROUP BY c_custkey
    )
    SELECT coalesce(o.custkey, c.custkey)  AS custkey,
           coalesce(o.n_orders, 0)         AS n_orders,
           coalesce(o.sum_price, 0.0)      AS sum_price,
           coalesce(c.n_cust_rows, 0)      AS n_cust_rows
    FROM ocnt o FULL OUTER JOIN ccnt c USING (custkey)
    """,
)
def q_cogroup_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map ``applyInArrow`` — the LOW-OVERHEAD sibling of
    ``q_cogroup_apply``: the merge function receives/returns
    ``pyarrow.Table`` instead of pandas frames, skipping the
    pandas-conversion + DataFrame-construction cost that dominates
    per-key time when groups are small (SCALING.md shows the pandas face
    at ~3 ms/key — linear in key count, but 10× this Arrow path).  Use
    applyInPandas when the merge needs pandas semantics; applyInArrow
    when it's columnar arithmetic.
    """
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") % 3 == 0)
         .select("o_custkey", "o_totalprice"))
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") % 3 == 0)
         .select("c_custkey"))

    def merge(key, otab: pa.Table, ctab: pa.Table) -> pa.Table:
        price = otab.column("o_totalprice").to_pylist() if otab.num_rows else []
        return pa.table({
            "custkey": pa.array([key[0].as_py()], pa.int64()),
            "n_orders": pa.array([otab.num_rows], pa.int64()),
            "sum_price": pa.array(
                [round(float(sum(price)), 2) if price else 0.0],
                pa.float64()),
            "n_cust_rows": pa.array([ctab.num_rows], pa.int64()),
        })

    grouped = (
        o.withColumn("custkey", F.col("o_custkey")).groupBy("custkey")
        .cogroup(
            c.withColumn("custkey", F.col("c_custkey")).groupBy("custkey"))
    )
    return grouped.applyInArrow(
        merge,
        "custkey long, n_orders long, sum_price double, n_cust_rows long")
