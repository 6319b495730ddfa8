"""Graph operators over the event-transition graph (SURVEY.md §2.B10
addenda): weighted PageRank and degree statistics.

The graph: nodes are event types, edges are (prev_type → type) transitions
per user in event-time order, weighted by transition count — the standard
clickstream Markov graph.  The node set here is small, but every plan is
the billions-of-edges shape: edge lists stay distributed, per-iteration
work is one join + one aggregation, and the rank vector re-broadcasts each
round (at true graph scale it would hash-join instead — same plan modulo
the broadcast hint Catalyst already decides by size).

Determinism: PageRank runs in FIXED-POINT integer arithmetic (ranks in
micro-units, contributions via integer division).  Integer sums are
order-independent, so unlike float power iteration the result is
bit-identical across engines and partitionings — the same trick that made
the minhash/simhash family EXACT-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query

#: Shared edge CTE (DuckDB side): per-user event-time transitions.
_EDGES_DUCK = """
    seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    edges AS (
        SELECT prev AS src, event_type AS dst, CAST(count(*) AS BIGINT) AS w
        FROM seq WHERE prev IS NOT NULL
        GROUP BY 1, 2
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w) transition edges — one window pass, one aggregation."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    ).filter(F.col("src").isNotNull())
    return seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("w"))


@query(
    "q_graph_degree",
    oracle=f"""
    WITH {_EDGES_DUCK},
    outs AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS out_degree,
               CAST(sum(w) AS BIGINT) AS out_weight
        FROM edges GROUP BY src
    ),
    ins AS (
        SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_degree,
               CAST(sum(w) AS BIGINT) AS in_weight
        FROM edges GROUP BY dst
    )
    SELECT node, out_degree, out_weight, in_degree, in_weight
    FROM outs JOIN ins USING (node)
    """,
)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree/strength distribution of the transition graph — the profile
    pass that sizes any downstream graph job (skew detection: a hub node's
    in_weight is the shuffle hot key to salt)."""
    e = _edges(spark, sf_dir)
    outs = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("out_degree"),
        F.sum("w").cast("long").alias("out_weight"),
    )
    ins = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree"),
        F.sum("w").cast("long").alias("in_weight"),
    )
    return outs.join(ins, "node")


@query(
    "q_pagerank",
    oracle=f"""
    WITH {_EDGES_DUCK},
    outw AS (
        SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src
    ),
    ew AS (
        SELECT e.src, e.dst, e.w, o.ow FROM edges e JOIN outw o USING (src)
    ),
    nodes AS (SELECT DISTINCT dst AS node FROM edges
              UNION SELECT DISTINCT src FROM edges),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
    r1 AS (
        SELECT n.node,
               150000 + 85 * COALESCE(sum((r.rank * e.w) // e.ow), 0) // 100
                   AS rank
        FROM nodes n
        LEFT JOIN ew e ON e.dst = n.node
        LEFT JOIN r0 r ON r.node = e.src
        GROUP BY n.node
    ),
    r2 AS (
        SELECT n.node,
               150000 + 85 * COALESCE(sum((r.rank * e.w) // e.ow), 0) // 100
                   AS rank
        FROM nodes n
        LEFT JOIN ew e ON e.dst = n.node
        LEFT JOIN r1 r ON r.node = e.src
        GROUP BY n.node
    ),
    r3 AS (
        SELECT n.node,
               150000 + 85 * COALESCE(sum((r.rank * e.w) // e.ow), 0) // 100
                   AS rank
        FROM nodes n
        LEFT JOIN ew e ON e.dst = n.node
        LEFT JOIN r2 r ON r.node = e.src
        GROUP BY n.node
    )
    SELECT node, CAST(rank AS BIGINT) AS rank_micro FROM r3
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, 3 power iterations, damping 0.85 — in fixed-point
    integer micro-units so the result is bit-identical across engines
    (float power iteration would be FP-summation-order sensitive, the same
    reason q_ann_ivf stays ROWS-only; integers close that gap).

    Per iteration: contribution = (rank[src] · w) div out_weight[src],
    rank'[dst] = 0.15 + 0.85 · Σ contributions — one edges⋈ranks join and
    one aggregation by dst, the canonical distributed PageRank step.  At
    billions of edges the same unrolled plan runs with the rank vector
    hash-partitioned instead of broadcast; iteration count is fixed so the
    whole thing is ONE Catalyst plan, no driver loop."""
    e = _edges(spark, sf_dir)
    outw = e.groupBy("src").agg(F.sum("w").cast("long").alias("ow"))
    ew = e.join(outw, "src")
    nodes = (
        e.select(F.col("dst").alias("node"))
        .union(e.select(F.col("src").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(1000000).cast("long").alias("rank"))
    for _ in range(3):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("(rank * w) div ow").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(150000)
                 + F.expr("85 * COALESCE(s, 0) div 100")).cast("long")
                .alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").alias("rank_micro"))
