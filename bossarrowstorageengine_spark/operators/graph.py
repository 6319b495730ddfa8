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


#: Entity-resolution edge CTEs (DuckDB side): customer-name near-duplicate
#: pairs within 16-char-prefix blocks (same blocking as q_record_linkage),
#: plus the undirected expansion.
_LINKAGE_EDGE_CTES = """
    base AS (
        SELECT c_custkey AS id, c_name,
               substr(c_name, 1, 16) AS block
        FROM customer
    ),
    pairs AS (
        SELECT a.id AS u, b.id AS v
        FROM base a JOIN base b
          ON a.block = b.block AND a.id < b.id
         AND levenshtein(a.c_name, b.c_name) <= 1
    ),
    und AS (
        SELECT u, v FROM pairs
        UNION ALL
        SELECT v, u FROM pairs
    )
"""


def _linkage_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed (u < v) entity-match edges: customer names within edit
    distance 1, compared only inside 16-char-prefix blocks.

    Round-13 pair-generator rework (VERDICT r12 item 10 — the generator,
    not the CC loop, dominated the key's wall time; profiled: ~95% of it
    was the levenshtein evaluations, serialized on the 1-2 scan
    partitions of the small parquet file):

    - **Half-tail blocking.**  Two EQUAL-length strings at edit distance
      <=1 are at Hamming distance <=1, and with equal 16-prefixes the
      single mismatch (if any) sits in ONE half of the post-prefix tail
      — so the pair agrees byte-for-byte on the other half.  Joining on
      (block, length, half1) and on (block, length, half2, half1-DIFFERS)
      yields every match exactly once (the second leg's inequality makes
      the legs disjoint — no distinct shuffle) while shrinking the
      verify set ~5.5x on this data (742.5k -> 135k levenshtein calls at
      sf0.1).  The filter is unchanged, so the edge set is PROVABLY the
      coarse generator's (completeness above; pytest pins set equality).
    - **Length-difference pairs** (one insert/delete — not exactly
      half-blockable) fall back to the coarse prefix block; zero pairs
      on fixed-width names, bounded by the cross-length population
      otherwise.
    - **Block-keyed repartition** of the probe side: the verify cost
      rides the join's output partitions, and a single-file local scan
      would otherwise run every levenshtein on 1-2 cores (measured 4.1s
      -> 0.4s at sf0.1).  At cluster scale the same shuffle is what a
      keyed join does anyway; no broadcast is forced — Catalyst/AQE
      picks broadcast only while the build side is actually small."""
    h = "cast(ceil(length(tail) / 2.0) as int)"
    c = (load_table(spark, sf_dir, "customer")
         .select(F.col("c_custkey").alias("id"), "c_name",
                 F.substring("c_name", 1, 16).alias("block"),
                 F.length("c_name").alias("nlen"),
                 F.expr("substr(c_name, 17)").alias("tail"))
         .withColumn("h1", F.expr(f"substr(tail, 1, {h})"))
         .withColumn("h2", F.expr(f"substr(tail, {h} + 1)")))
    par = max(2, spark.sparkContext.defaultParallelism)
    probe = c.repartition(par, "block")

    def _leg(extra):
        a, b = probe.alias("a"), c.alias("b")
        return (
            a.join(b, (F.col("a.block") == F.col("b.block"))
                   & (F.col("a.nlen") == F.col("b.nlen"))
                   & extra & (F.col("a.id") < F.col("b.id")))
            .filter(F.levenshtein(F.col("a.c_name"),
                                  F.col("b.c_name")) <= 1)
            .select(F.col("a.id").alias("u"), F.col("b.id").alias("v")))

    same_len = _leg(F.col("a.h1") == F.col("b.h1")).unionByName(
        _leg((F.col("a.h2") == F.col("b.h2"))
             & (F.col("a.h1") != F.col("b.h1"))))
    ca, cb = probe.alias("a"), c.alias("b")
    cross_len = (
        ca.join(cb, (F.col("a.block") == F.col("b.block"))
                & (F.col("a.nlen") != F.col("b.nlen"))
                & (F.col("a.id") < F.col("b.id")))
        .filter(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .select(F.col("a.id").alias("u"), F.col("b.id").alias("v")))
    return same_len.unionByName(cross_len)


@query(
    "q_entity_components",
    oracle=f"""
    WITH RECURSIVE
    {_LINKAGE_EDGE_CTES.strip()},
    walk AS (
        SELECT u AS node, u AS reach FROM (SELECT DISTINCT u FROM und)
        UNION
        SELECT w.node, e.v FROM walk w JOIN und e ON w.reach = e.u
    ),
    comp AS (
        SELECT node, min(reach) AS comp_id FROM walk GROUP BY node
    ),
    sizes AS (
        SELECT comp_id, count(*) AS size FROM comp GROUP BY comp_id
    )
    SELECT CAST(size AS BIGINT)          AS component_size,
           CAST(count(*) AS BIGINT)      AS n_components,
           CAST(sum(comp_id) AS BIGINT)  AS comp_id_checksum,
           TRUE                          AS converged
    FROM sizes GROUP BY size
    """,
)
def q_entity_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity clustering: connected components over the blocked
    record-linkage match graph (``q_record_linkage``'s edges) — the step
    that turns pairwise "these two records match" into entity groups.
    Emits the component-size histogram with a min-id checksum, the
    dedup-audit face of entity resolution.

    Scale: the consolidated min-label-propagation core
    (``functions.components.cc_min_label`` — per round one keyed join +
    one keyed aggregation over the edge list, converging in
    graph-diameter rounds; ``localCheckpoint`` truncates lineage;
    convergence checks batched) in FLAG mode: the ``converged`` column
    reports whether the fixpoint was reached within the iteration bound
    (a >bound-diameter graph is reported, not silently mislabeled —
    appropriate for this histogram/audit face, where the dedup keys use
    the same core's strict/raising mode).  The
    oracle replays the fixpoint as a recursive reachability closure —
    exact because linkage components are small (closure is quadratic per
    component, which is why the ENGINE side never materializes it).
    """
    from bossarrowstorageengine_spark.functions.components import (
        cc_min_label,
    )

    labels, converged = cc_min_label(
        _linkage_edges(spark, sf_dir), strict=False)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy(F.col("size").cast("long").alias("component_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum("label").cast("long").alias("comp_id_checksum"),
        # Convergence FLAG, not a silent cap: a graph whose diameter
        # exceeds the iteration bound emits converged=false so the caller
        # knows the labels are an upper-bound partition (some components
        # may still be split), instead of mistaking them for final.
        F.lit(converged).alias("converged"),
    )


@query(
    "q_graph_triangles",
    oracle=f"""
    WITH
    {_LINKAGE_EDGE_CTES.strip()},
    tri AS (
        SELECT count(*) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e2.u = e1.v
        JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    deg AS (
        SELECT u AS node, count(*) AS d
        FROM und GROUP BY u
    ),
    wedges AS (
        SELECT sum(d * (d - 1) / 2) AS n_wedges,
               count(*)             AS n_nodes
        FROM deg
    )
    SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(w.n_nodes AS BIGINT)                    AS n_nodes,
           CAST(t.n_triangles AS BIGINT)                AS n_triangles,
           CAST(w.n_wedges AS BIGINT)                   AS n_wedges,
           round(3.0 * t.n_triangles / w.n_wedges, 6)   AS clustering_coeff
    FROM tri t, wedges w
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering coefficient over the entity
    -match graph — the graph-density audit (high clustering = blocky
    near-clique entities, the expected shape for true duplicates).

    Scale: the classic oriented-edge triangle join — edges stored once in
    (u < v) orientation, so each triangle is counted exactly once by
    joining e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c); at whale-node scale the standard
    refinement (orient by degree instead of id) drops in without changing
    the count.  Wedge counts come from the degree table, never from a
    pairwise expansion.
    """
    pairs = _linkage_edges(spark, sf_dir).localCheckpoint()
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u"))
              & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    und = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) / 2")).alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_edges.crossJoin(F.broadcast(tri)).crossJoin(F.broadcast(wedges))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6)
                .alias("clustering_coeff"),
        )
    )


@query(
    "q_markov_entropy",
    oracle=f"""
    WITH {_EDGES_DUCK},
    tot AS (
        SELECT src, CAST(sum(w) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT)    AS n_next
        FROM edges GROUP BY src
    )
    SELECT e.src                              AS event_type,
           CAST(max(t.n_next) AS BIGINT)      AS n_next,
           CAST(max(t.t) AS BIGINT)           AS n_transitions,
           CAST(sum(CAST(floor(
               1000000 * (CAST(e.w AS DOUBLE) / t.t)
                       * ln(CAST(t.t AS DOUBLE) / e.w)
           ) AS BIGINT)) AS BIGINT)           AS entropy_micro_nats
    FROM edges e JOIN tot t USING (src)
    GROUP BY e.src
    """,
)
def q_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event predictability: Shannon entropy of each event type's
    outgoing transition distribution in the clickstream Markov graph —
    H(src) = Σ p·ln(1/p) — low entropy means the next step is predictable
    (funnel-like), high entropy means the state fans out.

    Determinism: each edge's entropy term is truncated to integer
    micro-nats BEFORE the sum, so the aggregation is order-independent
    integer addition (float Σ p·ln p would be partitioning-sensitive) —
    same fixed-point discipline as ``q_pagerank``.

    Scale: edges ⋈ per-src totals (both keyed on src, one co-partitioned
    shuffle) then one keyed aggregation; nothing quadratic, no windows
    over raw events beyond the shared edge-extraction pass.
    """
    e = _edges(spark, sf_dir)
    tot = e.groupBy("src").agg(
        F.sum("w").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_next"),
    )
    j = e.join(tot, "src")
    term = F.floor(
        1000000 * (F.col("w") / F.col("t"))
        * F.log(F.col("t") / F.col("w"))
    ).cast("long")
    return j.groupBy(F.col("src").alias("event_type")).agg(
        F.max("n_next").cast("long").alias("n_next"),
        F.max("t").cast("long").alias("n_transitions"),
        F.sum(term).cast("long").alias("entropy_micro_nats"),
    )


def _lpa_round_sql(j: int) -> str:
    """One unrolled synchronous LPA round (DuckDB): node's next label =
    weighted mode of neighbor labels, tie -> smallest label.  INNER-join
    semantics: a node with no labeled neighbor would drop out — safe here
    only because e2 is symmetric (every node has >= 1 neighbor) and each
    round labels every node, so the node set is invariant; reusing this
    for a graph where label sets can shrink needs a COALESCE fallback."""
    return f"""
    lab{j} AS (
        SELECT u AS node, lbl AS label FROM (
            SELECT e2.u, l.label AS lbl,
                   row_number() OVER (PARTITION BY e2.u
                       ORDER BY sum(e2.w) DESC, l.label) AS rn
            FROM e2 JOIN lab{j - 1} l ON e2.v = l.node
            GROUP BY e2.u, l.label
        ) WHERE rn = 1
    )"""


@query(
    "q_graph_communities",
    oracle=f"""
    WITH pairs AS (
        SELECT a.l_orderkey,
               a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), e AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS w
        FROM pairs GROUP BY u, v HAVING count(*) >= 2
    ), e2 AS (
        SELECT u, v, w FROM e
        UNION ALL
        SELECT v AS u, u AS v, w FROM e
    ), lab0 AS (
        SELECT DISTINCT u AS node FROM e2
    ), lab0x AS (
        SELECT node, node AS label FROM lab0
    ),{_lpa_round_sql(1).replace('lab0', 'lab0x')},{_lpa_round_sql(2)},{_lpa_round_sql(3)}
    SELECT CAST(csize AS BIGINT)          AS community_size,
           CAST(count(*) AS BIGINT)       AS n_communities,
           CAST(sum(label) AS BIGINT)     AS label_checksum
    FROM (
        SELECT label, count(*) AS csize FROM lab3 GROUP BY label
    )
    GROUP BY csize
    """,
)
def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (SURVEY §7 runway) over the
    part CO-PURCHASE graph: parts are connected when they appear in the
    same order at least twice (edge weight = co-order count), and THREE
    synchronous LPA rounds assign each part the weighted MODE of its
    neighbors' labels (tie -> smallest label — deterministic, so the
    DuckDB oracle replays the rounds exactly).  Output is the
    community-size histogram with a label checksum — the
    assortment-planning face ("which products cluster?") of the same
    iteration ``q_entity_components`` runs with min instead of mode.

    Pair expansion is BOUNDED BY CONSTRUCTION: lineitems per order ≤ 7,
    so the self-join emits ≤ 21 pairs per order — linear in orders, never
    users²/parts² (the trap co-occurrence graphs usually hide).  The
    weight-≥2 filter keeps the graph to repeated signal.

    Scale: each LPA round is one keyed join (edge.dst -> label) + one
    keyed aggregation + a per-node rank — 2 shuffles/round over edge
    cardinality, the standard distributed LPA shape; rounds are a fixed
    unrolled constant here (real deployments iterate to quiescence with
    the convergence-flag pattern of ``q_entity_components``)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("v"))
    e = (a.join(b, "ok").filter(F.col("u") < F.col("v"))
         .groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
         .filter(F.col("w") >= 2))
    e2 = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
    e2 = e2.localCheckpoint()  # 3 rounds reuse the edges; truncate lineage
    labels = e2.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node"))
    for _ in range(3):
        cand = (e2.join(labels, e2["v"] == labels["node"])
                .groupBy("u", "label")
                .agg(F.sum("w").alias("lw")))
        wr = Window.partitionBy("u").orderBy(F.desc("lw"), F.asc("label"))
        labels = (cand.withColumn("rn", F.row_number().over(wr))
                  .filter(F.col("rn") == 1)
                  .select(F.col("u").alias("node"), "label"))
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("csize"))
    return sizes.groupBy(F.col("csize").cast("long")
                         .alias("community_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum("label").cast("long").alias("label_checksum"),
    )
