"""Graph analytics query surface (engine extension).

The graph is REAL data, not a synthetic adjacency: the part
co-purchase graph — an undirected edge between two parts whenever
some order contains both (``lineitem`` self-joined on ``l_orderkey``,
weight = number of co-occurring orders). This is the market-basket /
co-occurrence structure a data-mixing or recommendation pipeline
derives from interaction logs; TPC-H's bounded lines-per-order keeps
the self-join fan-out constant, so the derivation is scale-safe.

Algorithms live in :mod:`aws_lakehouse_spark.operators.graph`
(degree-ordered triangle counting, checkpointed PageRank) and the
connected-components kernel is shared verbatim with the near-dup
resolution tier (:func:`aws_lakehouse_spark.llm.dedup.
connected_components` — dup clusters ARE components).

Oracle notes: PageRank is unrolled to the same 5 synchronous
iterations in SQL; connected components use a recursive min-label
CTE (fixpoint over the w>=2 subgraph, small enough for closure at
gate scale). All float outputs round identically on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.operators.graph import (
    degrees,
    pagerank_from_adjacency,
    triangle_count,
)
from aws_lakehouse_spark.registry import register

# Shared oracle fragment: the distinct undirected co-purchase edge
# list (src < dst) with its order-co-occurrence weight.
_EDGES_SQL = """
    pairs AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM pairs a
        JOIN pairs b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
"""

# MATERIALIZED variant for iterative oracles: DuckDB 1.x inlines
# single-reference CTEs by default, so a k-round replay whose round
# k references round k-1 once becomes ONE mega-plan re-deriving the
# edge list per round — at sf1 the pagerank oracle exceeded a 78 GB
# spill budget this way (r8 sweep). MATERIALIZED bounds the live
# plan to one round at a time (the in-SQL equivalent of "materialize
# each round into a temp table"), identical results.
_EDGES_SQL_MAT = _EDGES_SQL.replace(
    "pairs AS (", "pairs AS MATERIALIZED ("
).replace("edges AS (", "edges AS MATERIALIZED (")


def copurchase_edges(
    spark: SparkSession,
    sf_dir: str,
    min_weight: int = 1,
    max_basket: int = 1_000,
) -> DataFrame:
    """Distinct undirected (src < dst) part co-purchase edges with
    co-occurrence weight ``w``. Group-then-expand shape: collect each
    order's distinct sorted part set (one shuffle on ``l_orderkey`` —
    the array also dedups, so no separate ``distinct``), expand the
    ordered pairs with a nested array ``transform`` (pure JVM
    expressions, fan-out bounded by lines-per-order²), then one
    shuffle on the pair key for the weight aggregate. 3x faster than
    the equivalent self-join at sf0.1: two exchanges instead of
    three and no join hash table over the full line set — and at
    cluster scale the per-order expansion stays embarrassingly
    parallel while a self-join would shuffle the whole fact twice.

    MEGA-BASKET ESCAPE HATCH: the in-row expansion builds |ps|²/2
    structs in ONE row, so a pathological order touching 10^5 parts
    would allocate 10^10 structs on one executor (the same hazard
    class the Pregel kernels' hub-slicing bounds). Orders past
    ``max_basket`` distinct parts are routed through an
    explode-then-self-join expansion instead: identical pairs, but
    the fan-out lands in SHUFFLE partitions, never one row. TPC-H
    orders top out at 7 lines, so the hot path is unchanged at every
    test scale; the join branch only materializes work when a mega
    basket actually exists."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # two consumers (the small/big routing filters) — deliberately
    # UNPINNED: recomputing the one cheap aggregate for the second
    # branch measured ~0.1 s at sf0.1 vs ~0.6 s to localCheckpoint
    # the order-sized array frame (see graph_pagerank_topk_q)
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    small = per_order.filter(F.size("ps") <= max_basket)
    big = per_order.filter(F.size("ps") > max_basket)
    pair_rows = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), "
        "y -> struct(x AS src, y AS dst))))"
    )
    pairs = small.select(F.explode(pair_rows).alias("p")).select(
        "p.src", "p.dst"
    )
    big_parts = big.select(
        "l_orderkey", F.explode("ps").alias("part")
    )
    a = big_parts.select("l_orderkey", F.col("part").alias("src"))
    b = big_parts.select("l_orderkey", F.col("part").alias("dst"))
    big_pairs = a.join(b, "l_orderkey").filter(
        F.col("src") < F.col("dst")
    ).select("src", "dst")
    edges = (
        pairs.unionByName(big_pairs)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    if min_weight > 1:
        edges = edges.filter(F.col("w") >= min_weight)
    return edges


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst, src FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS degree FROM adj GROUP BY src)
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree ORDER BY degree
    """,
    category="2.11 graph (engine extension)",
    doc="Degree distribution of the part co-purchase graph: per-node "
    "neighbor count, then nodes per degree — the first diagnostic "
    "run on any large graph (hub detection drives the choice of "
    "orientation/salting downstream). Two keyed shuffles total; the "
    "distribution frame is at most max-degree rows.",
)
def graph_degree_distribution_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # symmetrize unions both directions of the SAME derived frame —
    # pin it so the two-shuffle fact expansion runs once, not twice
    deg = degrees(
        copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(F.col("degree").cast("bigint").alias("degree"), "n_nodes")
        .orderBy("degree")
    )


@register(
    "graph_triangle_count",
    bench=True,  # r7 verdict item 5: heaviest non-bench queries join the watched set
    oracle=f"""
    WITH {_EDGES_SQL},
    e2 AS (SELECT src, dst FROM edges WHERE w >= 2),
    tri AS (
        SELECT COUNT(*) AS n
        FROM e2 ab JOIN e2 bc ON ab.dst = bc.src
                   JOIN e2 ac ON ac.src = ab.src AND ac.dst = bc.dst
    ),
    nn AS (
        SELECT COUNT(*) AS n FROM (
            SELECT src AS x FROM e2 UNION SELECT dst FROM e2
        )
    )
    SELECT CAST(nn.n AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e2) AS BIGINT) AS n_edges,
           CAST(tri.n AS BIGINT) AS n_triangles
    FROM nn, tri
    """,
    category="2.11 graph (engine extension)",
    doc="Exact triangle count of the w>=2 co-purchase subgraph via "
    "DEGREE-ORDERED wedge enumeration (operators/graph.py): every "
    "edge oriented from its lower-(degree,id) endpoint bounds wedge "
    "fan-out by sum(outdeg^2) — the hub-proof MapReduce-classic — "
    "then one semi-join closes wedges against the edge set. The "
    "oracle counts the same triangles with the naive a<b<c 3-way "
    "join, fine at gate scale.",
)
def graph_triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = copurchase_edges(spark, sf_dir, min_weight=2)
    return triangle_count(edges).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
    )


@register(
    "graph_pagerank_topk",
    oracle=f"""
    WITH {_EDGES_SQL_MAT},
    adj AS MATERIALIZED (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst, src FROM edges
    ),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM adj GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    p0 AS MATERIALIZED (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
    p1 AS MATERIALIZED (
        SELECT a.dst AS node,
               (1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * SUM(p.pr / d.deg) AS pr
        FROM adj a JOIN deg d ON a.src = d.src JOIN p0 p ON p.node = a.src
        GROUP BY a.dst
    ),
    p2 AS MATERIALIZED (
        SELECT a.dst AS node,
               (1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * SUM(p.pr / d.deg) AS pr
        FROM adj a JOIN deg d ON a.src = d.src JOIN p1 p ON p.node = a.src
        GROUP BY a.dst
    ),
    p3 AS MATERIALIZED (
        SELECT a.dst AS node,
               (1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * SUM(p.pr / d.deg) AS pr
        FROM adj a JOIN deg d ON a.src = d.src JOIN p2 p ON p.node = a.src
        GROUP BY a.dst
    ),
    p4 AS MATERIALIZED (
        SELECT a.dst AS node,
               (1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * SUM(p.pr / d.deg) AS pr
        FROM adj a JOIN deg d ON a.src = d.src JOIN p3 p ON p.node = a.src
        GROUP BY a.dst
    ),
    p5 AS MATERIALIZED (
        SELECT a.dst AS node,
               (1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * SUM(p.pr / d.deg) AS pr
        FROM adj a JOIN deg d ON a.src = d.src JOIN p4 p ON p.node = a.src
        GROUP BY a.dst
    )
    SELECT CAST(node AS BIGINT) AS part_id, ROUND(pr, 6) AS pagerank
    FROM p5
    ORDER BY ROUND(pr, 6) DESC, node
    LIMIT 20
    """,
    category="2.11 graph (engine extension)",
    doc="PageRank centrality (damping 0.85, 5 synchronous rounds, "
    "uniform init) over the co-purchase graph; top-20 parts — the "
    "classic quality/centrality prior for corpus curation, here on "
    "basket structure. Each round is one join + one keyed aggregate "
    "with a lazy localCheckpoint truncating lineage; the oracle "
    "unrolls the identical five iterations as CTEs. Ordering uses "
    "the ROUNDED rank plus the node id so the top-20 cut is "
    "deterministic on both engines.",
    bench=True,
)
def graph_pagerank_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # adjacency lists in TWO shuffles total (order-key grouping, then
    # node grouping): the per-order part sets expand to directed
    # pairs and collect_set dedups them per node — PageRank needs
    # distinct neighbors, not edge weights, so the (src, dst) weight
    # aggregate copurchase_edges runs (a third, edge-sized shuffle)
    # would be pure overhead here
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # the mega-basket routing below reads this twice (size <= cap,
    # size > cap) — deliberately UNPINNED: re-running the order-key
    # grouping for the second branch measured ~0.1 s at sf0.1, while
    # a localCheckpoint of the order-sized array frame cost ~0.6 s.
    # Recompute beats materialize when the frame is one cheap
    # aggregate off a columnar scan.
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    directed = F.expr(
        "flatten(transform(ps, x -> "
        "transform(filter(ps, y -> y != x), "
        "y -> struct(x AS src, y AS dst))))"
    )
    # mega-basket escape hatch (same hazard and routing as
    # copurchase_edges): |ps|^2 directed structs in ONE row past the
    # cap would OOM an executor; big baskets expand via explode +
    # self-join instead, shuffle-bounded
    max_basket = 1_000
    small = per_order.filter(F.size("ps") <= max_basket)
    big = per_order.filter(F.size("ps") > max_basket)
    small_pairs = small.select(F.explode(directed).alias("p")).select(
        "p.src", "p.dst"
    )
    bp = big.select("l_orderkey", F.explode("ps").alias("part"))
    big_pairs = (
        bp.select("l_orderkey", F.col("part").alias("src"))
        .join(
            bp.select("l_orderkey", F.col("part").alias("dst")),
            "l_orderkey",
        )
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    adj_lists = (
        small_pairs.unionByName(big_pairs)
        .groupBy("src")
        .agg(F.collect_set("dst").alias("nbrs"))
    )
    pr = pagerank_from_adjacency(adj_lists, iterations=5, damping=0.85)
    return (
        pr.select(
            F.col("node").cast("bigint").alias("part_id"),
            F.round("pr", 6).alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), "part_id")
        .limit(20)
    )


@register(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL},
    e2 AS (SELECT src, dst FROM edges WHERE w >= 2),
    adj AS (
        SELECT src, dst FROM e2
        UNION ALL
        SELECT dst, src FROM e2
    ),
    lab(node, label) AS (
        SELECT src, src FROM adj
        UNION
        SELECT a.src, l.label
        FROM lab l JOIN adj a ON a.dst = l.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM lab GROUP BY node)
    SELECT CAST(component AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM comp GROUP BY component ORDER BY n_nodes DESC, component
    """,
    category="2.11 graph (engine extension)",
    doc="Connected components of the w>=2 co-purchase subgraph, "
    "summarized as (component = min member id, size), reusing the "
    "EXACT pointer-jumping min-label kernel that resolves near-dup "
    "clusters (llm/dedup.py:262 — O(log diameter) rounds, per-round "
    "lazy localCheckpoint, no driver-side graph state). The oracle "
    "reaches the same fixpoint with a recursive min-label CTE.",
)
def graph_connected_components_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from aws_lakehouse_spark.llm.dedup import connected_components

    edges = copurchase_edges(spark, sf_dir, min_weight=2)
    pairs = edges.select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    labels = connected_components(pairs)
    return (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(F.col("component").cast("bigint").alias("component"), "n_nodes")
        .orderBy(F.col("n_nodes").desc(), "component")
    )


@register(
    "graph_adamic_adar",
    oracle=f"""
    WITH {_EDGES_SQL},
    e2 AS (SELECT src, dst FROM edges WHERE w >= 2),
    adj AS (
        SELECT src, dst FROM e2
        UNION ALL
        SELECT dst, src FROM e2
    ),
    deg AS (SELECT src AS z, COUNT(*) AS d FROM adj GROUP BY 1),
    cand AS (
        SELECT m1.dst AS a, m2.dst AS b, m1.src AS z
        FROM adj m1 JOIN adj m2 ON m1.src = m2.src
        WHERE m1.dst < m2.dst
    ),
    nonedge AS (
        SELECT c.a, c.b, c.z FROM cand c
        ANTI JOIN e2 e ON c.a = e.src AND c.b = e.dst
    )
    SELECT CAST(n.a AS BIGINT) AS part_a, CAST(n.b AS BIGINT) AS part_b,
           ROUND(SUM(1.0 / ln(d.d)), 6) AS aa_score,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM nonedge n JOIN deg d ON n.z = d.z
    GROUP BY 1, 2
    ORDER BY ROUND(SUM(1.0 / ln(d.d)), 6) DESC, part_a, part_b
    LIMIT 20
    """,
    category="2.11 graph (engine extension)",
    doc="Adamic-Adar link prediction on the w>=2 co-purchase "
    "subgraph: for every 2-hop pair (a, b) NOT already an edge, "
    "score = sum over common neighbors z of 1/ln(deg(z)) — hub "
    "neighbors count less — and keep the top-20 predicted links. "
    "The recommend-next-part / complete-the-basket primitive. A "
    "common neighbor has degree >= 2 by construction, so ln(deg) "
    "is never 0. Scale: wedge enumeration is one self-join of the "
    "adjacency keyed on the CENTER node (sum-of-degrees-squared "
    "bounded, on the weight-thresholded subgraph that's vocabulary-"
    "sized), the existing-edge removal is an anti-join, and the "
    "score is one keyed aggregate; ordering prunes to top-20 via "
    "TakeOrdered, no global sort.",
)
def graph_adamic_adar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        copurchase_edges(spark, sf_dir, min_weight=2)
        .select("src", "dst")
        # three consumers (both adjacency directions, the non-edge
        # anti-join) — pin the derived edge list so the two-shuffle
        # fact expansion runs once, not seven times
        .localCheckpoint(eager=False)
    )
    adj = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("z")).agg(
        F.count(F.lit(1)).alias("d")
    )
    m1 = adj.select(F.col("src").alias("z"), F.col("dst").alias("a"))
    m2 = adj.select(F.col("src").alias("z"), F.col("dst").alias("b"))
    cand = m1.join(m2, "z").filter(F.col("a") < F.col("b"))
    nonedge = cand.join(
        edges,
        (cand.a == edges.src) & (cand.b == edges.dst),
        "left_anti",
    )
    return (
        nonedge.join(F.broadcast(deg), "z")
        .groupBy("a", "b")
        .agg(
            F.round(F.sum(1.0 / F.log("d")), 6).alias("aa_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
        )
        .select(
            F.col("a").cast("bigint").alias("part_a"),
            F.col("b").cast("bigint").alias("part_b"),
            "aa_score",
            "n_common",
        )
        .orderBy(F.col("aa_score").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH {_EDGES_SQL},
    e2 AS (SELECT src, dst FROM edges WHERE w >= 2),
    adj AS (
        SELECT src, dst FROM e2
        UNION ALL
        SELECT dst, src FROM e2
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM adj),
    v1 AS (
        SELECT a.src AS node, l.label, COUNT(*) AS v
        FROM adj a JOIN l0 l ON l.node = a.dst
        GROUP BY 1, 2
    ),
    l1 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (
                       PARTITION BY node ORDER BY v DESC, label
                   ) AS rn
            FROM v1
        ) WHERE rn = 1
    ),
    v2 AS (
        SELECT a.src AS node, l.label, COUNT(*) AS v
        FROM adj a JOIN l1 l ON l.node = a.dst
        GROUP BY 1, 2
    ),
    l2 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (
                       PARTITION BY node ORDER BY v DESC, label
                   ) AS rn
            FROM v2
        ) WHERE rn = 1
    ),
    v3 AS (
        SELECT a.src AS node, l.label, COUNT(*) AS v
        FROM adj a JOIN l2 l ON l.node = a.dst
        GROUP BY 1, 2
    ),
    l3 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (
                       PARTITION BY node ORDER BY v DESC, label
                   ) AS rn
            FROM v3
        ) WHERE rn = 1
    )
    SELECT CAST(label AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM l3 GROUP BY label
    ORDER BY n_nodes DESC, community
    """,
    category="2.11 graph (engine extension)",
    doc="Community detection on the w>=2 co-purchase subgraph: 3 "
    "synchronous label-propagation rounds (every node adopts its "
    "neighbors' majority label, ties to the smallest — the "
    "deterministic LPA variant; random tie-breaks are "
    "irreproducible across engines), summarized as (community, "
    "size). Pregel shape shared with PageRank: adjacency lists "
    "partitioned once, only the O(N) label vector moves per round, "
    "vote counts map-side combined, per-node argmax as one min_by "
    "aggregate over a (-votes, label) struct — no window sort. The "
    "oracle unrolls the same 3 rounds as chained CTEs.",
)
def graph_label_propagation_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from aws_lakehouse_spark.operators.graph import label_propagation

    edges = copurchase_edges(spark, sf_dir, min_weight=2)
    labels = label_propagation(edges.select("src", "dst"), rounds=3)
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(F.col("label").cast("bigint").alias("community"), "n_nodes")
        .orderBy(F.col("n_nodes").desc(), "community")
    )


@register(
    "graph_bfs_distance",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL},
    e2 AS (SELECT src, dst FROM edges WHERE w >= 2),
    adj AS (
        SELECT src, dst FROM e2
        UNION ALL
        SELECT dst, src FROM e2
    ),
    srcn AS (SELECT MIN(src) AS s FROM adj),
    walk(node, d) AS (
        SELECT s, 0 FROM srcn
        UNION
        SELECT a.dst, w.d + 1
        FROM walk w JOIN adj a ON a.src = w.node
        WHERE w.d < 3
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(MIN(d) AS INTEGER) AS dist
    FROM walk GROUP BY node ORDER BY dist, node
    """,
    category="2.11 graph (engine extension)",
    doc="Breadth-first hop distances from the minimum-id node of the "
    "w>=2 co-purchase subgraph, bounded to 3 hops — the ego-network "
    "/ blast-radius primitive (which parts sit within K association "
    "hops of this one). Frontier expansion is the scale shape: each "
    "round joins ONLY the newest frontier against the adjacency and "
    "anti-joins already-labeled nodes away, so a round's work is "
    "proportional to the frontier's edge boundary, never the graph "
    "— and the hop bound caps total work at the K-ball size. The "
    "oracle reaches the same labeling with a recursive min-distance "
    "CTE.",
)
def graph_bfs_distance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.operators.graph import symmetrize

    edges = copurchase_edges(spark, sf_dir, min_weight=2)
    # pin the adjacency once: without this every round's frontier
    # join re-runs the whole copurchase build (lineitem scan +
    # per-order explode). localCheckpoint, not persist — the frontier
    # side is K-ball-sized and broadcasts every round, so a cache's
    # preserved hashpartitioning(src) buys nothing while its columnar
    # build + GC pressure measured 3-4x the checkpoint cost on the
    # Pregel kernels (see operators/graph._pagerank_rounds)
    adj = symmetrize(edges.select("src", "dst")).localCheckpoint(
        eager=False
    )
    nodes = adj.select(F.col("src").alias("node")).distinct()
    source = nodes.agg(F.min("node")).collect()[0][0]  # one scalar
    labels = (
        nodes.filter(F.col("node") == source)
        .select("node", F.lit(0).cast("int").alias("dist"))
    )
    frontier = labels
    for r in range(1, 4):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(labels, "node", "left_anti")
            .select("node", F.lit(r).cast("int").alias("dist"))
        )
        labels = labels.unionByName(nxt).localCheckpoint(eager=False)
        frontier = labels.filter(F.col("dist") == r)
    return labels.select(
        F.col("node").cast("bigint").alias("node"), "dist"
    ).orderBy("dist", "node")
