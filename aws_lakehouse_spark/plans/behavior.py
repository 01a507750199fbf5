"""Behavioral / product-analytics surface (engine extension).

Multi-step funnels, interval coverage (gaps-and-islands union),
calendar gap-filling with LOCF, item-item collaborative filtering,
association rules, and distributed contiguous id assignment — the
product-analytics and feature-engineering tier a lakehouse serves on
the same event/order tables. The reference's Athena-on-Gold surface
(SURVEY §3.3) answers exactly these question shapes interactively.

Scale notes (100 TB): every query reduces the raw table with a keyed
shuffle first (per-user stage reductions, per-order item sets,
per-day rollups) before any window or join; the lone unpartitioned
windows run on calendar- or vocabulary-bounded frames; co-occurrence
self-joins fan out by lines-per-order (bounded small), never all
pairs; id assignment is a two-level prefix sum, never a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.registry import register


@register(
    "events_funnel_steps",
    bench=True,  # r7 verdict item 5: heaviest non-bench queries join the watched set
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    ),
    steps AS (
        SELECT 1 AS step_no, 'view' AS step, COUNT(*) AS users FROM v
        UNION ALL
        SELECT 2, 'view>click', COUNT(*) FROM c
        UNION ALL
        SELECT 3, 'view>click>purchase', COUNT(*) FROM p
    )
    SELECT step_no, step, users,
           ROUND(CAST(users AS DOUBLE)
                 / MAX(users) OVER (), 4) AS pct_of_entry
    FROM steps
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="Strictly-ordered 3-step funnel (view -> later click -> later "
    "purchase): per-user first-touch timestamps chained by "
    "happened-after semi-joins, then step-level user counts and "
    "conversion vs the entry step. Scale shape: each stage is a "
    "keyed MIN aggregate per user (map-side combinable) and the "
    "chain joins are user-keyed equi-joins on the already-reduced "
    "per-user frames — the raw event table is scanned once per "
    "stage predicate and never self-joined row-to-row; the final "
    "window runs over exactly 3 rows.",
)
def events_funnel_steps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # the whole step chain in ONE user-partitioned pass (same fusion
    # as events_funnel, which measured the pinned per-stage chain at
    # 1.76x of this shape by interleaved A/B at sf0.1): each step's
    # first-qualifying timestamp is a min-over-user window whose
    # predicate reads the previous step's window column — a per-user
    # constant, so "strictly after step k-1" is row-local. No
    # per-stage scans, no join-backs, no pins; the windows and the
    # per-user collapse share one hash partitioning.
    wu = Window.partitionBy("user_id")
    t = F.col("ts")
    d = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
        .withColumn(
            "tv", F.min(F.when(F.col("event_type") == "view", t)).over(wu)
        )
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (t > F.col("tv")), t
                )
            ).over(wu),
        )
        .withColumn(
            "tp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (t > F.col("tc")),
                    t,
                )
            ).over(wu),
        )
    )
    per_user = d.groupBy("user_id").agg(
        F.min("tv").alias("tv"),
        F.min("tc").alias("tc"),
        F.min("tp").alias("tp"),
    )
    counts = per_user.agg(
        F.count("tv").alias("nv"),
        F.count("tc").alias("nc"),
        F.count("tp").alias("np"),
    )
    steps = counts.select(
        F.expr(
            "stack(3, 1, 'view', nv, 2, 'view>click', nc,"
            " 3, 'view>click>purchase', np)"
        ).alias("step_no", "step", "users")
    )
    w = Window.partitionBy()
    return steps.select(
        "step_no",
        "step",
        "users",
        F.round(
            F.col("users").cast("double") / F.max("users").over(w), 4
        ).alias("pct_of_entry"),
    )


@register(
    "events_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS s,
               epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
        FROM events
    ),
    marked AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM marked
    ),
    merged AS (
        SELECT user_id, island,
               MIN(s) AS island_s, MAX(e) AS island_e
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(island_e - island_s) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="Interval union per user (gaps-and-islands): every event opens "
    "a 30-minute activity interval; overlapping intervals merge, and "
    "the output is each user's merged-interval count plus exact "
    "covered time in integer microseconds (the 'active time' metric "
    "ad-hoc sessionization gets wrong by double-counting overlaps). "
    "Scale shape: one shuffle on user_id; island detection is the "
    "running-max-of-prior-ends window identity (never a self-join), "
    "so per-user work is a single ordered scan.",
)
def events_interval_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id", us.alias("s"), (us + F.lit(1800000000)).alias("e")
    )
    prev_w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(prev_w), 1).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(run_w))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("island_s"), F.max("e").alias("island_e")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(F.col("island_e") - F.col("island_s")).alias("covered_us"),
    )


@register(
    "ts_gap_fill",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1, 2
    ),
    bounds AS (
        SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
               MAX(CAST(o_orderdate AS DATE)) AS d1
        FROM orders
    ),
    calendar AS (
        SELECT p.priority, CAST(gs.day AS DATE) AS day
        FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders) p
        CROSS JOIN (
            SELECT UNNEST(generate_series(
                (SELECT d0 FROM bounds), (SELECT d1 FROM bounds),
                INTERVAL 1 DAY)) AS day
        ) gs
    )
    SELECT c.priority, c.day,
           COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.revenue, 0.0) AS revenue,
           ROUND(COALESCE(
               LAST_VALUE(d.revenue IGNORE NULLS) OVER (
                   PARTITION BY c.priority ORDER BY c.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0.0), 2) AS prev_known_revenue
    FROM calendar c LEFT JOIN daily d
      ON c.priority = d.priority AND c.day = d.day
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="Calendar densification + last-observation-carried-forward: "
    "daily revenue per order priority exploded onto the complete "
    "min..max date range (absent days appear with zero orders), plus "
    "the most recent prior known revenue per priority (LOCF) — the "
    "gap-filling step every downstream time-series model assumes has "
    "already happened. Scale shape: the fact table collapses to one "
    "row per (priority, day) BEFORE the calendar join; the calendar "
    "is sequence()-generated from a broadcast one-row min/max "
    "aggregate, so the dense frame is calendar-sized, and the LOCF "
    "window runs per-priority over that bounded frame.",
)
def ts_gap_fill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # bounds and priorities derive from the (priority x day) frame —
    # pin it once and orders is scanned once, not three times
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    priorities = daily.select("priority").distinct()
    calendar = (
        priorities.crossJoin(F.broadcast(bounds))
        .select(
            "priority",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    locf_w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        calendar.join(daily, ["priority", "day"], "left")
        .select(
            "priority",
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.round(
                F.coalesce(
                    F.last("revenue", ignorenulls=True).over(locf_w),
                    F.lit(0.0),
                ),
                2,
            ).alias("prev_known_revenue"),
        )
    )


# shared co-occurrence base for the two market-basket queries: DISTINCT
# (order, part) pairs, then an ordered self-join on the order key —
# fan-out is bounded by lines-per-order, never all part pairs
_COOC_SQL = """
    items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    part_cnt AS (
        SELECT l_partkey, COUNT(*) AS cnt FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS pair_cnt
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
"""


def _cooc(spark: SparkSession, sf_dir: str):
    """Market-basket base frames from ONE fact scan and ONE
    order-keyed shuffle: per-order distinct part sets (collect_set
    dedups in the same aggregate), lazily checkpointed at the
    fan-out — the basket count, the per-part counts, and the ordered
    pair expansion all reuse it. The pair fan-out is the nested
    array transform bounded by lines-per-order² (the same
    group-then-expand shape plans/graph.py measured 3x faster than
    the items self-join); pairs checkpoint too because both
    consumers symmetrize them via a two-branch union."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint(eager=False)
    )
    n_orders = per_order.agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    part_cnt = (
        per_order.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
    )
    pair_rows = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), "
        "y -> struct(x AS pa, y AS pb))))"
    )
    # mega-basket escape hatch (same hazard and routing as
    # plans.graph.copurchase_edges): the in-row expansion is |ps|^2/2
    # structs in ONE row, so baskets past the cap take an explode-
    # then-self-join whose fan-out lands in shuffle partitions
    max_basket = 1_000
    small = per_order.filter(F.size("ps") <= max_basket)
    big = per_order.filter(F.size("ps") > max_basket)
    small_pairs = small.select(F.explode(pair_rows).alias("p")).select(
        F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb")
    )
    bp = big.select("l_orderkey", F.explode("ps").alias("part"))
    big_pairs = (
        bp.select("l_orderkey", F.col("part").alias("pa"))
        .join(
            bp.select("l_orderkey", F.col("part").alias("pb")),
            "l_orderkey",
        )
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
    )
    pairs = (
        small_pairs.unionByName(big_pairs)
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("pair_cnt"))
        .localCheckpoint(eager=False)
    )
    return n_orders, part_cnt, pairs


@register(
    "recsys_item_cosine",
    oracle=f"""
    WITH {_COOC_SQL},
    sym AS (
        SELECT pa AS item, pb AS other, pair_cnt FROM pairs
        UNION ALL
        SELECT pb AS item, pa AS other, pair_cnt FROM pairs
    ),
    scored AS (
        SELECT s.item, s.other,
               ROUND(s.pair_cnt / SQRT(ca.cnt * cb.cnt), 6) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY s.item
                   ORDER BY s.pair_cnt / SQRT(ca.cnt * cb.cnt) DESC,
                            s.other
               ) AS rk
        FROM sym s
        JOIN part_cnt ca ON s.item = ca.l_partkey
        JOIN part_cnt cb ON s.other = cb.l_partkey
        WHERE s.pair_cnt >= 2
    )
    SELECT item, other, cosine, rk
    FROM scored WHERE rk <= 3
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="Item-item collaborative filtering: top-3 neighbors per part "
    "by co-purchase cosine (pair count over the geometric mean of "
    "per-part order counts), minimum support 2 — the classic "
    "neighborhood recommender build. Scale shape: DISTINCT "
    "(order, part) first, so the self-join fans out by items per "
    "order (bounded ~7 for this schema), never by part popularity "
    "alone; per-part counts are a broadcastable dimension-sized "
    "join-back; top-3 is a per-item window with a deterministic "
    "neighbor-id tie-break.",
)
def recsys_item_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    _n_orders, part_cnt, pairs = _cooc(spark, sf_dir)
    sym = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("other"), "pair_cnt"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("item"), F.col("pa").alias("other"), "pair_cnt"
        )
    )
    ca = part_cnt.select(
        F.col("l_partkey").alias("item"), F.col("cnt").alias("cnt_a")
    )
    cb = part_cnt.select(
        F.col("l_partkey").alias("other"), F.col("cnt").alias("cnt_b")
    )
    raw_cos = F.col("pair_cnt") / F.sqrt(F.col("cnt_a") * F.col("cnt_b"))
    scored = (
        sym.filter(F.col("pair_cnt") >= 2)
        .join(F.broadcast(ca), "item")
        .join(F.broadcast(cb), "other")
        .withColumn("__raw", raw_cos)
    )
    w = Window.partitionBy("item").orderBy(F.desc("__raw"), "other")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "item",
            "other",
            F.round("__raw", 6).alias("cosine"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


@register(
    "market_basket_rules",
    oracle=f"""
    WITH {_COOC_SQL},
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    rules AS (
        SELECT pa AS antecedent, pb AS consequent, pair_cnt FROM pairs
        UNION ALL
        SELECT pb AS antecedent, pa AS consequent, pair_cnt FROM pairs
    )
    SELECT r.antecedent, r.consequent, r.pair_cnt,
           ROUND(CAST(r.pair_cnt AS DOUBLE) / n.n_orders, 6) AS support,
           ROUND(CAST(r.pair_cnt AS DOUBLE) / ca.cnt, 6) AS confidence,
           ROUND((CAST(r.pair_cnt AS DOUBLE) / ca.cnt)
                 / (CAST(cb.cnt AS DOUBLE) / n.n_orders), 6) AS lift
    FROM rules r
    JOIN part_cnt ca ON r.antecedent = ca.l_partkey
    JOIN part_cnt cb ON r.consequent = cb.l_partkey
    CROSS JOIN n
    WHERE r.pair_cnt >= 3
    ORDER BY lift DESC, r.antecedent, r.consequent
    LIMIT 20
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="Association rules (A -> B) over order baskets: support, "
    "confidence, and lift from the same bounded co-occurrence join, "
    "top-20 by lift with deterministic pair tie-breaks — the "
    "market-basket rule mine (Agrawal-Srikant frequent-pairs tier) "
    "expressed as three keyed aggregates. Scale shape: identical "
    "pair fan-out bound as recsys_item_cosine; the order-count "
    "denominator is a broadcast one-row aggregate; top-20 plans as "
    "TakeOrderedAndProject, no global sort materializes.",
)
def market_basket_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, part_cnt, pairs = _cooc(spark, sf_dir)
    rules = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "pair_cnt",
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "pair_cnt",
        )
    )
    ca = part_cnt.select(
        F.col("l_partkey").alias("antecedent"), F.col("cnt").alias("cnt_a")
    )
    cb = part_cnt.select(
        F.col("l_partkey").alias("consequent"), F.col("cnt").alias("cnt_b")
    )
    conf = F.col("pair_cnt").cast("double") / F.col("cnt_a")
    return (
        rules.filter(F.col("pair_cnt") >= 3)
        .join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "pair_cnt",
            F.round(
                F.col("pair_cnt").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                conf / (F.col("cnt_b").cast("double") / F.col("n_orders")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(20)
    )


@register(
    "sink_identity_column",
    oracle="""
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (ORDER BY lang, doc_id) AS row_id
    FROM documents
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="Distributed contiguous id assignment: every document gets a "
    "gap-free 1..N row_id in (lang, doc_id) order WITHOUT a global "
    "sort — the identity-column / surrogate-key write shape "
    "(zipWithIndex expressed natively in DataFrame ops). Scale "
    "shape: a two-level prefix sum — order-preserving (lang, "
    "doc_id-range) buckets, per-bucket counts (one small agg), "
    "exclusive bucket offsets via a window over the bucket-count- "
    "sized frame, broadcast back, then a PARTITIONED local "
    "row_number per bucket (groups bounded by the bucket width). "
    "The full table never passes through a single-partition window; "
    "bucket width is the knob that keeps the offset frame "
    "driver-broadcastable at 100 TB.",
)
def sink_identity_column_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket_width = 64
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("doc_id") / bucket_width).alias("__dbucket"),
    )
    per_bucket = d.groupBy("lang", "__dbucket").agg(
        F.count("*").alias("__n")
    )
    off_w = Window.orderBy("lang", "__dbucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "lang",
        "__dbucket",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__offset"),
    )
    local_w = Window.partitionBy("lang", "__dbucket").orderBy("doc_id")
    return (
        d.join(F.broadcast(offsets), ["lang", "__dbucket"])
        .select(
            "doc_id",
            "lang",
            (F.col("__offset") + F.row_number().over(local_w)).alias(
                "row_id"
            ),
        )
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
                 AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
    ),
    act AS (
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, uw.week) // 7
                    AS BIGINT) AS week_offset,
               COUNT(DISTINCT uw.user_id) AS n_active
        FROM uw JOIN cohort c ON uw.user_id = c.user_id
        GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size
        FROM cohort GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset, a.n_active,
           ROUND(CAST(a.n_active AS DOUBLE) / s.cohort_size, 4)
             AS retention
    FROM act a JOIN sizes s ON a.cohort_week = s.cohort_week
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="Cohort retention triangle: users grouped by the week of "
    "their first activity, then the fraction of each cohort active "
    "at every week offset — the canonical growth-analytics matrix. "
    "Scale shape: the raw event table collapses to DISTINCT (user, "
    "week) FIRST (one shuffle, map-side combinable), so the cohort "
    "min-reduction and the offset rollup both run on the reduced "
    "frame; cohort sizes are a weeks-sized broadcast join-back.",
)
def events_cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # fully fused, ONE fact scan, no pins: the cohort week is a
    # min-over-user WINDOW on the distinct user-week frame (no
    # groupBy+join-back — the window reuses the frame in place), and
    # the cohort size is the triangle's own week_offset-0 cell (every
    # user is active in their min week by definition), read back with
    # a cohort-keyed window over the tiny aggregated frame. The
    # earlier groupBy+join shape re-ran the fact scan per consumer
    # unpinned (round-7 rescan audit) and measured 1.09-1.16x at
    # sf0.1 with checkpoint pins (job-boundary stalls on narrow
    # frames); this shape needs neither.
    uw = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts").cast("timestamp"))
        .cast("date")
        .alias("week"),
    ).distinct()
    withc = uw.withColumn(
        "cohort_week",
        F.min("week").over(Window.partitionBy("user_id")),
    )
    act = withc.groupBy(
        "cohort_week",
        F.floor(F.datediff("week", "cohort_week") / 7)
        .cast("long")
        .alias("week_offset"),
    ).agg(F.countDistinct("user_id").alias("n_active"))
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort_week"))
    return act.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(
            F.col("n_active").cast("double") / cohort_size, 4
        ).alias("retention"),
    )


@register(
    "customer_rfm_segmentation",
    oracle="""
    WITH ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_d FROM orders),
    rfm AS (
        SELECT o_custkey AS c_custkey,
               date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                         (SELECT ref_d FROM ref)) AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    b AS (
        SELECT ROUND(quantile_cont(recency_days, 0.5), 6) AS r50,
               ROUND(quantile_cont(frequency, 0.5), 6) AS f50,
               ROUND(quantile_cont(monetary, 0.5), 6) AS m50
        FROM rfm
    )
    SELECT r.c_custkey,
           CAST(r.recency_days AS BIGINT) AS recency_days,
           CAST(r.frequency AS BIGINT) AS frequency,
           r.monetary,
           CAST(CASE WHEN r.recency_days <= b.r50 THEN 2 ELSE 1 END
                AS BIGINT) AS r_score,
           CAST(CASE WHEN r.frequency > b.f50 THEN 2 ELSE 1 END
                AS BIGINT) AS f_score,
           CAST(CASE WHEN r.monetary > b.m50 THEN 2 ELSE 1 END
                AS BIGINT) AS m_score,
           CASE
             WHEN r.recency_days <= b.r50 AND r.frequency > b.f50
                  AND r.monetary > b.m50 THEN 'champion'
             WHEN r.recency_days <= b.r50 THEN 'active'
             WHEN r.frequency > b.f50 OR r.monetary > b.m50
                  THEN 'at_risk_valuable'
             ELSE 'dormant'
           END AS segment
    FROM rfm r CROSS JOIN b
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="RFM customer segmentation (recency / frequency / monetary): "
    "per-customer metrics reduced in ONE keyed aggregate, scored "
    "against exact interpolated median boundaries (Spark "
    "`percentile` == DuckDB `quantile_cont`, 6-dp-rounded before "
    "comparison so the cut is engine-stable), then a CASE segment "
    "label. Scale shape: boundaries come from one map-side-"
    "combinable aggregate broadcast back as a ONE-ROW frame — the "
    "production-scalable design (assign-by-comparison), NOT an "
    "ntile window over the whole customer dimension, which would "
    "funnel every customer through one partition.",
)
def customer_rfm_segmentation_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ref = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("ref_d")
    )
    rfm = (
        orders.crossJoin(F.broadcast(ref))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.datediff(
                F.first("ref_d"), F.max(F.col("o_orderdate").cast("date"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .localCheckpoint(eager=False)
    )
    b = rfm.agg(
        F.round(F.expr("percentile(recency_days, 0.5)"), 6).alias("r50"),
        F.round(F.expr("percentile(frequency, 0.5)"), 6).alias("f50"),
        F.round(F.expr("percentile(monetary, 0.5)"), 6).alias("m50"),
    )
    r_hot = F.col("recency_days") <= F.col("r50")
    f_hot = F.col("frequency") > F.col("f50")
    m_hot = F.col("monetary") > F.col("m50")
    return rfm.crossJoin(F.broadcast(b)).select(
        "c_custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary",
        F.when(r_hot, 2).otherwise(1).cast("bigint").alias("r_score"),
        F.when(f_hot, 2).otherwise(1).cast("bigint").alias("f_score"),
        F.when(m_hot, 2).otherwise(1).cast("bigint").alias("m_score"),
        F.when(r_hot & f_hot & m_hot, "champion")
        .when(r_hot, "active")
        .when(f_hot | m_hot, "at_risk_valuable")
        .otherwise("dormant")
        .alias("segment"),
    )


@register(
    "agg_abc_classification",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                   * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(revenue_cents) AS total FROM pr),
    c AS (
        SELECT l_partkey, revenue_cents,
               ROUND(CAST(SUM(revenue_cents) OVER (
                   ORDER BY revenue_cents DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / (SELECT total FROM tot), 9) AS cum_share
        FROM pr
    )
    SELECT l_partkey, revenue_cents, cum_share,
           CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
    category="2.14 behavioral analytics (engine extension)",
    doc="ABC (Pareto) inventory classification: per-part revenue, "
    "cumulative revenue share in descending-revenue order, and the "
    "80/95 class cut — the stock-prioritization classic. Revenue is "
    "INTEGER CENTS: each row's double product is bit-identical on "
    "both engines, floor(x*100+0.5) lands it on the same integer, "
    "and integer sums are addition-order-free — so neither the "
    "per-part totals nor the running shares can drift at a rounding "
    "boundary the way ROUND(SUM(double)) does. Scale shape: "
    "the fact table collapses to the PART DIMENSION first (one "
    "keyed shuffle); the ranked cumsum then runs over that "
    "dimension-sized frame — fine while parts ≪ facts; a "
    "corpus-scale variant would reuse the two-level prefix sum "
    "(sink_identity_column) over revenue-ordered buckets.",
)
def agg_abc_classification_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.functions.scalar import finite

    li = load_table(spark, sf_dir, "lineitem")
    # finite(): a NaN/Inf price (corrupt ingest) becomes an excluded
    # NULL instead of an ANSI long-overflow in floor(); identity on
    # healthy data, so oracle parity is untouched
    cents = F.floor(
        finite(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
        + 0.5
    ).cast("bigint")
    pr = (
        li.groupBy("l_partkey")
        .agg(F.sum(cents).cast("bigint").alias("revenue_cents"))
        .localCheckpoint(eager=False)
    )
    tot = pr.agg(F.sum("revenue_cents").alias("total"))
    w = Window.orderBy(F.desc("revenue_cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = pr.crossJoin(F.broadcast(tot)).withColumn(
        "cum_share",
        F.round(
            F.sum("revenue_cents").over(w).cast("double") / F.col("total"),
            9,
        ),
    )
    return c.select(
        "l_partkey",
        "revenue_cents",
        "cum_share",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
