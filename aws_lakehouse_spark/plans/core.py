"""Core relational query surface (SURVEY §2.1-2.7 → §2.13 mapping).

Each entry pairs a DataFrame builder with its DuckDB oracle SQL.
Float aggregates are rounded identically on both sides (sum→2dp,
avg→4dp) because double addition order differs across engines;
top-k queries always carry a unique tie-break key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.operators import (
    anti_join,
    dedupe_by_key,
    distinct_projection,
    filter_quality_null_flags,
    filter_range_quality,
    group_agg,
    group_topk,
    join_fact_dim,
    left_enrich,
    range_join,
    rank_per_group,
    semi_join,
    union_relations,
    windowed_running,
)
from aws_lakehouse_spark.operators.aggregates import count_star, cube_agg, rollup_agg
from aws_lakehouse_spark.operators.setops import (
    except_relations,
    intersect_relations,
)
from aws_lakehouse_spark.registry import register

# ---------------------------------------------------------------- scans


@register(
    "scan_parquet",
    oracle="SELECT * FROM lineitem",
    category="2.1 scans",
    doc="S1 — full parquet scan of the fact table "
    "(ref glue-jobs/noaa_ghcn_bronze_to_silver.py:46-50).",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


# ------------------------------------------------------- projections


@register(
    "project_rename_cast",
    oracle="""
    SELECT l_orderkey AS order_id,
           CAST(l_linenumber AS BIGINT) AS line_no,
           l_quantity AS qty,
           l_extendedprice AS price,
           l_returnflag AS return_flag,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    """,
    category="2.2 projections",
    doc="P1 — typed snake_case standardization projection "
    "(ref noaa_ghcn_bronze_to_silver.py:76-85).",
)
def project_rename_cast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").cast("bigint").alias("line_no"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@register(
    "derive_column",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
    category="2.2 projections",
    doc="P2/F14 — derived metric columns (ref README.md:348,382-383; "
    "noaa_ghcn_bronze_to_silver.py:95-99). Raw per-row double "
    "arithmetic is bitwise-identical across engines, no rounding.",
)
def derive_column_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.withColumns(
        {
            "revenue": F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "charge": F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
        }
    ).select("l_orderkey", "l_linenumber", "revenue", "charge")


# ------------------------------------------------------------ filters


@register(
    "filter_quality_null_flags",
    oracle="""
    SELECT * FROM lineitem
    WHERE l_quantity IS NOT NULL
      AND (l_returnflag IS NULL OR l_returnflag = '' OR l_returnflag = 'N')
    """,
    category="2.2 filters",
    doc="P3 — quality-flag filter: measurement present, flag in the "
    "ok-set (ref noaa_ghcn_bronze_to_silver.py:86-90; ''≡no issue, "
    "'N'≡none sentinel in the synthetic schema).",
)
def filter_quality_null_flags_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return filter_quality_null_flags(
        li, "l_quantity", "l_returnflag", ok_values=("", "N")
    )


@register(
    "filter_range_quality",
    oracle="""
    SELECT * FROM lineitem
    WHERE l_quantity > 0 AND l_quantity < 50
      AND l_discount >= 0 AND l_discount <= 0.08
      AND l_extendedprice >= 0
    """,
    category="2.2 filters",
    doc="P5 — chained range quality rules (ref README.md:90-94: "
    "duration/distance/fare bounds → qty/discount/price bounds).",
    bench=True,
)
def filter_range_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return filter_range_quality(
        li,
        [
            F.col("l_quantity") > 0,
            F.col("l_quantity") < 50,
            F.col("l_discount") >= 0,
            F.col("l_discount") <= 0.08,
            F.col("l_extendedprice") >= 0,
        ],
    )


# ------------------------------------------------------------- joins


@register(
    "join_fact_dim_equi",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    category="2.3 joins",
    doc="J1 — star equi-join fact→dim on surrogate key, dim "
    "broadcast (ref README.md:256-264).",
)
def join_fact_dim_equi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = join_fact_dim(
        orders, customer, orders.o_custkey == customer.c_custkey
    )
    return group_agg(
        joined,
        ["c_mktsegment"],
        {
            "n_orders": F.count(F.lit(1)),
            "total_price": F.round(F.sum("o_totalprice"), 2),
        },
    )


@register(
    "join_fact_dim_zone",
    oracle="""
    SELECT s.s_name, COUNT(*) AS n_items,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
    category="2.3 joins",
    doc="J2 — star join with different key names each side "
    "(ref README.md:266-275 pickup_zone_id=zone_id shape).",
)
def join_fact_dim_zone_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    joined = join_fact_dim(li, supplier, li.l_suppkey == supplier.s_suppkey)
    return group_agg(
        joined,
        ["s_name"],
        {
            "n_items": F.count(F.lit(1)),
            "total_qty": F.round(F.sum("l_quantity"), 2),
        },
    )


@register(
    "join_enrich_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    category="2.3 joins",
    doc="J3 — left-join dim enrichment chain (ref stations→countries "
    "prefix lookup, noaa_dimensions_bronze_to_silver.py:118-120).",
)
def join_enrich_left_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    out = left_enrich(customer, nation, customer.c_nationkey == nation.n_nationkey)
    out = left_enrich(out, region, out.n_regionkey == region.r_regionkey)
    return out.select("c_custkey", "c_name", "n_name", "r_name")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    category="2.3 joins",
    doc="Engine extension — EXISTS semi-join (customers with orders).",
)
def join_semi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return semi_join(
        customer, orders, customer.c_custkey == orders.o_custkey
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    category="2.3 joins",
    doc="Engine extension — NOT EXISTS anti-join (customers without "
    "orders).",
)
def join_anti_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return anti_join(
        customer, orders, customer.c_custkey == orders.o_custkey
    ).select("c_custkey", "c_name")


@register(
    "join_range",
    oracle="""
    WITH bands(lo, hi, band) AS (
        VALUES (0.0, 930.0, 'budget'),
               (930.0, 960.0, 'mid'),
               (960.0, 1000000.0, 'premium')
    )
    SELECT p.p_partkey, p.p_retailprice, b.band
    FROM part p JOIN bands b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
    category="2.3 joins",
    doc="Engine extension — interval/range join against a broadcast "
    "band table (BroadcastNestedLoop: right side is 3 rows).",
)
def join_range_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(0.0, 930.0, "budget"), (930.0, 960.0, "mid"), (960.0, 1e6, "premium")],
        "lo double, hi double, band string",
    )
    joined = range_join(
        part,
        bands,
        (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
    )
    return joined.select("p_partkey", "p_retailprice", "band")


@register(
    "join_asof",
    oracle="""
    SELECT l.event_id, l.user_id, CAST(l.ts AS TIMESTAMP) AS ts,
           r.value AS value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND CAST(l.ts AS TIMESTAMP) >= r.ts
    """,
    category="2.3 joins",
    doc="Engine extension — as-of join (each purchase ↔ most recent "
    "preceding error per user), single-shuffle union+window "
    "implementation (operators.joins.asof_join).",
    bench=True,
)
def join_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    from aws_lakehouse_spark.operators import asof_join

    out = asof_join(
        purchases, errors, ["user_id"], "ts", ["value"], direction="backward"
    )
    return out.select("event_id", "user_id", "ts", F.col("value_asof"))


# --------------------------------------------------------- aggregates


@register(
    "agg_count_star",
    oracle="SELECT COUNT(*) AS n_rows FROM lineitem",
    category="2.4 aggregates",
    doc="A1 — COUNT(*) (ref README.md:253).",
)
def agg_count_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return count_star(load_table(spark, sf_dir, "lineitem"))


@register(
    "agg_group_sum_avg_count",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    category="2.4 aggregates",
    doc="A2 — grouped COUNT/SUM/AVG/MIN/MAX revenue rollup "
    "(ref README.md:256-264).",
)
def agg_group_sum_avg_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return group_agg(
        orders,
        ["o_orderstatus"],
        {
            "n_orders": F.count(F.lit(1)),
            "total_price": F.round(F.sum("o_totalprice"), 2),
            "avg_price": F.round(F.avg("o_totalprice"), 4),
            "min_price": F.min("o_totalprice"),
            "max_price": F.max("o_totalprice"),
        },
    )


@register(
    "agg_group_topk",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n_items
    FROM lineitem GROUP BY l_partkey
    ORDER BY n_items DESC, l_partkey LIMIT 10
    """,
    category="2.4 aggregates",
    doc="A3/O2 — grouped top-k (ref README.md:266-275 top-10 zones); "
    "plans TakeOrderedAndProject, unique tie-break on l_partkey.",
)
def agg_group_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return group_topk(
        li,
        ["l_partkey"],
        {"n_items": F.count(F.lit(1))},
        [F.desc("n_items"), F.asc("l_partkey")],
        10,
    )


@register(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS year,
                    CAST(month(o_orderdate) AS INTEGER) AS month,
                    CAST(day(o_orderdate) AS INTEGER) AS day
    FROM orders
    """,
    category="2.4 aggregates",
    doc="A4 — SELECT DISTINCT dimension extraction (ref "
    "noaa_ghcn_silver_to_gold.py:56-79 dim_date build).",
)
def distinct_projection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return distinct_projection(
        orders,
        [
            F.year(d).cast("int").alias("year"),
            F.month(d).cast("int").alias("month"),
            F.dayofmonth(d).cast("int").alias("day"),
        ],
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days
    FROM orders
    """,
    category="2.4 aggregates",
    doc="Engine extension — exact multi-column COUNT DISTINCT.",
)
def agg_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
    )


@register(
    "agg_approx_count_distinct",
    # the sketch estimate itself is engine-specific, so the oracle
    # checks the EXACT cardinalities plus a certified error bound:
    # Spark emits (|approx-exact|/exact <= 5%) computed from its own
    # HLL++ result, the oracle emits literal TRUE — a hash match
    # proves the sketch landed within tolerance (measured ~1% at
    # rsd=0.02), not merely that some row came back
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_5pct,
           TRUE AS orders_within_5pct
    FROM lineitem
    """,
    category="2.4 aggregates",
    doc="Engine extension — HyperLogLog++ approximate count-distinct "
    "(the 100 TB path where exact distinct is a full shuffle): one "
    "query computes both the exact and the sketch cardinality and "
    "certifies the sketch's relative error ≤ 5% in-band, turning an "
    "unavoidably-approximate op into an oracle-checkable row.",
)
def agg_approx_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def within(approx, exact):
        return (
            F.abs(approx - exact) / exact <= F.lit(0.05)
        )

    # one aggregate per distinct COLUMN, not one mixed aggregate:
    # count-distincts on two different columns in a single agg force
    # Catalyst's Expand (every fact row replicated once per distinct
    # group before the shuffle — 3x the scan into the exchange).
    # Split per column, each agg is a clean partial-distinct shuffle;
    # the one-row results broadcast-crossJoin back. Measured at sf1
    # local[8], interleaved A/B: 39-52 s mixed vs 7.9-8.5 s split
    # (~5x) — and at 100 TB the mixed shape's Expand triples the
    # fact-table shuffle volume.
    parts = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("__ap"),
    )
    orders = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("__ao"),
    )
    agg = parts.crossJoin(F.broadcast(orders))
    return agg.select(
        "exact_parts",
        "exact_orders",
        within(F.col("__ap"), F.col("exact_parts")).alias("parts_within_5pct"),
        within(F.col("__ao"), F.col("exact_orders")).alias(
            "orders_within_5pct"
        ),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    category="2.4 aggregates",
    doc="Engine extension — ROLLUP grouping sets with GROUPING() "
    "indicators.",
)
def agg_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return rollup_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        {
            "g_status": F.grouping("o_orderstatus").cast("int"),
            "g_priority": F.grouping("o_orderpriority").cast("int"),
            "n_orders": F.count(F.lit(1)),
            "total_price": F.round(F.sum("o_totalprice"), 2),
        },
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           COUNT(*) AS n_items,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category="2.4 aggregates",
    doc="Engine extension — CUBE grouping sets.",
)
def agg_cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return cube_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "g_flag": F.grouping("l_returnflag").cast("int"),
            "g_status": F.grouping("l_linestatus").cast("int"),
            "n_items": F.count(F.lit(1)),
            "total_qty": F.round(F.sum("l_quantity"), 2),
        },
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    category="2.4 aggregates",
    doc="Engine extension — statistical aggregates (stddev/variance/"
    "corr/exact median).",
)
def agg_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return group_agg(
        li,
        ["l_returnflag"],
        {
            "sd_qty": F.round(F.stddev_samp("l_quantity"), 4),
            "var_qty": F.round(F.var_samp("l_quantity"), 4),
            "corr_qty_price": F.round(
                F.corr("l_quantity", "l_extendedprice"), 4
            ),
            "median_qty": F.round(
                F.expr("percentile(l_quantity, 0.5)"), 4
            ),
        },
    )


# ------------------------------------------------------------ windows


@register(
    "dedupe_by_key_window",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
            ORDER BY o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    category="2.5 windows",
    doc="W1 — window dedup on composite key with deterministic "
    "tie-break (ref README.md:95,307 'Deduplicação (window "
    "functions)'); duplicates exist by construction in orders.",
    bench=True,
)
def dedupe_by_key_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "__d", F.col("o_orderdate").cast("date")
    )
    out = dedupe_by_key(orders, ["o_custkey", "__d"], [F.asc("o_orderkey")])
    return out.drop("__d")


@register(
    "rank_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice, ROW_NUMBER() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
    category="2.5 windows",
    doc="W2 — per-group top-k ranking (README top-10 generalized to "
    "per-group).",
)
def rank_topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = rank_per_group(
        orders,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )
    return out.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.col("rnk").cast("int").alias("rnk")
    )


@register(
    "window_running_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg3
    FROM orders
    """,
    category="2.5 windows",
    doc="Frame-spec running total + moving average (SURVEY §2.5 "
    "rowsBetween extension).",
)
def window_running_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = windowed_running(
        orders,
        ["o_custkey"],
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        {
            "running_total": (F.sum("o_totalprice"), None, 0),
            "moving_avg3": (F.avg("o_totalprice"), -2, 0),
        },
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("running_total", 2).alias("running_total"),
        F.round("moving_avg3", 4).alias("moving_avg3"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           lag(value) OVER w AS prev_value,
           CAST(date_diff('second',
                lag(CAST(ts AS TIMESTAMP)) OVER w,
                CAST(ts AS TIMESTAMP)) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    category="2.5 windows",
    doc="Engine extension — lag/lead event-sequence analytics "
    "(inter-event gap per user).",
)
def window_lag_lead_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return events.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.unix_timestamp(F.lag(F.col("ts").cast("timestamp")).over(w))
        )
        .cast("bigint")
        .alias("secs_since_prev"),
    )


# -------------------------------------------------------- sorts/limits


@register(
    "order_by_desc",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    category="2.6 sorts",
    doc="O1 — global descending sort (ref README.md:264); Spark "
    "plans a range-partitioned sort.",
)
def order_by_desc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    category="2.6 sorts",
    doc="O2 — ORDER BY ... LIMIT k (ref README.md:274-275) → "
    "TakeOrderedAndProject, no global sort.",
)
def limit_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ------------------------------------------------------------- set ops


@register(
    "set_union_by_name",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    category="2.7 set ops",
    doc="UNION ALL by name across heterogeneous sources (ref "
    "README.md:120-121 yellow+green union into one Silver table).",
)
def set_union_by_name_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return union_relations(
        [
            customer.select(
                F.col("c_nationkey").alias("nationkey"),
                F.lit("customer").alias("side"),
            ),
            supplier.select(
                F.col("s_nationkey").alias("nationkey"),
                F.lit("supplier").alias("side"),
            ),
        ]
    )


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="2.7 set ops",
    doc="INTERSECT (distinct) of two key sets.",
)
def set_intersect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return intersect_relations(
        customer.select(F.col("c_nationkey").alias("nationkey")),
        supplier.select(F.col("s_nationkey").alias("nationkey")),
    )


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="2.7 set ops",
    doc="EXCEPT (distinct): nations with customers but no suppliers.",
)
def set_except_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return except_relations(
        customer.select(F.col("c_nationkey").alias("nationkey")),
        supplier.select(F.col("s_nationkey").alias("nationkey")),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS first_key
    FROM orders
    WHERE o_orderkey <= 1000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    category="2.5 windows",
    doc="The full ranking-function family (rank/dense_rank/ntile/"
    "percent_rank/cume_dist/first_value) over one shared window "
    "spec — one shuffle + one sort serves all six.",
)
def window_rank_family_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_key"),
    )


@register(
    "scalar_string_family",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           concat_ws('|', c_mktsegment, c_name) AS tagged,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER)
             AS lev_building,
           CAST(length(c_name) AS INTEGER) AS name_len,
           reverse(c_mktsegment) AS rseg
    FROM customer
    """,
    category="2.8 scalar",
    doc="String-function family breadth (upper/lpad/concat_ws/"
    "translate/levenshtein/length/reverse) — pure scan+project, "
    "whole-stage codegen end-to-end.",
)
def scalar_string_family_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
        F.length("c_name").cast("int").alias("name_len"),
        F.reverse("c_mktsegment").alias("rseg"),
    )


@register(
    "scalar_array_family",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(list_sum(list_transform(embedding::DOUBLE[], x -> x)), 6)
             AS vec_sum,
           ROUND(embedding[1]::DOUBLE, 6) AS first_dim,
           ROUND(list_max(embedding::DOUBLE[]), 6) AS max_dim,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0))
                AS INTEGER) AS n_positive,
           ROUND(list_sum(list_transform(list_slice(embedding::DOUBLE[], 1, 8),
                 x -> x * x)), 6) AS head_energy
    FROM embeddings
    """,
    category="2.8 scalar",
    doc="Array-function family over the embedding column (size, "
    "aggregate-fold sum, element_at, array_max, higher-order "
    "filter, slice + transform) — all JVM expressions, the basis "
    "the similarity tier builds on.",
)
def scalar_array_family_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    fold = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    head = F.slice(v, 1, 8)
    head_energy = F.aggregate(
        F.transform(head, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return emb.select(
        "vec_id",
        F.size(v).cast("int").alias("dim"),
        F.round(fold, 6).alias("vec_sum"),
        F.round(F.element_at(v, 1), 6).alias("first_dim"),
        F.round(F.array_max(v), 6).alias("max_dim"),
        F.size(F.filter(v, lambda x: x > 0)).cast("int").alias("n_positive"),
        F.round(head_energy, 6).alias("head_energy"),
    )


@register(
    "scalar_date_family",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS review_date,
           date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
           CAST(round(12 * (1999 - year(CAST(o_orderdate AS DATE)))
                + 12 * 1 - 12 * month(CAST(o_orderdate AS DATE))
                , 0) AS INTEGER) AS months_to_y2k_approx
    FROM orders WHERE o_orderkey <= 500
    """,
    category="2.8 scalar",
    doc="Date-arithmetic family (date_add, add_months, trunc, "
    "last_day, datediff, month spans) — all pushed-down JVM "
    "expressions over the order-date column.",
)
def scalar_date_family_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate").cast("date")
    months_approx = (
        12 * (F.lit(1999) - F.year(d)) + 12 - 12 * F.month(d)
    ).cast("int")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.add_months(d, 3).alias("review_date"),
        F.trunc(d, "month").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"), d)
        .cast("int")
        .alias("days_to_y2k"),
        months_approx.alias("months_to_y2k_approx"),
    )


@register(
    "set_multiset_ops",
    oracle="""
    WITH a AS (
        SELECT o_orderpriority FROM orders WHERE o_custkey < 100
    ), b AS (
        SELECT o_orderpriority FROM orders
        WHERE o_custkey BETWEEN 50 AND 150
    ), ia AS (
        SELECT o_orderpriority FROM a
        INTERSECT ALL
        SELECT o_orderpriority FROM b
    ), ea AS (
        SELECT o_orderpriority FROM a
        EXCEPT ALL
        SELECT o_orderpriority FROM b
    )
    SELECT 'intersect_all' AS op, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ia GROUP BY o_orderpriority
    UNION ALL
    SELECT 'except_all' AS op, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ea GROUP BY o_orderpriority
    """,
    category="2.7 set ops",
    doc="Multiset INTERSECT ALL / EXCEPT ALL (the bag-semantics "
    "complement of the distinct set ops): row multiplicity is "
    "preserved — a priority occurring 3x in slice A and 2x in the "
    "overlapping slice B intersects 2x and subtracts to 1x, which "
    "DISTINCT-based set ops cannot express. Spark plans both as a "
    "single-shuffle aggregate of per-side counts (no sort), the "
    "same shape DuckDB uses — and the multiplicity rollup keyed on "
    "a 5-value column makes the multiset arithmetic itself the "
    "checked output.",
)
def set_multiset_ops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_custkey") < 100).select("o_orderpriority")
    b = orders.filter(F.col("o_custkey").between(50, 150)).select(
        "o_orderpriority"
    )
    ia = (
        intersect_relations(a, b, keep_duplicates=True)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "o_orderpriority", "n")
    )
    ea = (
        except_relations(a, b, keep_duplicates=True)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("except_all").alias("op"), "o_orderpriority", "n")
    )
    return ia.unionByName(ea)


@register(
    "join_null_safe",
    oracle="""
    WITH c AS (
        SELECT NULLIF(c_nationkey, 5) AS k FROM customer
    ), s AS (
        SELECT NULLIF(s_nationkey, 5) AS k FROM supplier
    )
    SELECT c.k AS nation_k, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k
    ORDER BY nation_k NULLS FIRST
    """,
    category="2.3 joins (J-ext null-safe)",
    doc="Null-safe equi-join (Spark `<=>` / SQL IS NOT DISTINCT "
    "FROM): NULL keys match each other instead of silently dropping "
    "— the semantics a dedup or reconciliation join needs when the "
    "key itself can be legitimately absent (here NULLIF carves a "
    "deterministic NULL class out of the nation key). Executes as a "
    "regular broadcast hash join: `<=>` is an equality predicate to "
    "the planner, so no fallback to nested-loop — same plan shape "
    "at any scale.",
)
def join_null_safe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(5)).alias("ck")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(5)).alias("sk")
    )
    return (
        cust.join(F.broadcast(supp), F.col("ck").eqNullSafe(F.col("sk")))
        .groupBy(F.col("ck").alias("nation_k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy(F.asc_nulls_first("nation_k"))
    )
