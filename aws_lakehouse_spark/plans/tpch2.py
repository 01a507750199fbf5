"""TPC-H-style analytics, second batch (Q7/Q10/Q15/Q17/Q19/Q22
adapted to the synthetic schema) — exercises the decorrelation
surface: scalar subqueries, correlated-average predicates, NOT
EXISTS, disjunctive join predicates, and CTE-reused aggregates.

Plan postures (enforced where it matters in tests/test_plans.py):
- correlated subqueries are decorrelated by hand into aggregate +
  join (Q17) or aggregate + cross-broadcast of a scalar (Q15/Q22) —
  never a per-row subquery;
- bounded dims (nation) broadcast; everything that scales with the
  fact is AQE's choice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.registry import register


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(CAST(l.l_shipdate AS DATE)) AS INTEGER) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND CAST(l.l_shipdate AS DATE) BETWEEN DATE '1995-01-01'
                                         AND DATE '1996-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    category="TPC-H surface",
    doc="Q7 volume shipping: 5-way join with a disjunctive "
    "cross-nation predicate; both nation sides broadcast (bounded), "
    "the fact chain is AQE's choice.",
)
def tpch_q7_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate")
        .cast("date")
        .between(F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-10-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    category="TPC-H surface",
    doc="Q10 returned items: quarter + returnflag filters at the "
    "scans, 4-way join, top-20 by lost revenue "
    "(TakeOrderedAndProject).",
)
def tpch_q10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                 AS total_revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    category="TPC-H surface",
    doc="Q15 top supplier: CTE reused for both the per-supplier "
    "aggregate and its max — the scalar subquery decorrelates to a "
    "rank-1 window over the ALREADY-aggregated (tiny) revenue "
    "table, so the unpartitioned window never sees fact-scale "
    "rows. Revenue rounded before the max comparison so float "
    "summation order can't flip the winner across engines.",
)
def tpch_q15_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    top = revenue.withColumn(
        "__rk", F.rank().over(Window.orderBy(F.desc("total_revenue")))
    ).filter(F.col("__rk") == 1)
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(top, s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
    category="TPC-H surface",
    doc="Q17 small-quantity-order revenue: the classic correlated "
    "subquery, decorrelated by hand into a per-part average "
    "aggregate joined back to the fact — one extra aggregate on "
    "the join key instead of a subquery per row.",
)
def tpch_q17_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
    """,
    category="TPC-H surface",
    doc="Q19 disjunctive predicates: the OR-of-conjunctions rides "
    "the equi-join as a residual; Catalyst derives the common "
    "p_brand/p_size and l_quantity implied filters and pushes them "
    "to both scans.",
)
def tpch_q19_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond1 | cond2)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q22_global_sales",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01'
      )
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    category="TPC-H surface",
    doc="Q22 dormant high-balance customers (adapted: nation stands "
    "in for the phone country code; dormant = no orders since "
    "1998): scalar-average subquery as a broadcast single-row "
    "cross join, NOT EXISTS as a left-anti join on the customer "
    "key with the date filter pushed into the anti side's scan.",
)
def tpch_q22_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").cast("date")
            >= F.lit("1998-01-01").cast("date")
        )
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH base AS (
        SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                                              AND DATE '1996-12-31'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) / SUM(volume), 6) AS mkt_share
    FROM base GROUP BY o_year ORDER BY o_year
    """,
    category="TPC-H surface",
    doc="Q8 national market share: 7-way star with a share-of-total "
    "conditional ratio per year — numerator and denominator in the "
    "same hash aggregate, one pass.",
)
def tpch_q8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        .cast("date")
        .between(
            F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date")
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .select(
            F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(0.0)
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q12_priority_counts",
    oracle="""
    SELECT l.l_returnflag AS flag_group,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY flag_group ORDER BY flag_group
    """,
    category="TPC-H surface",
    doc="Q12 (adapted: order priority stands in for the missing "
    "shipmode): join + dual conditional counts in one aggregate "
    "pass.",
)
def tpch_q12_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("flag_group"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("flag_group")
    )


@register(
    "tpch_q16_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
    category="TPC-H surface",
    doc="Q16 supplier counts (adapted: negative balance stands in "
    "for the complaints filter): NOT IN decorrelated to a left-anti "
    "join (keys non-null by schema, so anti == NOT IN), distinct "
    "count per brand/size bucket.",
)
def tpch_q16_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(CAST(o.o_orderdate AS DATE)) AS INTEGER) AS o_year,
           SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)
                     - l.l_quantity * p.p_retailprice / 100.0) * 10000)
                    AS BIGINT)) / 10000.0
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    category="TPC-H surface",
    doc="Q9 product-type profit (adapted: retailprice/100 stands in "
    "for the missing ps_supplycost): 5-way join with a LIKE filter "
    "on part, profit expression inside the aggregate, grouped by "
    "nation x year. The sum runs over exact integer ten-thousandths "
    "(per-row round -> BIGINT) so heavy cancellation in the profit "
    "terms cannot make the float total order-dependent.",
    bench=True,
)
def tpch_q9_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit_4dp = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("l_quantity") * F.col("p_retailprice") / 100.0
        )
        * 10000
    ).cast("long")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year"),
        )
        .agg((F.sum(profit_4dp) / 10000.0).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "tpch_q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%gear%'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(sh.qty, 2) AS shipped_qty
    FROM supplier s
    JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
    WHERE sh.qty > (SELECT 1.5 * AVG(qty) FROM shipped)
    ORDER BY s.s_suppkey
    """,
    category="TPC-H surface",
    doc="Q20 excess-volume suppliers (adapted: 1.5x the average "
    "shipped quantity stands in for the missing partsupp "
    "availability): the aggregate CTE is reused for both the "
    "per-supplier quantities and the scalar average — computed "
    "once, threshold broadcast as a single-row cross join.",
)
def tpch_q20_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    threshold = shipped.agg((1.5 * F.avg("qty")).alias("thr"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        shipped.crossJoin(F.broadcast(threshold))
        .filter(F.col("qty") > F.col("thr"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.round("qty", 2).alias("shipped_qty")
        )
        .orderBy("s_suppkey")
    )
