"""Medallion-pipeline query surface (SURVEY §3.2, §7 phase 1/3).

``medallion_star_revenue`` is the engine's flagship: the direct
transliteration of the reference's two Athena analytics queries
(``README.md:256-275``) onto the synthetic star schema, preceded by
the Silver-layer cleanse (quality range filters, README.md:90-94)
and window dedup (README.md:95,307) — i.e. one plan that exercises
scan→filter→window→join→agg→sort→limit.

Scale shape: lineitem (the 100 TB side) is filtered at the scan
(predicate pushdown); deduped orders shuffle once on the dedup key.
Join strategy: bounded dims (nation) are broadcast-hinted; tables
that scale with the fact (orders, customer) carry NO hint — Spark's
size estimates broadcast them at test SF, AQE shuffle-joins them at
cluster scale.

Perf floor (measured, sf0.1 local[32], best-of-5 noop sink): full
plan ~1.12 s = filtered-lineitem scan 0.18 + orders dedup agg 0.36
+ join/agg 0.42 + residue; the executed plan holds exactly TWO
hashpartitioning exchanges (dedup agg, final agg — see PLANS.md)
and all three joins broadcast. Under this protocol the remaining
wall time is scan + local task-scheduling cost, not plan slack.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.operators import (
    dedupe_by_key_agg,
    filter_range_quality,
    group_agg,
    join_fact_dim,
)
from aws_lakehouse_spark.registry import register

ORACLE_STAR_REVENUE = """
WITH orders_dedup AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
            ORDER BY o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
), clean_li AS (
    SELECT * FROM lineitem
    WHERE l_quantity > 0 AND l_quantity <= 50
      AND l_discount >= 0 AND l_discount <= 0.1
)
SELECT n.n_name AS nation,
       COUNT(*) AS n_items,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
         AS total_revenue,
       ROUND(AVG(l.l_quantity), 4) AS avg_qty
FROM clean_li l
JOIN orders_dedup o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY total_revenue DESC, nation
"""


def star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (also ``entry()`` in __spark_entry__.py)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    clean_li = filter_range_quality(
        lineitem,
        [
            F.col("l_quantity") > 0,
            F.col("l_quantity") <= 50,
            F.col("l_discount") >= 0,
            F.col("l_discount") <= 0.1,
        ],
    )
    # min_by hash-agg dedup, not a window: partial-combines map-side
    # so the exchange carries ~one row per (key, mapper) instead of
    # the whole orders table, and no per-partition sort runs.
    # o_orderkey is unique, so the ordering is total and the result
    # matches ROW_NUMBER()=1 exactly. Project to the survivor-
    # determining + downstream columns FIRST: min_by's payload
    # struct references every column it carries, which would defeat
    # Catalyst's column pruning on the orders scan.
    orders_dedup = dedupe_by_key_agg(
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("__d"),
        ),
        ["o_custkey", "__d"],
        ["o_orderkey"],
    ).drop("__d")

    joined = clean_li.join(
        orders_dedup, clean_li.l_orderkey == orders_dedup.o_orderkey
    )
    # customer scales with the fact — no hard broadcast hint; Spark's
    # size-based planning (and AQE) broadcasts it at small SF and
    # shuffle-joins at cluster scale. nation is bounded (25 rows at
    # ANY scale) so the hint is always right.
    joined = join_fact_dim(
        joined, customer, joined.o_custkey == customer.c_custkey,
        broadcast_dim=False,
    )
    joined = join_fact_dim(joined, nation, joined.c_nationkey == nation.n_nationkey)

    out = group_agg(
        joined.withColumn(
            "revenue", F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ),
        [F.col("n_name").alias("nation")],
        {
            "n_items": F.count(F.lit(1)),
            "total_revenue": F.round(F.sum("revenue"), 2),
            "avg_qty": F.round(F.avg("l_quantity"), 4),
        },
    )
    return out.orderBy(F.desc("total_revenue"), F.asc("nation"))


register(
    "medallion_star_revenue",
    oracle=ORACLE_STAR_REVENUE,
    category="3.2 medallion / flagship",
    doc=star_revenue.__doc__ or "",
    bench=True,
)(star_revenue)


@register(
    "medallion_dim_code_map",
    oracle="""
    SELECT DISTINCT o_orderpriority AS priority_code,
           CASE o_orderpriority
               WHEN '1-URGENT' THEN 'Urgent'
               WHEN '2-HIGH' THEN 'High'
               WHEN '3-MEDIUM' THEN 'Medium'
               WHEN '4-NOT SPECIFIED' THEN 'Unspecified'
               WHEN '5-LOW' THEN 'Low'
               ELSE 'Other'
           END AS priority_name,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'expedited' ELSE 'standard' END AS service_class
    FROM orders
    """,
    category="3.2 medallion",
    doc="Gold dimension build: DISTINCT + code→name mapping (ref "
    "noaa_ghcn_silver_to_gold.py:55-67 dim_element).",
)
def medallion_dim_code_map_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.functions import code_map

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderpriority").alias("priority_code"),
        code_map(
            F.col("o_orderpriority"),
            {
                "1-URGENT": "Urgent",
                "2-HIGH": "High",
                "3-MEDIUM": "Medium",
                "4-NOT SPECIFIED": "Unspecified",
                "5-LOW": "Low",
            },
            default=F.lit("Other"),
        ).alias("priority_name"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedited"
        )
        .otherwise("standard")
        .alias("service_class"),
    ).distinct()


@register(
    "medallion_gold_fact",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity AS quantity,
           l_extendedprice * (1 - l_discount) AS net_revenue,
           CASE WHEN l_returnflag = 'R' THEN l_quantity / 10.0
                ELSE l_quantity END AS quantity_norm,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           CAST(year(l_shipdate) AS INTEGER) AS year,
           CAST(month(l_shipdate) AS INTEGER) AS month,
           CAST(day(l_shipdate) AS INTEGER) AS day
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_quantity > 0
    """,
    category="3.2 medallion",
    doc="Gold fact build: cleanse + conditional unit normalization + "
    "partition-column derivation (ref noaa_ghcn_silver_to_gold.py:"
    "82-94 fact_climate; noaa_ghcn_bronze_to_silver.py:95-99). The "
    "year/month/day columns are the table's partitionBy keys at "
    "write time → partition pruning on every date-ranged read.",
)
def medallion_gold_fact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & (F.col("l_quantity") > 0)
    )
    d = F.col("l_shipdate")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net_revenue"
        ),
        F.when(F.col("l_returnflag") == "R", F.col("l_quantity") / 10.0)
        .otherwise(F.col("l_quantity"))
        .alias("quantity_norm"),
        # ISO string, not DATE: Spark dates arrive in pandas as
        # `object` while DuckDB DATEs arrive as datetime64 — strings
        # hash identically under the driver's strict compare
        F.date_format(d, "yyyy-MM-dd").alias("ship_date"),
        F.year(d).cast("int").alias("year"),
        F.month(d).cast("int").alias("month"),
        F.dayofmonth(d).cast("int").alias("day"),
    )


@register(
    "medallion_dim_scd2",
    oracle="""
    WITH ev AS (
        SELECT o_custkey AS c_custkey,
               o_orderpriority AS priority,
               strftime(o_orderdate, '%Y-%m-%d') AS eff_date,
               o_orderkey
        FROM orders WHERE o_custkey < 100
    ), with_prev AS (
        SELECT *, LAG(priority) OVER (
            PARTITION BY c_custkey ORDER BY eff_date, o_orderkey
        ) AS prev
        FROM ev
    ), changes AS (
        SELECT c_custkey, priority, eff_date, o_orderkey
        FROM with_prev
        WHERE prev IS NULL OR priority != prev
    )
    SELECT c_custkey, priority,
           eff_date AS valid_from,
           LEAD(eff_date) OVER (
               PARTITION BY c_custkey ORDER BY eff_date, o_orderkey
           ) AS valid_to,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY c_custkey ORDER BY eff_date, o_orderkey
           ) AS INTEGER) AS version,
           LEAD(eff_date) OVER (
               PARTITION BY c_custkey ORDER BY eff_date, o_orderkey
           ) IS NULL AS is_current
    FROM changes
    """,
    category="3.2 medallion",
    doc="SCD type-2 dimension history from the order stream: each "
    "customer's priority attribute collapses into versioned rows "
    "with [valid_from, valid_to) intervals and a current flag — the "
    "dimension-history face the reference's rebuild-in-full Gold "
    "dims lack. One window shuffle on the dimension key; no "
    "self-join. ISO-string effective dates keep the driver hash "
    "dtype-stable.",
)
def medallion_dim_scd2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.operators.scd import scd2_versions

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 100
    )
    ev = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("eff_date"),
        "o_orderkey",
    )
    out = scd2_versions(
        ev,
        ["c_custkey"],
        "priority",
        [F.asc("eff_date"), F.asc("o_orderkey")],
        "eff_date",
    )
    return out.select(
        "c_custkey", "priority", "valid_from", "valid_to", "version",
        "is_current",
    )


@register(
    "join_scd2_pointintime",
    oracle="""
    WITH ev AS (
        SELECT o_custkey AS c_custkey,
               o_orderpriority AS priority,
               strftime(o_orderdate, '%Y-%m-%d') AS eff_date,
               o_orderkey
        FROM orders WHERE o_custkey < 100
    ), with_prev AS (
        SELECT *, LAG(priority) OVER (
            PARTITION BY c_custkey ORDER BY eff_date, o_orderkey
        ) AS prev
        FROM ev
    ), changes AS (
        SELECT c_custkey, priority, eff_date, o_orderkey
        FROM with_prev
        WHERE prev IS NULL OR priority != prev
    ), dim AS (
        SELECT c_custkey, priority,
               eff_date AS valid_from,
               LEAD(eff_date) OVER (
                   PARTITION BY c_custkey ORDER BY eff_date, o_orderkey
               ) AS valid_to
        FROM changes
    ), fact AS (
        SELECT o.o_custkey AS c_custkey, l.l_orderkey, l.l_linenumber,
               strftime(l.l_shipdate, '%Y-%m-%d') AS ship_date
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey < 100
    )
    SELECT f.l_orderkey, f.l_linenumber, f.ship_date,
           d.priority AS priority_at_ship
    FROM fact f
    JOIN dim d
      ON f.c_custkey = d.c_custkey
     AND f.ship_date >= d.valid_from
     AND (d.valid_to IS NULL OR f.ship_date < d.valid_to)
    """,
    category="3.2 medallion (SCD2 lookup)",
    doc="POINT-IN-TIME dimension lookup against the SCD2 history "
    "built by medallion_dim_scd2: each shipment joins to the "
    "attribute version whose [valid_from, valid_to) interval covers "
    "its ship date — the as-was join that makes slowly-changing "
    "dimensions useful (an as-is join would backdate today's "
    "attributes onto history). Physically an equi-join on the "
    "dimension key with the interval predicate as residual filter: "
    "per-key fan-out is the customer's version count, so the shuffle "
    "stays linear at any fact volume. ISO-string dates keep the "
    "comparison and the driver hash engine-identical.",
)
def join_scd2_pointintime_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.operators.scd import scd2_versions

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 100
    )
    ev = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("eff_date"),
        "o_orderkey",
    )
    dim = scd2_versions(
        ev,
        ["c_custkey"],
        "priority",
        [F.asc("eff_date"), F.asc("o_orderkey")],
        "eff_date",
    ).select("c_custkey", "priority", "valid_from", "valid_to")
    li = load_table(spark, sf_dir, "lineitem")
    fact = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "l_orderkey",
            "l_linenumber",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )
    return (
        fact.join(
            dim,
            (fact.c_custkey == dim.c_custkey)
            & (F.col("ship_date") >= F.col("valid_from"))
            & (
                F.col("valid_to").isNull()
                | (F.col("ship_date") < F.col("valid_to"))
            ),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "ship_date",
            F.col("priority").alias("priority_at_ship"),
        )
    )
