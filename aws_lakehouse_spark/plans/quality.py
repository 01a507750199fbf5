"""Data-quality query surface: profiling + expectations.

Engine extensions past the reference's runtime-count checks
(``glue-jobs/noaa_ghcn_bronze_to_silver.py:52-62``) — the
declarative quality layer a production lakehouse runs after every
load.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.quality import (
    check_expectations,
    profile_numeric,
    referential_violations,
)
from aws_lakehouse_spark.registry import register

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
        SELECT '{c}' AS column,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               ROUND(MIN(CAST({c} AS DOUBLE)), 6) AS min_val,
               ROUND(MAX(CAST({c} AS DOUBLE)), 6) AS max_val,
               ROUND(AVG(CAST({c} AS DOUBLE)), 6) AS avg_val
        FROM lineitem""")
    return " UNION ALL ".join(parts)


@register(
    "quality_profile_numeric",
    oracle=_profile_oracle(),
    category="quality",
    doc="Single-pass numeric column profiling (counts, nulls, "
    "distincts, min/max/mean for every column in one partial-agg "
    "scan, stack-unpivoted). The declarative replacement for the "
    "reference's printSchema/count progress logging.",
)
def quality_profile_numeric_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    prof = profile_numeric(li, list(_PROFILE_COLS))
    return prof.select(
        "column", "n_rows", "n_nulls", "n_distinct",
        F.round("min_val", 6).alias("min_val"),
        F.round("max_val", 6).alias("max_val"),
        F.round("avg_val", 6).alias("avg_val"),
    )


@register(
    "quality_expectations",
    oracle="""
    SELECT 'quantity_in_range' AS rule,
           CAST(SUM(CASE WHEN l_quantity > 0 AND l_quantity <= 50
                    THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'discount_in_range',
           CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
                    THEN 0 ELSE 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'shipdate_not_null',
           CAST(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END)
                AS BIGINT)
    FROM lineitem
    """,
    category="quality",
    doc="Declarative expectations (the reference's cleanse predicates "
    "ref README.md:90-94 turned into assertions): every rule counted "
    "in ONE scan via conditional sums — adding a rule adds no pass. "
    "Null predicate results count as violations.",
)
def quality_expectations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return check_expectations(
        li,
        {
            "quantity_in_range": (F.col("l_quantity") > 0)
            & (F.col("l_quantity") <= 50),
            "discount_in_range": (F.col("l_discount") >= 0)
            & (F.col("l_discount") <= 0.1),
            "shipdate_not_null": F.col("l_shipdate").isNotNull(),
        },
    )


@register(
    "quality_referential",
    oracle="""
    SELECT COUNT(*) AS n_orphans
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
    )
    """,
    category="quality",
    doc="Referential-integrity audit: orders whose customer key has "
    "no parent row — NOT EXISTS as a left-anti join, one shuffle on "
    "the key.",
)
def quality_referential_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return referential_violations(o, c, "o_custkey", "c_custkey").agg(
        F.count(F.lit(1)).alias("n_orphans")
    )
