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


@register(
    "quality_partition_drift",
    oracle="""
    WITH daily AS (
        SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS d,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY d
    ), scored AS (
        SELECT d, n_events,
               AVG(n_events) OVER w AS trail_avg,
               stddev_samp(n_events) OVER w AS trail_sd
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT d, n_events,
           ROUND(trail_avg, 4) AS trail_avg,
           CASE WHEN trail_sd > 0
                THEN ROUND((n_events - trail_avg) / trail_sd, 4)
           END AS z_score,
           CASE WHEN trail_sd > 0
                THEN ABS((n_events - trail_avg) / trail_sd) > 2.0
           END AS is_drift
    FROM scored
    ORDER BY d
    """,
    category="quality",
    doc="Partition-volume drift detection: per-day event counts "
    "scored against their own trailing-7-day window (z-score of "
    "today's count vs trailing mean/stddev) — the freshness/volume "
    "monitor a lakehouse runs after every ingest to catch silent "
    "upstream drops or floods before they poison downstream tables. "
    "Scale shape: the raw table collapses to one row per day in the "
    "first aggregate; the trailing window then runs over the "
    "day-count-sized frame (a bounded, single-partition sort at any "
    "event volume — same pattern as the shard planner's bucket "
    "offsets).",
)
def quality_partition_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w = Window.orderBy("d").rowsBetween(-7, -1)
    scored = daily.select(
        "d",
        "n_events",
        F.avg("n_events").over(w).alias("trail_avg"),
        F.stddev_samp("n_events").over(w).alias("trail_sd"),
    )
    z = (F.col("n_events") - F.col("trail_avg")) / F.col("trail_sd")
    return scored.select(
        "d",
        "n_events",
        F.round("trail_avg", 4).alias("trail_avg"),
        F.when(F.col("trail_sd") > 0, F.round(z, 4)).alias("z_score"),
        F.when(F.col("trail_sd") > 0, F.abs(z) > 2.0).alias("is_drift"),
    ).orderBy("d")


@register(
    "quality_column_mask",
    oracle="""
    SELECT c_custkey,
           md5(CAST(c_name AS VARCHAR)) AS c_name,
           CASE WHEN length(CAST(c_mktsegment AS VARCHAR)) <= 4 THEN '****'
                ELSE substring(CAST(c_mktsegment AS VARCHAR), 1, 2) || '****'
                     || substring(CAST(c_mktsegment AS VARCHAR),
                                  length(CAST(c_mktsegment AS VARCHAR)) - 1, 2)
           END AS c_mktsegment,
           CAST(NULL AS DOUBLE) AS c_acctbal,
           c_nationkey
    FROM customer
    """,
    category="quality (governance)",
    doc="Column-level masking for governed exports: md5 "
    "pseudonymization keeps the name joinable without exposing it, "
    "partial masking leaves the segment eyeball-checkable, the "
    "balance nulls out entirely — the per-column policy trio a "
    "governed export applies before data crosses a trust boundary. "
    "Pure scan-side projection, no shuffle; the oracle applies the "
    "identical policies in SQL so a green row certifies the exact "
    "masked output.",
)
def quality_column_mask_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.quality import mask_columns

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal", "c_nationkey"
    )
    return mask_columns(
        cust,
        {"c_name": "hash", "c_mktsegment": "partial", "c_acctbal": "null"},
    )


@register(
    "quality_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk_check,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customers_without_orders',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'parts_never_ordered',
           CAST((SELECT COUNT(*) FROM part p
                 WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                   WHERE l.l_partkey = p.p_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'suppliers_never_used',
           CAST((SELECT COUNT(*) FROM supplier s
                 WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                   WHERE l.l_suppkey = s.s_suppkey))
                AS BIGINT)
    """,
    category="2.14 data quality (engine extension)",
    doc="Referential-integrity audit: per foreign-key relationship, "
    "the count of child rows whose parent is missing (anti-join), "
    "plus the coverage complements (parents with no children — "
    "customers without orders, parts never ordered, suppliers never "
    "used) that are naturally non-zero on TPC-H-shaped data and "
    "prove the probe detects. The audit every warehouse runs after "
    "ingest. Scale shape: each check is ONE left-anti join on its "
    "key — the dimension sides broadcast, the two fact-vs-fact "
    "checks shuffle on the join key only; results are 6 scalar "
    "rows.",
)
def quality_referential_integrity_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")

    def _count_anti(child, parent, lk, rk, label):
        return (
            child.join(
                parent, child[lk] == parent[rk], "left_anti"
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(F.lit(label).alias("fk_check"), "n_violations")
        )

    checks = [
        _count_anti(li, orders, "l_orderkey", "o_orderkey", "lineitem->orders"),
        _count_anti(orders, cust, "o_custkey", "c_custkey", "orders->customer"),
        _count_anti(cust, nation, "c_nationkey", "n_nationkey", "customer->nation"),
        _count_anti(cust, orders, "c_custkey", "o_custkey", "customers_without_orders"),
        _count_anti(part, li, "p_partkey", "l_partkey", "parts_never_ordered"),
        _count_anti(supp, li, "s_suppkey", "l_suppkey", "suppliers_never_used"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def _entropy_duck(table: str, col: str) -> str:
    """One categorical-entropy oracle block: counts → ordered-fold
    Shannon entropy in bits (fold order = category value, matching
    the Spark side exactly so the doubles are bit-identical)."""
    return f"""
    SELECT '{table}.{col}' AS column_name,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT DISTINCT {col} FROM {table})) AS n_distinct,
           ROUND(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
               (SELECT list(
                    (CAST(c AS DOUBLE) / t) * log2(CAST(c AS DOUBLE) / t)
                    ORDER BY v)
                FROM (SELECT {col} AS v, COUNT(*) AS c
                      FROM {table} GROUP BY 1) cs,
                     (SELECT CAST(COUNT(*) AS DOUBLE) AS t
                      FROM {table}) tt)),
               (a, b) -> a + b), 6) AS entropy_bits
    """


@register(
    "quality_entropy_profile",
    oracle=(
        _entropy_duck("orders", "o_orderstatus")
        + " UNION ALL "
        + _entropy_duck("orders", "o_orderpriority")
        + " UNION ALL "
        + _entropy_duck("customer", "c_mktsegment")
        + " ORDER BY column_name"
    ),
    category="2.4 aggregation (profiling)",
    doc="Shannon entropy (bits) of the categorical key columns — "
    "the data-profiling signal for skew and degenerate "
    "distributions (entropy near 0 = one value dominates → that "
    "column is a bad partition/shuffle key; entropy near "
    "log2(n_distinct) = uniform → safe). One keyed count aggregate "
    "per column collapses the table to its category cardinality; "
    "the per-category -p·log2(p) terms then reduce in an ORDERED "
    "fold (category order) so the doubles are bit-identical on "
    "both engines regardless of partitioning.",
)
def quality_entropy_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    def entropy(df: DataFrame, tname: str, col: str) -> DataFrame:
        # the grand total is a single-partition window over the TINY
        # category-cardinality frame (bounded by the column's distinct
        # count), so the frame has ONE consumer — no pin, no
        # broadcast join-back (the earlier checkpointed total pass
        # was the plan-audit fix for 6 scans over 3 cols; the window
        # keeps the one-scan-per-column property without the pin)
        counts = df.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        counts = counts.withColumn(
            "t", F.sum("c").over(Window.partitionBy())
        )
        term = (F.col("c").cast("double") / F.col("t")) * F.log2(
            F.col("c").cast("double") / F.col("t")
        )
        return (
            counts
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                F.round(
                    -F.aggregate(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.struct(F.col("v"), term.alias("e"))
                                )
                            ),
                            lambda s: s["e"],
                        ),
                        F.lit(0.0),
                        lambda a, b: a + b,
                    ),
                    6,
                ).alias("entropy_bits"),
            )
            .select(
                F.lit(f"{tname}.{col}").alias("column_name"),
                "n_distinct",
                "entropy_bits",
            )
        )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        entropy(orders, "orders", "o_orderstatus")
        .unionByName(entropy(orders, "orders", "o_orderpriority"))
        .unionByName(entropy(customer, "customer", "c_mktsegment"))
        .orderBy("column_name")
    )


@register(
    "quality_k_anonymity",
    oracle="""
    WITH classes AS (
        SELECT lang,
               CAST(FLOOR(n_chars / 100) AS INTEGER) AS len_bucket,
               source
        FROM documents
    )
    SELECT lang, len_bucket,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS l_diversity,
           COUNT(*) >= 10 AS k_anonymous,
           COUNT(DISTINCT source) >= 3 AS l_diverse
    FROM classes
    GROUP BY lang, len_bucket
    ORDER BY lang, len_bucket
    """,
    category="quality (governance)",
    doc="Privacy re-identification audit over the corpus: documents "
    "are grouped into equivalence classes by quasi-identifiers "
    "(language x coarse length bucket) and each class is checked "
    "for k-anonymity (class size >= k, Sweeney 2002) and "
    "l-diversity of the sensitive attribute (distinct sources >= "
    "l, Machanavajjhala et al. 2007). Classes failing either flag "
    "are the ones a release pipeline must suppress or generalize. "
    "Plan: ONE hash aggregation keyed by the quasi-identifier "
    "tuple (count + count-distinct in the same pass); output is "
    "class-count-sized, orders of magnitude below the data, so "
    "the final orderBy sorts a tiny frame.",
)
def quality_k_anonymity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.select(
        "lang",
        F.floor(F.col("n_chars") / 100).cast("int").alias("len_bucket"),
        "source",
    )
    return (
        classes.groupBy("lang", "len_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.countDistinct("source").cast("bigint").alias("l_diversity"),
        )
        .select(
            "lang",
            "len_bucket",
            "class_size",
            "l_diversity",
            (F.col("class_size") >= 10).alias("k_anonymous"),
            (F.col("l_diversity") >= 3).alias("l_diverse"),
        )
        .orderBy("lang", "len_bucket")
    )
