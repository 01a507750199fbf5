"""Distribution-drift and changepoint query surface.

Completes the quality tier (profiling/expectations/referential in
``plans/quality.py``) with the monitoring statistics a production
lakehouse computes between loads: population stability index,
two-sample Kolmogorov-Smirnov, and CUSUM changepoint detection over
event streams. All are single-keyed-shuffle plans; none sorts
globally (ECDFs use the two-level bucketed prefix-sum pattern).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.registry import register

# PSI: fixed-width price buckets (literal edges → engine-identical),
# reference slice = orders before 1999, current slice = 1999+
_PSI_WIDTH = 50_000
_PSI_BUCKETS = 10
_PSI_SPLIT = "1999-01-01"


@register(
    "quality_psi_drift",
    oracle=f"""
    WITH b AS (
        SELECT unnest(range(0, {_PSI_BUCKETS})) AS bucket
    ), binned AS (
        SELECT LEAST({_PSI_BUCKETS} - 1,
                     CAST(FLOOR(o_totalprice / {_PSI_WIDTH}) AS BIGINT))
                 AS bucket,
               CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}'
                    THEN 1 ELSE 0 END AS is_ref
        FROM orders
    ), cnt AS (
        SELECT b.bucket,
               COALESCE(SUM(binned.is_ref), 0) AS n_ref,
               COALESCE(SUM(1 - binned.is_ref), 0) AS n_cur
        FROM b LEFT JOIN binned ON b.bucket = binned.bucket
        GROUP BY b.bucket
    ), tot AS (
        SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM cnt
    )
    SELECT cnt.bucket,
           CAST(cnt.n_ref AS BIGINT) AS n_ref,
           CAST(cnt.n_cur AS BIGINT) AS n_cur,
           ROUND((cnt.n_ref + 0.5) / (tot.t_ref + {_PSI_BUCKETS} * 0.5), 6)
             AS p_ref,
           ROUND((cnt.n_cur + 0.5) / (tot.t_cur + {_PSI_BUCKETS} * 0.5), 6)
             AS p_cur,
           ROUND(((cnt.n_cur + 0.5) / (tot.t_cur + {_PSI_BUCKETS} * 0.5)
                  - (cnt.n_ref + 0.5) / (tot.t_ref + {_PSI_BUCKETS} * 0.5))
                 * ln(((cnt.n_cur + 0.5) / (tot.t_cur + {_PSI_BUCKETS} * 0.5))
                      / ((cnt.n_ref + 0.5)
                         / (tot.t_ref + {_PSI_BUCKETS} * 0.5))), 6)
             AS psi_term
    FROM cnt CROSS JOIN tot
    """,
    category="quality (drift)",
    doc="Population stability index between the pre-1999 reference "
    "slice and the 1999+ current slice of orders, over 10 "
    "fixed-width price buckets (top bucket open-ended). Laplace "
    "smoothing (+0.5 per bucket) keeps empty buckets finite and "
    "deterministic. One partial-aggregated scan bins both slices "
    "together (a CASE flag, not two passes); the 10-row bucket "
    "spine and the totals are broadcast. Per-bucket psi_term rows "
    "sum to the headline PSI — kept per-bucket so monitoring can "
    "see WHERE the distribution moved. Scale: the only shuffle is "
    "10 buckets wide.",
)
def quality_psi_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.least(
            F.lit(_PSI_BUCKETS - 1),
            F.floor(F.col("o_totalprice") / _PSI_WIDTH).cast("bigint"),
        ).alias("bucket"),
        F.when(
            F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_ref"),
    )
    spine = spark.range(_PSI_BUCKETS).select(F.col("id").alias("bucket"))
    cnt = (
        spine.join(binned, "bucket", "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum("is_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.sum(1 - F.col("is_ref")), F.lit(0)).alias("n_cur"),
        )
    )
    tot = cnt.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    smooth = _PSI_BUCKETS * 0.5
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + smooth)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + smooth)
    return cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


_KS_BUCKET = 20_000  # coarse value buckets for the two-level ECDF


@register(
    "quality_ks_drift",
    oracle="""
    WITH pts AS (
        SELECT o_totalprice AS v,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g
        FROM orders WHERE o_orderstatus IN ('F', 'O')
    ), per_v AS (
        SELECT v, SUM(g) AS c1, SUM(1 - g) AS c2
        FROM pts GROUP BY v
    ), tot AS (
        SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM per_v
    ), ecdf AS (
        SELECT v,
               SUM(c1) OVER (ORDER BY v) AS cum1,
               SUM(c2) OVER (ORDER BY v) AS cum2
        FROM per_v
    )
    SELECT CAST(tot.n1 AS BIGINT) AS n1,
           CAST(tot.n2 AS BIGINT) AS n2,
           ROUND(MAX(ABS(ecdf.cum1 / CAST(tot.n1 AS DOUBLE)
                         - ecdf.cum2 / CAST(tot.n2 AS DOUBLE))), 6)
             AS ks_stat
    FROM ecdf CROSS JOIN tot
    GROUP BY tot.n1, tot.n2
    """,
    category="quality (drift)",
    doc="Two-sample Kolmogorov-Smirnov statistic between finished "
    "('F') and open ('O') orders' price distributions: "
    "max |ECDF_F(v) - ECDF_O(v)| over the union of sample points. "
    "Both samples aggregate per distinct value in one CASE-flagged "
    "pass; the cumulative counts come from the two-level bucketed "
    "prefix sum (per-bucket running sums plus a broadcast "
    "bucket-offset spine) — the oracle's single global window "
    "ORDER BY v is exactly what this plan avoids: no stage ever "
    "sorts more than one value-bucket, so the ECDF scales to "
    "arbitrarily many distinct values.",
)
def quality_ks_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.filter(F.col("o_orderstatus").isin("F", "O")).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("g"),
    )
    # three consumers (bucketed prefix sums via d, the totals) — pin
    # the value-cardinality frame so orders is scanned once
    per_v = (
        pts.groupBy("v")
        .agg(F.sum("g").alias("c1"), F.sum(1 - F.col("g")).alias("c2"))
        .localCheckpoint(eager=False)
    )
    # two-level prefix sum: bucket offsets broadcast, local running
    # sums within each value bucket — no global sort
    d = per_v.withColumn("__b", F.floor(F.col("v") / _KS_BUCKET)).repartition(
        "__b"
    )
    off_w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("__b")
        .agg(F.sum("c1").alias("b1"), F.sum("c2").alias("b2"))
        .select(
            "__b",
            F.coalesce(F.sum("b1").over(off_w), F.lit(0)).alias("o1"),
            F.coalesce(F.sum("b2").over(off_w), F.lit(0)).alias("o2"),
        )
    )
    local_w = (
        Window.partitionBy("__b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = (
        d.join(F.broadcast(offsets), "__b")
        .withColumn("cum1", F.col("o1") + F.sum("c1").over(local_w))
        .withColumn("cum2", F.col("o2") + F.sum("c2").over(local_w))
    )
    tot = per_v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum1") / F.col("n1").cast("double")
                        - F.col("cum2") / F.col("n2").cast("double")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            "ks_stat",
        )
    )


_CUSUM_SLACK = 1.0  # slack k in count units
_CUSUM_H = 5.0  # decision threshold


@register(
    "events_cusum_changepoint",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS DOUBLE) AS x
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), mu AS (
        SELECT event_type, AVG(x) AS mu FROM hourly GROUP BY event_type
    ), pre AS (
        SELECT h.event_type, h.hr, h.x,
               SUM(h.x - mu.mu - {_CUSUM_SLACK}) OVER (
                   PARTITION BY h.event_type ORDER BY h.hr) AS prefix
        FROM hourly h JOIN mu USING (event_type)
    ), runmin AS (
        SELECT *, MIN(prefix) OVER (
                   PARTITION BY event_type ORDER BY hr) AS mn
        FROM pre
    )
    SELECT event_type, hr, CAST(x AS BIGINT) AS n_events,
           ROUND(prefix - LEAST(mn, 0), 6) AS cusum,
           CASE WHEN prefix - LEAST(mn, 0) > {_CUSUM_H}
                THEN 1 ELSE 0 END AS breach
    FROM runmin
    """,
    category="quality (changepoint)",
    doc="One-sided CUSUM changepoint detection over per-type hourly "
    "event counts: S_t = max(0, S_(t-1) + x_t - mu - k) flags "
    "sustained upward shifts from each type's mean rate. The "
    "recursion is rewritten closed-form as prefix_t - min(0, "
    "running_min(prefix)) — two stacked windows per event_type, no "
    "iterative loop, no UDF — so Catalyst plans it as one shuffle "
    "on event_type with sorted frames. Per-key time series is the "
    "natural 100 TB partitioning; breach=1 rows are the alerts.",
)
def events_cusum_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    # the per-type mean is a window over the same hourly frame (one
    # consumer, no join-back, no second fact scan) — the ordered
    # prefix windows below reuse the same event_type partitioning
    w = Window.partitionBy("event_type").orderBy("hr")
    pre = hourly.withColumn(
        "mu", F.avg("x").over(Window.partitionBy("event_type"))
    ).withColumn(
        "prefix",
        F.sum(F.col("x") - F.col("mu") - _CUSUM_SLACK).over(w),
    )
    runmin = pre.withColumn("mn", F.min("prefix").over(w))
    cusum = F.col("prefix") - F.least(F.col("mn"), F.lit(0.0))
    return runmin.select(
        "event_type",
        "hr",
        F.col("x").cast("bigint").alias("n_events"),
        F.round(cusum, 6).alias("cusum"),
        F.when(cusum > _CUSUM_H, 1).otherwise(0).alias("breach"),
    )
