"""Statistical quality / sketch query surface (engine extension).

Robust-statistics and hypothesis-test primitives a data-quality tier
runs next to the expectations/drift checks in ``plans/quality.py``,
plus a count-min sketch — the mergeable heavy-hitter structure whose
(seed, bucket) cell grid is a map-side-combinable aggregate at any
scale. Every float formula is written identically in the DuckDB
oracle and rounded identically, per the hash-match discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.registry import register


@register(
    "quality_winsorize",
    oracle="""
    WITH bounds AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.01) AS p01,
               quantile_cont(l_extendedprice, 0.99) AS p99,
               AVG(l_extendedprice) AS mean_raw
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(b.p01, 4) AS p01,
           ROUND(b.p99, 4) AS p99,
           ROUND(b.mean_raw, 4) AS mean_raw,
           ROUND(AVG(
               CASE WHEN l.l_extendedprice < b.p01 THEN b.p01
                    WHEN l.l_extendedprice > b.p99 THEN b.p99
                    ELSE l.l_extendedprice END
           ), 4) AS mean_winsorized
    FROM lineitem l JOIN bounds b USING (l_returnflag)
    GROUP BY l.l_returnflag, b.p01, b.p99, b.mean_raw
    ORDER BY l.l_returnflag
    """,
    category="2.4 aggregation (robust statistics)",
    doc="Winsorized mean per return flag: exact p01/p99 price bounds "
    "(interpolated percentile, identical on both engines), then the "
    "mean with tails CLIPPED to the bounds — the outlier-robust "
    "center estimate a quality tier reports next to the raw mean. "
    "Two passes: a per-group percentile aggregate (groups-sized "
    "result, broadcast back) and one clipped re-aggregate; no sort "
    "of the fact table.",
)
def quality_winsorize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.01)").alias("p01"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        F.avg("l_extendedprice").alias("mean_raw"),
    )
    clipped = F.when(
        F.col("l_extendedprice") < F.col("p01"), F.col("p01")
    ).when(
        F.col("l_extendedprice") > F.col("p99"), F.col("p99")
    ).otherwise(F.col("l_extendedprice"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag", "p01", "p99", "mean_raw")
        .agg(F.round(F.avg(clipped), 4).alias("mean_winsorized"))
        .select(
            "l_returnflag",
            F.round("p01", 4).alias("p01"),
            F.round("p99", 4).alias("p99"),
            F.round("mean_raw", 4).alias("mean_raw"),
            "mean_winsorized",
        )
        .orderBy("l_returnflag")
    )


@register(
    "quality_ab_ttest",
    oracle="""
    WITH g AS (
        -- COUNT(value), not COUNT(*): n must count the same
        -- observations the mean/variance aggregate (NULL values are
        -- skipped by AVG/var_samp, so a NULL-valued event row is not
        -- an observation) — and it matches the engine's
        -- F.count(when(...)) which likewise skips NULLs (r7 advice)
        SELECT event_type,
               CAST(COUNT(value) AS BIGINT) AS n,
               AVG(value) AS m,
               var_samp(value) AS v
        FROM events
        WHERE event_type IN ('click', 'view')
        GROUP BY event_type
    ),
    ab AS (
        SELECT
            (SELECT n FROM g WHERE event_type = 'click') AS n1,
            (SELECT m FROM g WHERE event_type = 'click') AS m1,
            (SELECT v FROM g WHERE event_type = 'click') AS v1,
            (SELECT n FROM g WHERE event_type = 'view') AS n2,
            (SELECT m FROM g WHERE event_type = 'view') AS m2,
            (SELECT v FROM g WHERE event_type = 'view') AS v2
    )
    SELECT n1, n2,
           ROUND(m1, 6) AS mean_click,
           ROUND(m2, 6) AS mean_view,
           ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(
               power(v1 / n1 + v2 / n2, 2)
               / (power(v1 / n1, 2) / (n1 - 1)
                  + power(v2 / n2, 2) / (n2 - 1)),
               4
           ) AS welch_df
    FROM ab
    """,
    category="2.4 aggregation (hypothesis test)",
    doc="Welch's unequal-variance t-test between the click and view "
    "cohorts' event values: per-cohort (n, mean, sample variance) in "
    "ONE grouped aggregate over the fact scan, then the t statistic "
    "and Welch-Satterthwaite df as scalar arithmetic on the 2-row "
    "result — the A/B significance readout with no second pass over "
    "the data, distributable as a pure map-side-combinable moment "
    "aggregate.",
)
def quality_ab_ttest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    # both cohorts' moments from ONE global aggregation (aggregates
    # skip NULLs, so the when() guards route each row to its own
    # moment set) — the earlier 2-row grouped frame fed two filter
    # branches, re-running the fact scan per cohort; this makes the
    # docstring's "no second pass over the data" literally true
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    both = ev.agg(
        F.count(click).cast("bigint").alias("n1"),
        F.avg(click).alias("m1"),
        F.var_samp(click).alias("v1"),
        F.count(view).cast("bigint").alias("n2"),
        F.avg(view).alias("m2"),
        F.var_samp(view).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return both.select(
        "n1",
        "n2",
        F.round("m1", 6).alias("mean_click"),
        F.round("m2", 6).alias("mean_view"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            4,
        ).alias("welch_df"),
    )


@register(
    "quality_chisquare_drift",
    oracle="""
    WITH tagged AS (
        SELECT lang,
               CASE WHEN CAST(substr(source, 4) AS BIGINT) < 10
                    THEN 'A' ELSE 'B' END AS cohort
        FROM documents
    ),
    obs AS (
        SELECT lang, cohort, CAST(COUNT(*) AS DOUBLE) AS o
        FROM tagged GROUP BY lang, cohort
    ),
    tot AS (
        SELECT lang, SUM(o) AS row_tot FROM obs GROUP BY lang
    ),
    ctot AS (
        SELECT cohort, SUM(o) AS col_tot FROM obs GROUP BY cohort
    ),
    n AS (SELECT SUM(o) AS n FROM obs),
    cells AS (
        SELECT o.lang, o.cohort, o.o,
               t.row_tot * c.col_tot / (SELECT n FROM n) AS e
        FROM obs o JOIN tot t USING (lang) JOIN ctot c USING (cohort)
    )
    SELECT ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2,
           CAST((COUNT(DISTINCT lang) - 1)
                * (COUNT(DISTINCT cohort) - 1) AS BIGINT) AS dof
    FROM cells
    """,
    category="2.4 aggregation (hypothesis test)",
    doc="Chi-square homogeneity test of the language distribution "
    "between two source cohorts (src0-9 vs src10-19) — the "
    "distribution-drift alarm for a corpus intake pipeline. One "
    "grouped count builds the contingency table (|langs| x 2 cells); "
    "expected counts and the statistic are arithmetic on that tiny "
    "frame. The fact scan aggregates once; everything downstream is "
    "cells-sized.",
)
def quality_chisquare_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "lang",
        # try_cast: a malformed source tag (empty string, free
        # text) lands in cohort B instead of throwing CAST_INVALID_INPUT
        F.when(
            F.substring("source", 4, 10).try_cast("bigint") < 10,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("cohort"),
    )
    # four consumers (row totals, column totals, grand total, the
    # cell join) — pin the (lang x cohort)-sized table so documents
    # is scanned once, not four times
    obs = (
        tagged.groupBy("lang", "cohort")
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
        .localCheckpoint(eager=False)
    )
    row_tot = obs.groupBy("lang").agg(F.sum("o").alias("row_tot"))
    col_tot = obs.groupBy("cohort").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(row_tot, "lang")
        .join(col_tot, "cohort")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "cohort",
            "o",
            (F.col("row_tot") * F.col("col_tot") / F.col("n")).alias("e"),
        )
    )
    return cells.agg(
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("cohort") - 1)
        )
        .cast("bigint")
        .alias("dof"),
    )


# count-min sketch shape: 4 independent hash rows x 256 buckets.
_CMS_D, _CMS_W = 4, 256


@register(
    "agg_countmin_heavy_hitters",
    oracle=f"""
    WITH seeds AS (SELECT UNNEST(range({_CMS_D})) AS seed),
    hashed AS (
        SELECT s.seed,
               ('0x' || substr(
                   md5(s.seed || '|' || e.user_id), 1, 8
               ))::BIGINT % {_CMS_W} AS bucket
        FROM events e CROSS JOIN seeds s
    ),
    cms AS (
        SELECT seed, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM hashed GROUP BY seed, bucket
    ),
    exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM events GROUP BY user_id
        ORDER BY exact_n DESC, user_id LIMIT 10
    ),
    probes AS (
        SELECT x.user_id, x.exact_n, s.seed,
               ('0x' || substr(
                   md5(s.seed || '|' || x.user_id), 1, 8
               ))::BIGINT % {_CMS_W} AS bucket
        FROM exact x CROSS JOIN seeds s
    )
    SELECT p.user_id, p.exact_n, MIN(c.c) AS cms_n
    FROM probes p JOIN cms c ON c.seed = p.seed AND c.bucket = p.bucket
    GROUP BY p.user_id, p.exact_n
    ORDER BY p.exact_n DESC, p.user_id
    """,
    category="2.4 aggregation (sketch)",
    doc=f"Count-min sketch ({_CMS_D} md5-derived hash rows x {_CMS_W} "
    "buckets) over event user traffic, probed at the true top-10 "
    "users: estimate = min over rows of the bucket count, always >= "
    "exact (one-sided error, the CMS guarantee). The sketch is a "
    "grouped count on (seed, bucket) — a FIXED 1024-cell grid that "
    "map-side combines and merges across partitions/streams no "
    "matter the input size; md5 hashing makes both engines' cells "
    "bit-identical. Exact counts ride along only to exhibit the "
    "estimation error at gate scale.",
)
def agg_countmin_heavy_hitters_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    seeds = F.array(*[F.lit(i) for i in range(_CMS_D)])

    def bucket(seed_col, uid_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            seed_col.cast("string"),
                            F.lit("|"),
                            uid_col.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _CMS_W
        )

    hashed = ev.select(
        F.explode(seeds).alias("seed"), F.col("user_id")
    ).select("seed", bucket(F.col("seed"), F.col("user_id")).alias("bucket"))
    cms = hashed.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(10)
    )
    probes = exact.select(
        "user_id", "exact_n", F.explode(seeds).alias("seed")
    ).select(
        "user_id",
        "exact_n",
        "seed",
        bucket(F.col("seed"), F.col("user_id")).alias("bucket"),
    )
    return (
        probes.join(cms, ["seed", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
    )


@register(
    "agg_hierarchy_rollup",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    chains AS (
        SELECT user_id, n,
               unnest(list_distinct(list_transform(
                   range(0, 21), k -> user_id >> k
               ))) AS node
        FROM per_user
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM chains
    WHERE node >= 1
    GROUP BY node ORDER BY node
    """,
    category="2.4 aggregation (hierarchy rollup)",
    doc="Hierarchical subtree rollup over an implicit binary org tree "
    "(parent = id >> 1): per ancestor node, total events and distinct "
    "users beneath it. The recursive-CTE-free formulation: ancestor "
    "chains are ARITHMETIC (id >> k, deduped in-row), so the rollup "
    "is reduce-to-user (one keyed shuffle) + explode x depth + one "
    "more keyed aggregate — depth-bounded data expansion on the "
    "USER-level frame, never on raw events, and no iterative joins. "
    "The same shape rolls up any fixed-arity hierarchy (geo cells, "
    "IP prefixes, taxonomy paths) at corpus scale.",
)
def agg_hierarchy_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    chains = per_user.select(
        "n",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, 20), k -> shiftright(user_id, k))"
                )
            )
        ).alias("node"),
    ).filter(F.col("node") >= 1)
    return (
        chains.groupBy("node")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        .select(F.col("node").cast("bigint").alias("node"), "n_events", "n_users")
        .orderBy("node")
    )


@register(
    "agg_extended_moments",
    oracle="""
    WITH m AS (
        SELECT l_returnflag, AVG(l_quantity) AS mu,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    ), cm AS (
        SELECT l.l_returnflag,
               MAX(m.n) AS n, MAX(m.mu) AS mu,
               AVG(POW(l.l_quantity - m.mu, 2)) AS m2,
               AVG(POW(l.l_quantity - m.mu, 3)) AS m3,
               AVG(POW(l.l_quantity - m.mu, 4)) AS m4
        FROM lineitem l JOIN m USING (l_returnflag)
        GROUP BY l.l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND(mu, 4) AS mean_qty,
           ROUND(sqrt(m2), 4) AS stddev_pop,
           ROUND(m3 / POW(m2, 1.5), 4) AS skewness,
           ROUND(m4 / POW(m2, 2) - 3, 4) AS excess_kurtosis
    FROM cm
    """,
    category="stats",
    doc="Population skewness and excess kurtosis per group, computed "
    "from explicit central moments (two-pass: group means broadcast "
    "back, then one aggregation of (x-mu)^k) rather than the "
    "engines' built-in skewness/kurtosis — DuckDB's built-ins apply "
    "sample-bias correction while Spark's are population "
    "formulas, so the explicit-moment form is the only one that "
    "hash-matches across engines. Distribution-shape profiling is "
    "the quality gate that catches a silently-truncated or "
    "clipped numeric column (kurtosis collapses) long before a "
    "mean/stddev check moves. Scale: the second pass is a map-side "
    "combinable AVG keyed by the same group key; the means table is "
    "group-cardinality-sized and broadcast.",
)
def agg_extended_moments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    means = li.groupBy("l_returnflag").agg(
        F.avg("l_quantity").alias("mu"), F.count(F.lit(1)).alias("n")
    )
    d = F.col("l_quantity") - F.col("mu")
    cm = (
        li.join(F.broadcast(means), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n"),
            F.max("mu").alias("mu"),
            F.avg(d * d).alias("m2"),
            F.avg(d * d * d).alias("m3"),
            F.avg(d * d * d * d).alias("m4"),
        )
    )
    return cm.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round("mu", 4).alias("mean_qty"),
        F.round(F.sqrt("m2"), 4).alias("stddev_pop"),
        F.round(F.col("m3") / F.pow("m2", F.lit(1.5)), 4).alias("skewness"),
        F.round(F.col("m4") / F.pow("m2", F.lit(2.0)) - 3, 4).alias(
            "excess_kurtosis"
        ),
    )


@register(
    "agg_correlation_matrix",
    oracle="""
    WITH ints AS (
        SELECT CAST(ROUND(l_quantity * 100) AS HUGEINT) AS q,
               CAST(ROUND(l_extendedprice * 100) AS HUGEINT) AS e,
               CAST(ROUND(l_discount * 100) AS HUGEINT) AS d,
               CAST(ROUND(l_tax * 100) AS HUGEINT) AS t
        FROM lineitem
    ),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(q) AS sq, SUM(e) AS se, SUM(d) AS sd, SUM(t) AS st,
               SUM(q * q) AS pqq, SUM(e * e) AS pee,
               SUM(d * d) AS pdd, SUM(t * t) AS ptt,
               SUM(q * e) AS pqe, SUM(q * d) AS pqd, SUM(q * t) AS pqt,
               SUM(e * d) AS ped, SUM(e * t) AS pet, SUM(d * t) AS pdt
        FROM ints
    )
    SELECT metric_a, metric_b,
           ROUND(cov / (sqrt(va) * sqrt(vb)), 6) AS corr
    FROM (
        SELECT 'l_quantity' AS metric_a, 'l_extendedprice' AS metric_b,
               CAST(n * pqe - sq * se AS DOUBLE) AS cov,
               CAST(n * pqq - sq * sq AS DOUBLE) AS va,
               CAST(n * pee - se * se AS DOUBLE) AS vb
        FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_discount',
               CAST(n * pqd - sq * sd AS DOUBLE),
               CAST(n * pqq - sq * sq AS DOUBLE),
               CAST(n * pdd - sd * sd AS DOUBLE)
        FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_tax',
               CAST(n * pqt - sq * st AS DOUBLE),
               CAST(n * pqq - sq * sq AS DOUBLE),
               CAST(n * ptt - st * st AS DOUBLE)
        FROM m
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount',
               CAST(n * ped - se * sd AS DOUBLE),
               CAST(n * pee - se * se AS DOUBLE),
               CAST(n * pdd - sd * sd AS DOUBLE)
        FROM m
        UNION ALL
        SELECT 'l_extendedprice', 'l_tax',
               CAST(n * pet - se * st AS DOUBLE),
               CAST(n * pee - se * se AS DOUBLE),
               CAST(n * ptt - st * st AS DOUBLE)
        FROM m
        UNION ALL
        SELECT 'l_discount', 'l_tax',
               CAST(n * pdt - sd * st AS DOUBLE),
               CAST(n * pdd - sd * sd AS DOUBLE),
               CAST(n * ptt - st * st AS DOUBLE)
        FROM m
    )
    ORDER BY metric_a, metric_b
    """,
    category="2.4 aggregation (feature statistics)",
    doc="Pairwise Pearson correlation matrix over the four lineitem "
    "numeric measures (quantity, extendedprice, discount, tax) — "
    "the feature-redundancy screen run before model training or "
    "mixture design. NOT the built-in corr(): a double-summed "
    "co-moment depends on partition merge order (flaky at a rounding "
    "boundary), so every measure is scaled to exact integer cents "
    "and ONE map-side-combinable aggregate accumulates all 15 "
    "decimal-exact sums/products; the 6 correlations are then closed-"
    "form double arithmetic on identical integers — bit-stable on "
    "both engines, any partitioning, one fact scan, one 1-row "
    "exchange.",
)
def agg_correlation_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "q": "l_quantity",
        "e": "l_extendedprice",
        "d": "l_discount",
        "t": "l_tax",
    }
    dec = "decimal(38,0)"
    ints = li.select(
        *[
            F.round(F.col(c) * 100).cast(dec).alias(k)
            for k, c in cols.items()
        ]
    )
    keys = list(cols)
    aggs = [F.count(F.lit(1)).cast(dec).alias("n")]
    aggs += [F.sum(k).alias(f"s{k}") for k in keys]
    for i, a in enumerate(keys):
        for b in keys[i:]:
            aggs.append(
                F.sum(
                    (F.col(a) * F.col(b)).cast(dec)
                ).alias(f"p{a}{b}")
            )
    m = ints.agg(*aggs)

    def corr(a: str, b: str):
        cov = (
            F.col("n") * F.col(f"p{a}{b}") - F.col(f"s{a}") * F.col(f"s{b}")
        ).cast("double")
        va = (
            F.col("n") * F.col(f"p{a}{a}") - F.col(f"s{a}") * F.col(f"s{a}")
        ).cast("double")
        vb = (
            F.col("n") * F.col(f"p{b}{b}") - F.col(f"s{b}") * F.col(f"s{b}")
        ).cast("double")
        # try_divide: a zero-variance measure (constant column, or a
        # single-row group) makes Pearson correlation undefined —
        # NULL, not an ANSI DIVIDE_BY_ZERO crash
        return F.round(F.try_divide(cov, F.sqrt(va) * F.sqrt(vb)), 6)

    rows = []
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            rows.append(
                F.struct(
                    F.lit(cols[a]).alias("metric_a"),
                    F.lit(cols[b]).alias("metric_b"),
                    corr(a, b).alias("corr"),
                )
            )
    return (
        m.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.metric_a", "r.metric_b", "r.corr")
        .orderBy("metric_a", "metric_b")
    )


@register(
    "quality_ratio_delta_method",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS y
        FROM events
        WHERE event_type IN ('click', 'view')
        GROUP BY user_id
    ),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy,
               SUM(x * y) AS sxy
        FROM per_user
    ),
    d AS (
        SELECT CAST(n AS DOUBLE) AS n,
               CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
               CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
               CAST(sxy AS DOUBLE) AS sxy
        FROM m
    ),
    v AS (
        SELECT n, sx / sy AS r,
               (sxx - sx * sx / n) / (n - 1) AS vx,
               (syy - sy * sy / n) / (n - 1) AS vy,
               (sxy - sx * sy / n) / (n - 1) AS cxy,
               sy / n AS ybar
        FROM d
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(r, 6) AS ratio,
           ROUND(sqrt((vx - 2 * r * cxy + r * r * vy)
                      / (n * ybar * ybar)), 6) AS se,
           ROUND(r - 1.96 * sqrt((vx - 2 * r * cxy + r * r * vy)
                                 / (n * ybar * ybar)), 6) AS ci_lo,
           ROUND(r + 1.96 * sqrt((vx - 2 * r * cxy + r * r * vy)
                                 / (n * ybar * ybar)), 6) AS ci_hi
    FROM v
    """,
    category="2.4 aggregation (ratio-metric inference)",
    doc="Delta-method standard error and 95% CI for a RATIO metric "
    "(cohort click-through = total clicks / total views with "
    "user-level clustering, Deng et al.'s linearization): naive "
    "per-event binomial SEs are wrong because a user's events are "
    "correlated — the unit of randomization is the user. One keyed "
    "aggregate collapses events to per-user (clicks, views), one "
    "moment aggregate yields n/Sx/Sy/Sxx/Syy/Sxy as EXACT integers "
    "(counts — order-free, bit-stable), and Var(x̄/ȳ) ≈ "
    "(s²x − 2R·s_xy + R²·s²y)/(n·ȳ²) is closed-form double "
    "arithmetic written identically on both engines. Two map-side-"
    "combinable shuffles total at any scale.",
)
def quality_ratio_delta_method_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    dec = "decimal(38,0)"
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .cast(dec)
        .alias("x"),
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        )
        .cast(dec)
        .alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
    )
    d = m.select(
        *[F.col(c).cast("double").alias(c) for c in
          ("n", "sx", "sy", "sxx", "syy", "sxy")]
    )
    r = F.col("sx") / F.col("sy")
    vx = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    vy = (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    cxy = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    ybar = F.col("sy") / F.col("n")
    var = (vx - F.lit(2) * r * cxy + r * r * vy) / (
        F.col("n") * ybar * ybar
    )
    se = F.sqrt(var)
    return d.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(r - F.lit(1.96) * se, 6).alias("ci_lo"),
        F.round(r + F.lit(1.96) * se, 6).alias("ci_hi"),
    )


@register(
    "agg_gini_concentration",
    oracle="""
    WITH part_rev AS (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS y
        FROM lineitem
        GROUP BY l_partkey
    ),
    ranked AS (
        SELECT y,
               ROW_NUMBER() OVER (ORDER BY y, l_partkey) AS i
        FROM part_rev
    ),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(y) AS sy,
               SUM(CAST(i AS HUGEINT) * y) AS siy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           ROUND(CAST(sy AS DOUBLE) / 100.0, 2) AS total_revenue,
           ROUND(
               2.0 * CAST(siy AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE))
               - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE),
               6
           ) AS gini
    FROM m
    """,
    category="2.4 aggregation (concentration)",
    doc="Gini coefficient of revenue concentration across parts — "
    "the single-number complement to agg_abc_classification's "
    "Pareto classes (0 = revenue spread evenly, →1 = one part "
    "takes all), computed by the sorted-rank identity "
    "G = 2·Σ(i·yᵢ)/(n·Σy) − (n+1)/n over ascending-ordered part "
    "revenues. The fact table collapses to the part dimension "
    "FIRST (one keyed aggregate of exact integer cents), so the "
    "rank window runs on the dimension-sized frame with a "
    "deterministic (revenue, key) tie-break; the final expression "
    "is closed-form double arithmetic over three exact integers — "
    "bit-stable on both engines.",
)
def agg_gini_concentration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast(dec)
        ).alias("y")
    )
    ranked = part_rev.select(
        "y",
        F.row_number()
        .over(Window.orderBy("y", "l_partkey"))
        .cast(dec)
        .alias("i"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("y").alias("sy"),
        F.sum((F.col("i") * F.col("y")).cast(dec)).alias("siy"),
    )
    n = F.col("n").cast("double")
    sy = F.col("sy").cast("double")
    siy = F.col("siy").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_parts"),
        F.round(sy / 100.0, 2).alias("total_revenue"),
        F.round(
            F.lit(2.0) * siy / (n * sy) - (n + F.lit(1.0)) / n, 6
        ).alias("gini"),
    )


@register(
    "agg_price_elasticity",
    oracle="""
    WITH buckets AS (
        SELECT CAST(FLOOR(l_extendedprice / l_quantity) AS BIGINT)
                   AS price_pt,
               SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS qty
        FROM lineitem
        GROUP BY 1
    ),
    pts AS (
        SELECT price_pt,
               ln(CAST(price_pt AS DOUBLE)) AS x,
               ln(CAST(qty AS DOUBLE)) AS y
        FROM buckets WHERE price_pt > 0
    ),
    folded AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(x ORDER BY price_pt)), (a, b) -> a + b) AS sx,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(y ORDER BY price_pt)), (a, b) -> a + b) AS sy,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(x * y ORDER BY price_pt)), (a, b) -> a + b) AS sxy,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(x * x ORDER BY price_pt)), (a, b) -> a + b) AS sxx
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_price_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS elasticity,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS intercept
    FROM folded
    """,
    category="2.4 aggregation (econometrics)",
    doc="Price elasticity of demand: the log-log OLS slope of total "
    "quantity sold against unit price — d ln(Q) / d ln(P), the "
    "constant-elasticity demand-curve estimate pricing teams run "
    "over transaction logs. NOT regr_slope over raw lines: the "
    "fact table collapses FIRST to whole-dollar price points with "
    "EXACT integer quantity totals (one map-side-combinable "
    "aggregate), so ln() sees identical integers on both engines, "
    "and the regression moments reduce in ORDERED price-point "
    "folds over the ~bucket-sized frame — bit-stable where a "
    "streamed co-moment sum is partition-order-flaky. One fact "
    "scan, one keyed shuffle, dimension-sized everything after.",
)
def agg_price_elasticity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    buckets = (
        li.groupBy(
            # nullif: a zero-quantity line (cancelled order rows
            # exist in real feeds) must yield a NULL price point —
            # dropped by the price_pt > 0 filter — not an ANSI
            # DIVIDE_BY_ZERO that kills the scan
            F.floor(
                F.col("l_extendedprice")
                / F.nullif(F.col("l_quantity"), F.lit(0))
            )
            .cast("bigint")
            .alias("price_pt")
        )
        .agg(
            F.sum(
                F.round(F.col("l_quantity")).cast("decimal(38,0)")
            ).alias("qty")
        )
        .filter(F.col("price_pt") > 0)
    )
    pts = buckets.select(
        "price_pt",
        F.log(F.col("price_pt").cast("double")).alias("x"),
        F.log(F.col("qty").cast("double")).alias("y"),
    )

    def fold(expr):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("price_pt"), expr.alias("t"))
                    )
                ),
                lambda s: s["t"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    folded = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        fold(F.col("x")).alias("sx"),
        fold(F.col("y")).alias("sy"),
        fold(F.col("x") * F.col("y")).alias("sxy"),
        fold(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return folded.select(
        n.cast("bigint").alias("n_price_points"),
        F.round(slope, 6).alias("elasticity"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@register(
    "customer_survival_km",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               MIN(date_part('year', o_orderdate) * 12
                   + date_part('month', o_orderdate)) AS first_m,
               MAX(date_part('year', o_orderdate) * 12
                   + date_part('month', o_orderdate)) AS last_m
        FROM orders
        GROUP BY o_custkey
    ),
    obs AS (
        SELECT last_m - first_m AS dur,
               CASE WHEN last_m < 1998 * 12 + 3 THEN 1 ELSE 0 END
                   AS churned
        FROM cust
    ),
    t AS (
        SELECT dur, CAST(SUM(churned) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS ending
        FROM obs GROUP BY dur
    ),
    risk AS (
        SELECT dur, d,
               CAST(SUM(ending) OVER (
                   ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_at_risk
        FROM t
    )
    SELECT CAST(dur AS INTEGER) AS month,
           n_at_risk,
           d AS n_churned,
           ROUND(exp(SUM(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk)) OVER (
               ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )), 6) AS survival
    FROM risk
    WHERE d > 0 OR n_at_risk > 0
    ORDER BY month
    """,
    category="2.4 aggregation (survival analysis)",
    doc="Kaplan-Meier survival curve for customer retention: "
    "tenure = months between first and last order; a customer "
    "whose last order predates the March-1998 cutoff is a CHURN "
    "event at that tenure, later actives are right-CENSORED — the "
    "estimator handles them correctly where a naive churn-rate-"
    "by-month silently treats still-active customers as churned. "
    "S(t) = Π over event times (1 − d_t / n_t): the fact table "
    "collapses to per-customer (first, last) in one aggregate, "
    "then to the tenure-months frame; at-risk counts come from a "
    "reverse running sum and the product runs as exp(running sum "
    "of ln terms) — prefix sums are evaluated in frame order on "
    "both engines, so the doubles agree bit-for-bit. All windows "
    "act on the ~80-row months frame, never on data.",
)
def customer_survival_km_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    mcol = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    cust = orders.groupBy("o_custkey").agg(
        F.min(mcol).alias("first_m"), F.max(mcol).alias("last_m")
    )
    obs = cust.select(
        (F.col("last_m") - F.col("first_m")).alias("dur"),
        F.when(F.col("last_m") < 1998 * 12 + 3, 1)
        .otherwise(0)
        .alias("churned"),
    )
    t = obs.groupBy("dur").agg(
        F.sum("churned").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("ending"),
    )
    w_rev = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = t.select(
        "dur",
        "d",
        F.sum("ending").over(w_rev).cast("bigint").alias("n_at_risk"),
    )
    w_fwd = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        risk.select(
            F.col("dur").cast("int").alias("month"),
            "n_at_risk",
            F.col("d").alias("n_churned"),
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            F.lit(1.0)
                            - F.col("d").cast("double")
                            / F.col("n_at_risk")
                        )
                    ).over(w_fwd)
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("month")
    )


@register(
    "agg_market_share_hhi",
    oracle="""
    WITH sup AS (
        SELECT n.n_name AS nation, l.l_suppkey,
               SUM(CAST(ROUND(l.l_extendedprice * 100) AS HUGEINT))
                   AS rev
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name, l.l_suppkey
    ),
    tot AS (
        SELECT nation, SUM(rev) AS t,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM sup GROUP BY nation
    )
    SELECT s.nation, t.n_suppliers,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(
                   (CAST(s.rev AS DOUBLE) / CAST(t.t AS DOUBLE))
                   * (CAST(s.rev AS DOUBLE) / CAST(t.t AS DOUBLE)) * 10000
                   ORDER BY s.l_suppkey)),
               (a, b) -> a + b), 4) AS hhi
    FROM sup s JOIN tot t USING (nation)
    GROUP BY s.nation, t.n_suppliers
    ORDER BY s.nation
    """,
    category="2.4 aggregation (concentration)",
    doc="Herfindahl-Hirschman Index of supplier revenue "
    "concentration per nation (Σ of squared market shares × 10000 "
    "— the antitrust scale where <1500 is competitive and >2500 "
    "concentrated): the market-structure complement to the Gini "
    "coefficient's inequality view. Fact collapses to (nation, "
    "supplier) exact integer-cent revenues in one keyed aggregate; "
    "nation totals broadcast back; squared shares reduce in an "
    "ORDERED supplier fold per nation so the doubles are "
    "bit-identical on both engines.",
)
def agg_market_share_hhi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup_dim = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    sup = (
        li.join(
            F.broadcast(sup_dim),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), "l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast(
                    "decimal(38,0)"
                )
            ).alias("rev")
        )
    )
    from pyspark.sql import Window

    # nation totals as WINDOW aggregates over the supplier-cardinality
    # frame — the frame has ONE consumer, so no pin and no join-back
    # (the previous groupBy+join shape checkpointed it to stop the
    # lineitem scan running twice)
    wn = Window.partitionBy("nation")
    sup = sup.withColumn("t", F.sum("rev").over(wn)).withColumn(
        "n_suppliers", F.count(F.lit(1)).over(wn).cast("bigint")
    )
    share = F.col("rev").cast("double") / F.col("t").cast("double")
    return (
        sup.groupBy("nation", "n_suppliers")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("l_suppkey"),
                                    (share * share * 10000).alias("t2"),
                                )
                            )
                        ),
                        lambda s: s["t2"],
                    ),
                    F.lit(0.0),
                    lambda a, b: a + b,
                ),
                4,
            ).alias("hhi")
        )
        .orderBy("nation")
    )
