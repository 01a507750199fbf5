"""Property tests for the stats / time-series / SCD2-lookup tier."""

from __future__ import annotations

import pyspark.sql.functions as F

from aws_lakehouse_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"


def _run(spark, name):
    return load_all()[name].fn(spark, SF_DIR)


def test_pareto_frontier_has_no_dominated_rows(spark):
    rows = _run(spark, "order_pareto_frontier").collect()
    pts = [(r["o_totalprice"], r["o_orderdate"]) for r in rows]
    for i, (p1, d1) in enumerate(pts):
        for j, (p2, d2) in enumerate(pts):
            if i == j:
                continue
            dominated = (
                p2 >= p1 and d2 >= d1 and (p2 > p1 or d2 > d1)
            )
            assert not dominated, (pts[i], pts[j])


def test_pareto_frontier_contains_both_axis_maxima(spark):
    df = _run(spark, "order_pareto_frontier")
    orders = df.sparkSession.read.parquet(f"{SF_DIR}/orders.parquet")
    best_price = orders.agg(F.max("o_totalprice")).first()[0]
    assert df.filter(F.col("o_totalprice") == best_price).count() >= 1


def test_ewma_bounded_by_trailing_max(spark):
    # EWMA with alpha=0.3 over a 24h horizon can never exceed the max
    # bucket value times the geometric weight sum (< 1)
    out = _run(spark, "events_ewma_trailing")
    buckets = out.sparkSession.read.parquet(
        f"{SF_DIR}/events.parquet"
    )
    mx = (
        buckets.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts").cast("timestamp"))
        )
        .agg(F.sum("value").alias("x"))
        .agg(F.max("x"))
        .first()[0]
    )
    assert out.filter(F.col("ewma") > mx).count() == 0
    assert out.filter(F.col("ewma").isNull()).count() == 0


def test_cumulative_distinct_is_monotone(spark):
    rows = _run(spark, "window_cumulative_distinct").collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (r["d"], r["n_new"], r["cum_users"])
        )
    for seq in by_type.values():
        seq.sort()
        run = 0
        for _, n_new, cum in seq:
            run += n_new
            assert cum == run


def test_winsorized_mean_between_bounds(spark):
    for r in _run(spark, "quality_winsorize").collect():
        assert r["p01"] <= r["mean_winsorized"] <= r["p99"]


def test_countmin_estimate_dominates_exact(spark):
    # the CMS one-sided error guarantee: estimate >= exact, always
    for r in _run(spark, "agg_countmin_heavy_hitters").collect():
        assert r["cms_n"] >= r["exact_n"]


def test_rolling_median_window_is_bounded(spark):
    # first row of each customer partition equals its own value
    out = _run(spark, "window_rolling_median")
    orders = out.sparkSession.read.parquet(f"{SF_DIR}/orders.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    first = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("expect"))
    )
    joined = out.join(first, "o_orderkey")
    bad = joined.filter(
        F.abs(F.col("rolling_median") - F.col("expect")) > 1e-9
    ).count()
    assert bad == 0


def test_scd2_pointintime_unique_version_per_fact(spark):
    # interval join must resolve each fact ROW to exactly one version:
    # output multiplicity per (orderkey, linenumber, ship_date) group
    # must equal input multiplicity (the synthetic lineitem repeats
    # linenumbers within an order, so rowwise identity needs the group
    # count, not a uniqueness assertion)
    out = _run(spark, "join_scd2_pointintime")
    orders = out.sparkSession.read.parquet(f"{SF_DIR}/orders.parquet")
    li = out.sparkSession.read.parquet(f"{SF_DIR}/lineitem.parquet")
    fact = (
        li.join(
            orders.filter(F.col("o_custkey") < 100).select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            "l_linenumber",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
        .count()
        .withColumnRenamed("count", "n_fact")
    )
    got = (
        out.groupBy("l_orderkey", "l_linenumber", "ship_date")
        .count()
        .withColumnRenamed("count", "n_out")
    )
    over = (
        got.join(fact, ["l_orderkey", "l_linenumber", "ship_date"])
        .filter(F.col("n_out") != F.col("n_fact"))
        .count()
    )
    assert over == 0


def test_welch_ttest_df_within_bounds(spark):
    r = _run(spark, "quality_ab_ttest").first()
    # Welch df lies between min(n1,n2)-1 and n1+n2-2
    assert min(r["n1"], r["n2"]) - 1 <= r["welch_df"] <= r["n1"] + r["n2"] - 2


def test_scene_cuts_bounded_by_frames(spark):
    out = _run(spark, "media_scene_cuts")
    bad = out.filter(
        (F.col("n_cuts") > F.col("n_frames") - 1)
        | (
            F.col("first_cut").isNotNull()
            & (F.col("first_cut") >= F.col("n_frames"))
        )
        | (F.col("first_cut").isNotNull() & (F.col("first_cut") < 1))
    ).count()
    assert bad == 0
    # no-cut videos must report NULL first_cut and zero count together
    assert (
        out.filter(
            F.col("first_cut").isNull() & (F.col("n_cuts") != 0)
        ).count()
        == 0
    )


def test_period_over_period_identity(spark):
    rows = _run(spark, "window_period_over_period").collect()
    rows.sort(key=lambda r: r["d"])
    for i, r in enumerate(rows):
        if i >= 1 and r["dod_delta"] is not None:
            expect = round(r["revenue"] - rows[i - 1]["revenue"], 2)
            assert abs(r["dod_delta"] - expect) < 1e-6
        if i >= 7 and r["wow_delta"] is not None:
            expect = round(r["revenue"] - rows[i - 7]["revenue"], 2)
            assert abs(r["wow_delta"] - expect) < 1e-6


def test_hll_intersection_certificate(spark):
    r = _run(spark, "agg_hll_intersection").first()
    assert r["within_10pct"] is True
    assert r["exact_overlap"] <= min(r["exact_click"], r["exact_purchase"])


def test_longest_prefix_prefers_specific_rule(spark):
    out = _run(spark, "join_longest_prefix")
    part = out.sparkSession.read.parquet(f"{SF_DIR}/part.parquet")
    # every part keyed %5==0 has its own full name in the rule set,
    # so it must match at rule_len 2
    twos = out.join(
        part.filter(F.col("p_partkey") % 5 == 0).select("p_partkey"),
        "p_partkey",
    )
    assert twos.filter(F.col("rule_len") != 2).count() == 0
    # and every part matches SOMETHING (first words are all rules)
    assert out.count() == part.count()


def test_benford_shares_sum_to_one(spark):
    rows = _run(spark, "quality_benford_drift").collect()
    assert abs(sum(r["p_obs"] for r in rows) - 1.0) < 1e-4
    assert all(1 <= r["leading_digit"] <= 9 for r in rows)


def test_bitmap_distinct_is_exact(spark):
    out = {
        r["event_type"]: r["n_users"]
        for r in _run(spark, "agg_bitmap_distinct").collect()
    }
    ev = _run(spark, "agg_bitmap_distinct").sparkSession.read.parquet(
        f"{SF_DIR}/events.parquet"
    )
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert out == exact


def test_correlation_matrix_matches_numpy(spark):
    """The exact-integer-moment Pearson matrix equals numpy's corrcoef
    on the same (cent-rounded) data to float precision."""
    import numpy as np

    out = {
        (r["metric_a"], r["metric_b"]): r["corr"]
        for r in _run(spark, "agg_correlation_matrix").collect()
    }
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .toPandas()
    )
    cents = np.round(li.to_numpy(dtype=np.float64) * 100)
    ref = np.corrcoef(cents, rowvar=False)
    cols = list(li.columns)
    assert len(out) == 6
    for (a, b), got in out.items():
        expected = ref[cols.index(a), cols.index(b)]
        assert abs(got - expected) < 1e-6, (a, b, got, expected)


def test_theil_sen_matches_sequential_reference(spark):
    """Theil-Sen slope per priority equals an independent
    median-of-pairwise-slopes computation over the same monthly
    integer-cent frame."""
    import statistics

    out = {
        r["o_orderpriority"]: r["trend_per_month"]
        for r in _run(spark, "ts_theil_sen_slope").collect()
    }
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    monthly: dict[tuple, int] = {}
    for r in orders.collect():
        m = (r["o_orderdate"].year - 1992) * 12 + r["o_orderdate"].month - 1
        k = (r["o_orderpriority"], m)
        monthly[k] = monthly.get(k, 0) + round(r["o_totalprice"] * 100)
    by_p: dict[str, list[tuple[int, int]]] = {}
    for (p, m), y in monthly.items():
        by_p.setdefault(p, []).append((m, y))
    for p, series in by_p.items():
        series.sort()
        slopes = [
            (y2 - y1) / (m2 - m1)
            for i, (m1, y1) in enumerate(series)
            for m2, y2 in series[i + 1:]
        ]
        expected = round(statistics.median(slopes) / 100, 6)
        assert abs(out[p] - expected) < 1e-9, (p, out[p], expected)
