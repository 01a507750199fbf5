"""Event-time window query surface (SURVEY §2.10).

The reference is purely batch (daily EventBridge cron), so these are
engine extensions — but they are the batch-checkable faces of the
Structured Streaming operators in ``aws_lakehouse_spark.streaming``:
the same ``F.window`` / ``F.session_window`` expressions run
identically under ``readStream``, which is how the engine implements
the reference's only incremental mechanism (Glue job bookmarks,
``terraform/glue.tf:158``) at the streaming tier.

Oracle notes: ``events.ts`` is TIMESTAMP(NANOS) in parquet; both
sides truncate to µs (Spark via nanosAsLong+timestamp_micros, DuckDB
via CAST AS TIMESTAMP) so window boundaries agree exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.registry import register


@register(
    "events_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
             AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    category="2.10 streaming (batch face)",
    doc="Tumbling 1-hour event-time window aggregate; identical "
    "expression runs under readStream with a watermark.",
    bench=True,
)
def events_tumbling_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        events.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH slid AS (
        SELECT e.*, make_timestamp(
                 CAST((FLOOR(epoch(CAST(e.ts AS TIMESTAMP)) / 1800) - k.k)
                      * 1800 * 1000000 AS BIGINT)) AS window_start
        FROM events e, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM slid
    GROUP BY 1, 2
    """,
    category="2.10 streaming (batch face)",
    doc="Sliding window (1 h length, 30 min slide): each event lands "
    "in 2 windows. Oracle expands the two candidate window starts "
    "per event explicitly.",
)
def events_sliding_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour", "30 minutes")
    return (
        events.groupBy(win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP)
                            - lag(CAST(ts AS TIMESTAMP)) OVER w
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
    ), sessions AS (
        SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    category="2.10 streaming (batch face)",
    doc="Session window (30 min gap) per user. Spark's "
    "session_window end = last event + gap; the oracle reproduces "
    "that with a gaps-and-islands rewrite.",
)
def events_session_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    win = F.session_window(F.col("ts"), "30 minutes")
    return (
        events.groupBy(win, "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_dedup_within_time",
    oracle="""
    SELECT user_id, event_type, minute_bucket, n_kept FROM (
        SELECT user_id, event_type,
               date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_bucket,
               CAST(1 AS BIGINT) AS n_kept,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type,
                                date_trunc('minute', CAST(ts AS TIMESTAMP))
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    category="2.10 streaming (batch face)",
    doc="Batch face of dropDuplicatesWithinWatermark: one event per "
    "(user, type, minute) bucket, earliest wins.",
)
def events_dedup_within_time_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.operators import dedupe_by_key

    events = load_table(spark, sf_dir, "events").withColumn(
        "minute_bucket", F.date_trunc("minute", F.col("ts"))
    )
    out = dedupe_by_key(
        events,
        ["user_id", "event_type", "minute_bucket"],
        [F.asc("ts"), F.asc("event_id")],
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("minute_bucket").cast("timestamp_ntz").alias("minute_bucket"),
        F.lit(1).cast("bigint").alias("n_kept"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS fv
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS fc
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.fv
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS fp
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.fc
        GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL SELECT '2_click', COUNT(*) FROM c
    UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    """,
    category="2.10 streaming (batch face)",
    doc="Ordered conversion funnel view→click→purchase: per-stage "
    "first-occurrence timestamps chained with strictly-after "
    "predicates. Each stage is a groupBy on user_id — the same "
    "shuffle key throughout, so AQE reuses the partitioning; "
    "stage counts are single-row aggregates unioned at the end.",
)
def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    # the whole chain in ONE user-partitioned pass: each stage's
    # first-qualifying timestamp is a min-over-user window whose
    # predicate reads the PREVIOUS stage's window column (a per-user
    # constant, so "strictly after stage k-1" is row-local) — no
    # per-stage scans, no join-backs, no pins. The three windows and
    # the per-user collapse share one hash partitioning; the earlier
    # pinned-chain shape (one pushed-down scan + checkpoint per
    # stage) measured 1.76x of this by interleaved A/B at sf0.1.
    w = Window.partitionBy("user_id")
    t = F.col("ts")
    d = (
        e.filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
        .withColumn(
            "fv", F.min(F.when(F.col("event_type") == "view", t)).over(w)
        )
        .withColumn(
            "fc",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (t > F.col("fv")), t
                )
            ).over(w),
        )
        .withColumn(
            "fp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (t > F.col("fc")),
                    t,
                )
            ).over(w),
        )
    )
    per_user = d.groupBy("user_id").agg(
        F.min("fv").alias("fv"),
        F.min("fc").alias("fc"),
        F.min("fp").alias("fp"),
    )
    counts = per_user.agg(
        F.count("fv").alias("v"),
        F.count("fc").alias("c"),
        F.count("fp").alias("p"),
    )
    return counts.select(
        F.expr(
            "stack(3, '1_view', v, '2_click', c, '3_purchase', p)"
        ).alias("stage", "n_users")
    )


@register(
    "events_retention",
    oracle="""
    WITH first AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
        FROM events GROUP BY user_id
    ), act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT CAST(date_diff('day', f.d0, a.d) AS INTEGER) AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY day_offset
    ORDER BY day_offset
    """,
    category="2.10 streaming (batch face)",
    doc="Cohort retention curve: first-seen day per user, distinct "
    "active days joined back, day-offset histogram. Both sides of "
    "the join are keyed and pre-aggregated on user_id — one "
    "partitioning serves the groupBys and the join.",
)
def events_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    # first-seen is a min-over-user WINDOW on the distinct (user, day)
    # frame — the window reuses the frame in place, so there is no
    # groupBy+join-back, no second fact scan, and no pin (the r5
    # checkpoint pin this replaces; the weekly-triangle fusion of the
    # same shape measured 0.78x of the join-back at sf0.1)
    act = e.select("user_id", d.alias("d")).distinct()
    d0 = F.min("d").over(Window.partitionBy("user_id"))
    return (
        act.select(
            "user_id",
            F.datediff(F.col("d"), d0).cast("int").alias("day_offset"),
        )
        .groupBy("day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("day_offset")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - LAG(CAST(ts AS TIMESTAMP)) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(CAST(ts AS TIMESTAMP)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), s AS (
        SELECT user_id, event_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM g
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events
    FROM s
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
    category="2.10 streaming (batch face)",
    doc="Gap-based sessionization (30-min inactivity): lag + "
    "cumulative-sum of session starts assigns ordinal session ids "
    "per user — the batch equivalent of F.session_window that also "
    "YIELDS the session id for downstream joins. Both windows and "
    "the final group-by share one partitioning (user_id): a single "
    "shuffle end-to-end.",
)
def events_sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_session).over(wsum).alias("session_no"),
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id", "session_no")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_id, event_type, value,
               AVG(value) OVER (PARTITION BY event_type) AS mu,
               STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS sigma
        FROM events
    )
    SELECT event_id, event_type,
           ROUND(value, 6) AS value,
           ROUND((value - mu) / sigma, 4) AS zscore
    FROM stats
    WHERE (value - mu) / sigma > 3.0
    ORDER BY event_id
    """,
    category="2.10 streaming (batch face)",
    doc="Z-score anomaly detection per event type: whole-partition "
    "window mean/stddev (no ordering, one shuffle on the type key), "
    "flag values beyond 3 sigma. The batch face of a streaming "
    "monitor where mu/sigma come from the stateful running "
    "aggregates.",
)
def events_anomaly_zscore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    mu = F.avg("value").over(w)
    sigma = F.stddev_samp("value").over(w)
    # nullif: a constant-valued event type has sigma exactly 0 and
    # ANSI double 0/0 THROWS — an undefined z-score is NULL (never
    # beyond 3 sigma), not a job-killing exception
    z = (F.col("value") - mu) / F.nullif(sigma, F.lit(0.0))
    return (
        e.select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 4).alias("zscore"),
            z.alias("__z_raw"),
        )
        .filter(F.col("__z_raw") > 3.0)
        .drop("__z_raw")
        .orderBy("event_id")
    )


@register(
    "events_attribution",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id,
               CAST(ts AS TIMESTAMP) AS click_ts
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(ts AS TIMESTAMP) AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ), j AS (
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               c.click_id, c.click_ts
        FROM p JOIN c ON p.user_id = c.user_id
         AND c.click_ts <= p.purchase_ts
         AND c.click_ts > p.purchase_ts - INTERVAL 30 MINUTE
    )
    SELECT purchase_id, user_id, purchase_ts, n_clicks,
           click_id AS last_click_id
    FROM (
        SELECT j.*,
               ROW_NUMBER() OVER (PARTITION BY purchase_id
                   ORDER BY click_ts DESC, click_id DESC) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)
                   AS n_clicks
        FROM j
    ) WHERE rn = 1
    ORDER BY purchase_id
    """,
    category="2.10 streaming (batch face)",
    doc="Last-click attribution: purchases joined to same-user clicks "
    "in the preceding 30 minutes (the batch face of the watermarked "
    "stream-stream join in streaming.windows.stream_stream_"
    "attribution). The pair join is an equi-join on user_id with a "
    "time residual — never a cartesian — and the last-click pick + "
    "candidate count share ONE window shuffle on purchase_id.",
)
def events_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    j = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    w = Window.partitionBy("purchase_id")
    wo = w.orderBy(F.col("click_ts").desc(), F.col("click_id").desc())
    return (
        j.withColumn("rn", F.row_number().over(wo))
        .withColumn("n_clicks", F.count(F.lit(1)).over(w).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            "n_clicks",
            F.col("click_id").alias("last_click_id"),
        )
        .orderBy("purchase_id")
    )


@register(
    "events_gap_fill",
    oracle="""
    WITH e AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type
        FROM events
    ), c AS (
        SELECT h, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY h, event_type
    ), b AS (
        SELECT MIN(h) AS mn, MAX(h) AS mx FROM c
    ), spine AS (
        SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
    ), t AS (
        SELECT DISTINCT event_type FROM c
    ), grid AS (
        SELECT s.h, t.event_type FROM spine s CROSS JOIN t
    )
    SELECT g.h AS hour_start, g.event_type,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events,
           c.n IS NULL AS is_gap
    FROM grid g
    LEFT JOIN c ON g.h = c.h AND g.event_type = c.event_type
    ORDER BY hour_start, g.event_type
    """,
    category="2.10 streaming (batch face)",
    doc="Gap-filled hourly counts: a calendar spine (sequence over "
    "the observed hour range) crossed with the observed type set, "
    "left-joined to the hourly aggregate so silent hours surface as "
    "explicit zero rows — the densification every downstream "
    "time-series model/alert needs. The raw table is scanned ONCE "
    "(spine, type set, and bounds all derive from the checkpointed "
    "hourly aggregate, which is O(hours x types) at any event "
    "volume).",
)
def events_gap_fill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    )
    counts = (
        ev.groupBy("h", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        # referenced three times (bounds, type set, the join) — and it
        # is the only frame that touched the raw events
        .localCheckpoint(eager=False)
    )
    bounds = counts.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = counts.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    return (
        grid.join(counts, ["h", "event_type"], "left")
        .select(
            F.col("h").alias("hour_start"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.col("n").isNull().alias("is_gap"),
        )
        .orderBy("hour_start", "event_type")
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ), pairs AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           ROUND(n / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM pairs
    ORDER BY prev_type, next_type
    """,
    category="2.10 streaming (batch face)",
    doc="User-journey transition matrix: per-user event sequences "
    "(lag over ts, event_id tie-break) collapsed into first-order "
    "Markov transition counts and row-normalized probabilities — the "
    "funnel-free way to see where sessions actually flow. Scale "
    "shape: ONE shuffle on user_id for the sequence window, then a "
    "type-pair aggregate (|types|² rows at most) and a window over "
    "that bounded frame; the raw stream never feeds a global sort.",
)
def events_transition_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("p"),
    ).orderBy("prev_type", "next_type")


@register(
    "events_burst_runs",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
        SELECT user_id, event_id, ts,
               SUM(CASE WHEN gap_us IS NULL OR gap_us > 3600000000
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS burst_id
        FROM seq
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS burst_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
               AS BIGINT) AS duration_s
    FROM islands
    GROUP BY user_id, burst_id
    HAVING COUNT(*) >= 3
    ORDER BY user_id, burst_start
    """,
    category="2.10 streaming (batch face)",
    doc="Burst detection via gaps-and-islands: per-user event gaps "
    "over a lag window, island ids from a running count of "
    ">1-hour gaps, bursts = islands of >=3 events with start and "
    "duration — the activity-spike detector (abuse, scraping, "
    "incident load) that watermarked windows can't express because "
    "burst boundaries are DATA-driven, not aligned to a grid. Scale "
    "shape: both windows partition by user_id — one shuffle, no "
    "global ordering; microsecond-epoch arithmetic keeps the gap "
    "math integer-exact across engines.",
)
def events_burst_runs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (nanos-parquet conversion); unix_micros
    # requires TIMESTAMP — the session is pinned UTC, so the cast
    # is wall-clock-identity
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = seq.select(
        "user_id",
        "ts",
        F.sum(
            F.when(
                F.col("gap_us").isNull() | (F.col("gap_us") > 3_600_000_000),
                1,
            ).otherwise(0)
        )
        .over(run_w)
        .alias("burst_id"),
    )
    return (
        islands.groupBy("user_id", "burst_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "burst_start"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (
                (F.unix_micros(F.max("ts").cast("timestamp"))
                 - F.unix_micros(F.min("ts").cast("timestamp")))
                / F.lit(1_000_000)
            )
            .cast("bigint")
            .alias("duration_s"),
        )
        .filter(F.col("n_events") >= 3)
        .drop("burst_id")
        .orderBy("user_id", "burst_start")
    )


@register(
    "events_rolling_wau",
    oracle="""
    WITH day_user AS (
        SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                   AS DATE) AS d,
               user_id
        FROM events
    ), days AS (
        SELECT DISTINCT d FROM day_user
    ), contrib AS (
        SELECT du.d + CAST(o.o AS INTEGER) AS target_d, du.user_id
        FROM day_user du, (SELECT unnest(range(0, 7)) AS o) o
    )
    SELECT strftime(c.target_d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
    FROM contrib c JOIN days ON days.d = c.target_d
    GROUP BY c.target_d
    ORDER BY day
    """,
    category="2.10 streaming (batch face)",
    doc="Rolling 7-day active users per day (WAU): rolling COUNT "
    "DISTINCT cannot be a window aggregate (distincts don't sum "
    "across frames), so each (day, user) contribution EXPLODES to "
    "the 7 target days it supports and distinct users are counted "
    "per target day — turning an uncomputable sliding distinct into "
    "one dedup shuffle + a 7x bounded explode + one count-distinct "
    "shuffle. THE product-engagement metric, and the standard "
    "pattern for any sliding-window distinct at scale. Target days "
    "clamp to days observed in the data.",
)
def events_rolling_wau_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # single consumer, no pin: a target day is "observed in the data"
    # iff some contribution reaches it at offset 0 (that contribution
    # IS the day's own (day, user) row), so the observed-day clamp
    # folds into the same aggregation as the distinct count — no
    # separate day list, no join-back (the r5 shape pinned the
    # distinct frame to feed both; the clamp marker makes the second
    # consumer unnecessary)
    day_user = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    contrib = day_user.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "d",
        "user_id",
    ).select(
        F.date_add(F.col("d"), F.col("o")).alias("target_d"),
        (F.col("o") == 0).cast("int").alias("is_anchor"),
        "user_id",
    )
    return (
        contrib.groupBy("target_d")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("wau"),
            F.max("is_anchor").alias("__observed"),
        )
        .filter(F.col("__observed") == 1)
        .select(
            F.date_format("target_d", "yyyy-MM-dd").alias("day"), "wau"
        )
        .orderBy("day")
    )


@register(
    "events_growth_accounting",
    oracle="""
    WITH wu AS (
        SELECT DISTINCT CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
                   AS DATE) AS wk,
               user_id
        FROM events
    ), weeks AS (
        SELECT DISTINCT wk FROM wu
    ), pairs AS (
        SELECT w1.wk AS wk, w1.wk + 7 AS next_wk FROM weeks w1
        WHERE EXISTS (SELECT 1 FROM weeks w2 WHERE w2.wk = w1.wk + 7)
    )
    SELECT strftime(p.next_wk, '%Y-%m-%d') AS week,
           CAST(COUNT(CASE WHEN cur.user_id IS NOT NULL
                            AND prev.user_id IS NOT NULL THEN 1 END)
               AS BIGINT) AS retained,
           CAST(COUNT(CASE WHEN cur.user_id IS NULL
                            AND prev.user_id IS NOT NULL THEN 1 END)
               AS BIGINT) AS churned,
           CAST(COUNT(CASE WHEN cur.user_id IS NOT NULL
                            AND prev.user_id IS NULL THEN 1 END)
               AS BIGINT) AS new_users
    FROM pairs p
    LEFT JOIN wu prev ON prev.wk = p.wk
    FULL OUTER JOIN wu cur
      ON cur.wk = p.next_wk AND cur.user_id = prev.user_id
     AND prev.wk = p.wk
    WHERE p.next_wk IS NOT NULL
      AND COALESCE(prev.wk, cur.wk - 7) = p.wk
    GROUP BY p.next_wk
    ORDER BY week
    """,
    category="2.10 streaming (batch face)",
    doc="Week-over-week growth accounting: for each consecutive week "
    "pair, users classify as retained (active both), churned (prior "
    "only), or new (current only) via a full-outer join of the two "
    "weekly distinct-user sets keyed on (week, user) — the standard "
    "engagement ledger. One dedup shuffle plus one co-partitioned "
    "full outer per week pair; weekly user sets scale with actives, "
    "not events.",
)
def events_growth_accounting_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # four consumers (week list twice via the self-join, prev, cur) —
    # pin the user-week frame so events is scanned once, not six times
    wu = (
        ev.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    weeks = wu.select("wk").distinct()
    pairs = (
        weeks.alias("w1")
        .join(
            weeks.alias("w2"),
            F.col("w2.wk") == F.date_add(F.col("w1.wk"), 7),
            "left_semi",
        )
        .select(
            F.col("wk"), F.date_add(F.col("wk"), 7).alias("next_wk")
        )
    )
    prev = wu.select(F.col("wk").alias("pwk"), F.col("user_id").alias("pu"))
    cur = wu.select(F.col("wk").alias("cwk"), F.col("user_id").alias("cu"))
    classified = (
        F.broadcast(pairs)
        .join(prev, F.col("pwk") == F.col("wk"), "inner")
        .join(
            cur,
            (F.col("cwk") == F.col("next_wk")) & (F.col("cu") == F.col("pu")),
            "full_outer",
        )
    )
    # rows from cur with no pair context (first week) are excluded by
    # requiring a resolvable week pair on either side
    both = classified.filter(
        F.col("next_wk").isNotNull() | F.col("cwk").isNotNull()
    )
    # recompute the week key from whichever side is present
    week = F.coalesce(F.col("next_wk"), F.col("cwk"))
    # "new" rows (cur-only) must still belong to a week that HAS a
    # predecessor week — semi join against pairs.next_wk
    valid_next = pairs.select(F.col("next_wk").alias("vn")).distinct()
    both = both.join(
        F.broadcast(valid_next), week == F.col("vn"), "left_semi"
    )
    return (
        both.groupBy(week.alias("week"))
        .agg(
            F.count(
                F.when(F.col("cu").isNotNull() & F.col("pu").isNotNull(), 1)
            )
            .cast("bigint")
            .alias("retained"),
            F.count(
                F.when(F.col("cu").isNull() & F.col("pu").isNotNull(), 1)
            )
            .cast("bigint")
            .alias("churned"),
            F.count(
                F.when(F.col("cu").isNotNull() & F.col("pu").isNull(), 1)
            )
            .cast("bigint")
            .alias("new_users"),
        )
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            "retained",
            "churned",
            "new_users",
        )
        .orderBy("week")
    )


@register(
    "events_session_stats",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - LAG(CAST(ts AS TIMESTAMP)) OVER w
                         > INTERVAL 30 MINUTE
                    OR LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM g
    ), sess AS (
        SELECT user_id, session_no,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
                   AS BIGINT) AS duration_s
        FROM s GROUP BY user_id, session_no
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_events,
           CAST(quantile_disc(duration_s, 0.50) AS BIGINT) AS p50_duration_s,
           CAST(quantile_disc(duration_s, 0.90) AS BIGINT) AS p90_duration_s,
           CAST(MAX(duration_s) AS BIGINT) AS max_duration_s,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS bounce_sessions
    FROM sess
    """,
    category="2.10 streaming (batch face)",
    doc="Session-quality profile: sessionize (30-min gap rule, same "
    "islands logic as events_sessionize) then aggregate the SESSION "
    "frame — count, mean events, p50/p90/max duration (sketch "
    "quantiles, exact at this cardinality), and single-event bounce "
    "sessions. The engagement summary a product team reads daily. "
    "Scale shape: one user-partitioned window shuffle, then "
    "aggregates over the session frame (scales with sessions, not "
    "events); quantile sketch keeps the final reduce bounded.",
)
def events_session_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > 30 * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    run_w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = ev.select(
        "user_id", "event_id", "ts", new_session.alias("ns")
    ).withColumn("session_no", F.sum("ns").over(run_w))
    sess = s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            )
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("duration_s"),
    )
    return sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.expr("approx_percentile(duration_s, 0.50, 1000000)")
        .cast("bigint")
        .alias("p50_duration_s"),
        F.expr("approx_percentile(duration_s, 0.90, 1000000)")
        .cast("bigint")
        .alias("p90_duration_s"),
        F.max("duration_s").cast("bigint").alias("max_duration_s"),
        F.count(F.when(F.col("n_events") == 1, 1))
        .cast("bigint")
        .alias("bounce_sessions"),
    )


@register(
    "events_top_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
        SELECT event_type || '>' || t2 || '>' || t3 AS path,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY path
    )
    SELECT path, n, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT path, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rnk
        FROM paths
    ) WHERE rnk <= 10
    """,
    category="2.10 streaming (batch face)",
    doc="Top event-type trigram paths (sequence mining lite): per-user "
    "ordered sequences (lead x2 over ts with event_id tie-break) "
    "collapsed into 3-step path counts; global top-10 with a "
    "deterministic path tie-break. Scale shape: ONE shuffle on "
    "user_id for the sequence window, then a path aggregate bounded "
    "by |types|^3 distinct keys — the top-k runs on that tiny frame "
    "(TakeOrderedAndProject, no global sort of the raw stream).",
)
def events_top_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    paths = (
        seq.filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    ranked = paths.select(
        "path",
        "n",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("path")))
        .cast("int")
        .alias("rnk"),
    )
    return ranked.filter(F.col("rnk") <= 10).orderBy("rnk")


@register(
    "events_stream_stream_join",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'click'
    ), views AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT c.event_id, c.user_id,
           CAST(COUNT(v.ts) AS BIGINT) AS n_views_10m
    FROM clicks c LEFT JOIN views v
      ON c.user_id = v.user_id
     AND v.ts >= c.ts - INTERVAL 10 MINUTE
     AND v.ts <= c.ts
    GROUP BY c.event_id, c.user_id
    """,
    category="2.10 streaming (batch face)",
    doc="Stream-stream interval join, batch face: each click joined "
    "to the same user's views in the preceding 10 minutes (the "
    "view-through attribution join). The equi-key (user_id) makes "
    "this a keyed join with a range residual — never a cross "
    "product — and zero-view clicks survive via LEFT semantics. "
    "The streaming face is streaming/windows.py "
    "stream_stream_attribution (watermarked readStream interval "
    "join, proved pair-equivalent to its batch join in "
    "tests/test_streaming.py::test_stream_stream_join_matches_batch): "
    "watermarks bound the join state exactly like this WHERE "
    "clause bounds the batch scan.",
)
def events_stream_stream_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("c_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("v_ts") <= F.col("c_ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("v_ts").cast("bigint").alias("n_views_10m")
    )


@register(
    "window_range_interval_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_1h,
           ROUND(SUM(value) OVER w, 2) AS sum_trailing_1h
    FROM events
    WINDOW w AS (
        PARTITION BY user_id
        ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    """,
    category="2.5 windows",
    doc="Time-based RANGE frame (the interval-window complement of "
    "the ROWS frames in window_running_frames): per user, the count "
    "and value sum of events in the TRAILING HOUR of each event — "
    "rate-limit / velocity features that a rows-frame cannot express "
    "because event spacing is irregular. The frame orders by "
    "integer microsecond epoch on both engines, so frame membership "
    "is integer-exact. One shuffle (partition by user), ordered "
    "range scan within partition — the plan a 1000-executor sort "
    "would produce per user bucket.",
)
def window_range_interval_frame_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_trailing_1h"),
    )


@register(
    "events_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS fv
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
        SELECT e.user_id, v.fv, MIN(CAST(e.ts AS TIMESTAMP)) AS fp
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > v.fv
        GROUP BY e.user_id, v.fv
    ), lat AS (
        SELECT CAST(CAST(fv AS DATE) AS TIMESTAMP) AS cohort_day,
               date_diff('microsecond', fv, fp) / 60000000.0 AS mins
        FROM p
    )
    SELECT cohort_day,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(quantile_cont(mins, 0.5), 4) AS median_minutes,
           ROUND(quantile_cont(mins, 0.9), 4) AS p90_minutes,
           ROUND(AVG(mins), 4) AS avg_minutes
    FROM lat GROUP BY cohort_day
    """,
    category="2.10 streaming (batch face)",
    doc="Conversion-latency distribution per first-view cohort day: "
    "minutes from a user's first view to their first SUBSEQUENT "
    "purchase, summarized as count/median/p90/mean — the funnel's "
    "'how fast', complementing events_funnel's 'how many'. "
    "Latencies are exact microsecond differences (integer epoch "
    "arithmetic on both engines — second-granularity truncation "
    "would diverge) and the interpolated `percentile` == "
    "`quantile_cont`. Scale: both stage reductions and the cohort "
    "rollup shuffle on user_id then the calendar-bounded cohort "
    "key; per-group percentile state is bounded by the cohort's "
    "converter count.",
)
def events_time_to_convert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    # one user-partitioned pass (the funnel fusion): the first view is
    # a min-over-user window, the first later purchase a second window
    # whose predicate reads the first — no per-type scans, no join
    w = Window.partitionBy("user_id")
    t = F.col("ts")
    d = (
        e.filter(F.col("event_type").isin("view", "purchase"))
        .select("user_id", "event_type", "ts")
        .withColumn(
            "fv", F.min(F.when(F.col("event_type") == "view", t)).over(w)
        )
        .withColumn(
            "fp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (t > F.col("fv")),
                    t,
                )
            ).over(w),
        )
    )
    p = (
        d.groupBy("user_id")
        .agg(F.min("fv").alias("fv"), F.min("fp").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )
    lat = p.select(
        F.to_date("fv").cast("timestamp").alias("cohort_day"),
        (
            (
                F.unix_micros(F.col("fp").cast("timestamp"))
                - F.unix_micros(F.col("fv").cast("timestamp"))
            )
            / 60000000.0
        ).alias("mins"),
    )
    return lat.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(mins, 0.5)"), 4).alias("median_minutes"),
        F.round(F.expr("percentile(mins, 0.9)"), 4).alias("p90_minutes"),
        F.round(F.avg("mins"), 4).alias("avg_minutes"),
    )


@register(
    "events_bounce_rate",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - LAG(CAST(ts AS TIMESTAMP)) OVER w
                         > INTERVAL 30 MINUTE
                    OR LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM g
    ), sess AS (
        SELECT user_id, session_no,
               CAST(MIN(ts) AS DATE) AS d,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_no
    )
    SELECT d,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces,
           ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
    FROM sess GROUP BY d ORDER BY d
    """,
    category="2.10 streaming (batch face)",
    doc="Daily bounce rate over 30-minute-gap sessions: the share "
    "of sessions that contain exactly ONE event, attributed to the "
    "session's start date — the engagement-quality KPI sitting on "
    "top of the same gaps-and-islands sessionization "
    "events_session_stats builds (lag-gap flag, running session "
    "number — one user-keyed shuffle; session and daily rollups "
    "act on reduced frames). Counts make the rate exact.",
)
def events_bounce_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROsecond gap arithmetic (the repo's events convention): ts
    # carries sub-second precision, and a second-truncated gap would
    # disagree with the oracle's full-precision interval compare at
    # the 30-minute boundary. NTZ → TIMESTAMP first; the session-tz
    # offset cancels in the difference.
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    g = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            gap.isNull() | (gap > 30 * 60 * 1_000_000), 1
        ).otherwise(0).alias("new_session"),
    )
    s = g.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_no"),
    )
    sess = s.groupBy("user_id", "session_no").agg(
        F.to_date(F.min("ts")).alias("d"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        sess.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            bounce.cast("bigint").alias("n_bounces"),
            F.round(
                bounce / F.count(F.lit(1)).cast("double"), 6
            ).alias("bounce_rate"),
        )
        .orderBy("d")
    )
