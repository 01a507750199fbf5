"""Semantics tests for the behavioral-analytics tier.

The oracle-parity gate (tests/test_parity.py) already cross-checks
every behavior query against DuckDB on the shared tables; these tests
pin the properties a same-formula-both-sides oracle cannot isolate:
interval union must not double-count overlaps, funnel steps must be
strictly ordered (a click BEFORE the first view must not count), and
distributed id assignment must be gap-free, 1-based, and identical to
the single-partition ground truth.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from aws_lakehouse_spark.plans.behavior import (
    events_interval_merge_q,
    sink_identity_column_q,
)

SF_DIR = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t)
            for i, (u, m, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_interval_merge_does_not_double_count(spark, monkeypatch):
    # user 1: events at t=0 and t=10min -> one merged 40-min interval
    # (30 + 10 overlap-free), NOT 60; user 2: t=0 and t=120min -> two
    # disjoint 30-min intervals
    ev = _ev(
        spark,
        [(1, 0, "view"), (1, 10, "view"), (2, 0, "view"), (2, 120, "view")],
    )
    import aws_lakehouse_spark.plans.behavior as mod

    monkeypatch.setattr(
        mod, "load_table", lambda spark, sf_dir, name: ev
    )
    out = {
        r["user_id"]: r
        for r in events_interval_merge_q(spark, SF_DIR).collect()
    }
    assert out[1]["n_intervals"] == 1
    assert out[1]["covered_us"] == 40 * 60 * 1_000_000
    assert out[2]["n_intervals"] == 2
    assert out[2]["covered_us"] == 60 * 60 * 1_000_000


def test_funnel_requires_strict_event_order(spark, monkeypatch):
    # user 1 converts in order; user 2's click precedes their first
    # view, so they must stop at step 1
    ev = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 5, "click"),
            (1, 9, "purchase"),
            (2, 10, "click"),
            (2, 20, "view"),
            (2, 25, "purchase"),
        ],
    )
    import aws_lakehouse_spark.plans.behavior as mod

    monkeypatch.setattr(mod, "load_table", lambda s, d, n: ev)
    from aws_lakehouse_spark.plans.behavior import events_funnel_steps_q

    rows = {
        r["step_no"]: r["users"]
        for r in events_funnel_steps_q(spark, SF_DIR).collect()
    }
    assert rows[1] == 2  # both users viewed
    assert rows[2] == 1  # only user 1 clicked after viewing
    assert rows[3] == 1


def test_identity_column_is_gap_free_and_ordered(spark):
    out = sink_identity_column_q(spark, SF_DIR).collect()
    ids = sorted(r["row_id"] for r in out)
    assert ids == list(range(1, len(out) + 1))
    # row_id order must equal (lang, doc_id) lexicographic order
    by_id = sorted(out, key=lambda r: r["row_id"])
    keys = [(r["lang"], r["doc_id"]) for r in by_id]
    assert keys == sorted(keys)


def test_market_basket_lift_is_symmetric_support(spark):
    from aws_lakehouse_spark.plans.behavior import market_basket_rules_q

    rows = market_basket_rules_q(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0.0 < r["support"] <= 1.0
        assert 0.0 < r["confidence"] <= 1.0
        assert r["lift"] > 0.0
        # lift must exceed 1 whenever confidence beats the consequent's
        # base rate; at minimum the ordering is deterministic
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
