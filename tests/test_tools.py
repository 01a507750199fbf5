"""Contracts of the operational tools the round workflow depends on
(window rotation, A/B methodology helpers) — cheap pure-Python checks,
no Spark session."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from check_parity import compare  # noqa: E402
from rotate_window import WINDOW, graded_by_round, next_window  # noqa: E402

from aws_lakehouse_spark.plans import REGISTRY  # noqa: E402


def test_next_window_is_full_and_never_graded_first():
    graded = graded_by_round()
    window = next_window([])
    assert len(window) == WINDOW
    assert len(set(window)) == WINDOW
    # rows-only specs never occupy a graded slot
    assert all(REGISTRY[n].oracle is not None for n in window)
    # never-graded queries fill the window before any re-verification
    ungraded_in = [n for n in window if n not in graded]
    n_ungraded_total = sum(
        1
        for n, s in REGISTRY.items()
        if s.oracle is not None and n not in graded
    )
    assert len(ungraded_in) == min(WINDOW, n_ungraded_total)


def test_next_window_pins_lead_the_window():
    graded = graded_by_round()
    ungraded = sorted(
        n
        for n, s in REGISTRY.items()
        if s.oracle is not None and n not in graded
    )
    if len(ungraded) < 2:
        pytest.skip("grading debt cleared; no pinnable names")
    pins = [ungraded[-1], ungraded[0]]
    window = next_window(pins)
    assert window[:2] == pins


def test_compare_flags_decimal_vs_double():
    """A Spark DecimalType output (pandas object of decimal.Decimal)
    against a DuckDB double must be a HARD failure, not normalized
    away by astype(float) — this exact hole let the driver-red
    sql_pipe_syntax row read as 'verified fixed' for two rounds
    (Spark parses the literal 100.0 as DECIMAL(4,1), so
    SUM(BIGINT)/100.0 returns Decimal('…740000') where DuckDB
    returns the double …74)."""
    from decimal import Decimal

    import pandas as pd

    # the 1/100.0 shape from the verdict: numerically identical,
    # representationally divergent
    spark_pdf = pd.DataFrame({"revenue": [Decimal("0.010000")]})
    duck_pdf = pd.DataFrame({"revenue": [0.01]})
    problems = compare("decimal_guard", spark_pdf, duck_pdf)
    assert any("decimal-vs-nondecimal" in p for p in problems)
    # and it must survive the caller's hard/soft split (no
    # "values-match" / "NOT bitwise" softener in the message)
    hard = [
        p
        for p in problems
        if "values-match" not in p and "NOT bitwise" not in p
    ]
    assert hard
    # the post-fix shape — double on both sides — passes clean
    assert compare(
        "double_ok",
        pd.DataFrame({"revenue": [0.01]}),
        pd.DataFrame({"revenue": [0.01]}),
    ) == []
    # decimal on BOTH sides is representation-consistent: not flagged
    # by this guard (exact-value comparison still applies)
    assert compare(
        "both_decimal_ok",
        pd.DataFrame({"revenue": [Decimal("0.01")]}),
        pd.DataFrame({"revenue": [Decimal("0.01")]}),
    ) == []


def test_next_window_rejects_duplicate_and_overflow_pins():
    graded = graded_by_round()
    ungraded = sorted(
        n
        for n, s in REGISTRY.items()
        if s.oracle is not None and n not in graded
    )
    if not ungraded:
        pytest.skip("grading debt cleared; no pinnable names")
    with pytest.raises(SystemExit, match="duplicate"):
        next_window([ungraded[0], ungraded[0]])
    # > WINDOW pins would previously flip the fill slice negative and
    # silently append nearly the whole ungraded queue
    too_many = (ungraded * ((WINDOW // len(ungraded)) + 2))[: WINDOW + 1]
    if len(set(too_many)) == len(too_many):
        with pytest.raises(SystemExit, match="exceed"):
            next_window(too_many)
    else:
        with pytest.raises(SystemExit):
            next_window(too_many)


def test_next_window_rejects_unknown_and_ineligible_pins():
    with pytest.raises(SystemExit, match="unknown"):
        next_window(["no_such_query"])
    graded = graded_by_round()
    already = next(
        (n for n in graded if REGISTRY.get(n) is not None), None
    )
    if already is None:
        pytest.skip("no graded queries yet")
    # a pinned name that cannot enter the window must REFUSE loudly,
    # not silently rotate a different window (round-5 advice)
    with pytest.raises(SystemExit, match="excluded"):
        next_window([already])
