"""Contracts of the operational tools the round workflow depends on
(window rotation, A/B methodology helpers) — cheap pure-Python checks,
no Spark session."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

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
