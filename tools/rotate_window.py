#!/usr/bin/env python
"""Compute (and optionally apply) the next driver correctness window.

The driver grades exactly the FIRST 50 registry entries each round
(`CORRECTNESS_r{N}.json`), so paying down the never-graded backlog is
pure ordering work in ``aws_lakehouse_spark/plans/__init__.py``'s
``_PRIORITY`` list. This tool makes each rotation mechanical:

    python tools/rotate_window.py            # print the next window
    python tools/rotate_window.py --apply    # rewrite _PRIORITY in place

Selection contract (matches the round-5 rotation):

- a query is GRADED once any ``CORRECTNESS_r*.json`` row for it is
  fully green (rows + schema + hash);
- candidates are the oracle-backed registry queries never graded,
  taken in ALPHABETICAL order (the queue order documented in the
  ``_PRIORITY`` comment since round 5) — pass names as positional
  args to pin specific queries to the window front first;
- rows-only specs (oracle=None) are excluded: the driver's weaker
  rows-only check doesn't clear grading debt, so a window slot on
  one is wasted;
- if fewer than 50 ungraded remain, the window is padded with the
  LONGEST-AGO-graded queries (earliest round first, alphabetical
  within a round) so every slot still re-verifies something.

``--apply`` rewrites only the literal list between ``_PRIORITY = [``
and the ``index 50 boundary`` marker, leaving the surrounding
commentary for the committer to update by hand (the comment explains
WHY a window was chosen; a tool shouldn't pretend to know that).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INIT_PATH = os.path.join(REPO, "aws_lakehouse_spark", "plans", "__init__.py")
WINDOW = 50


def graded_by_round() -> dict[str, int]:
    """query -> earliest round with a fully green driver row."""
    earliest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                earliest.setdefault(name, rnd)
    return earliest


def next_window(pinned: list[str]) -> list[str]:
    from aws_lakehouse_spark.plans import REGISTRY

    graded = graded_by_round()
    oracle_backed = [n for n, s in REGISTRY.items() if s.oracle is not None]
    unknown = [n for n in pinned if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown pinned queries: {unknown}")
    if len(set(pinned)) != len(pinned):
        dupes = sorted({n for n in pinned if pinned.count(n) > 1})
        raise SystemExit(f"duplicate pinned queries: {dupes}")
    if len(pinned) > WINDOW:
        # more pins than slots would silently overflow the window via
        # the negative fill slice below — refuse instead
        raise SystemExit(
            f"{len(pinned)} pinned queries exceed the {WINDOW}-slot window"
        )
    ungraded = sorted(n for n in oracle_backed if n not in graded)
    dropped = [n for n in pinned if n not in ungraded]
    if dropped:
        # a pinned name that is already graded or rows-only would be
        # silently omitted — the operator explicitly asked for it, so
        # refuse rather than quietly rotate a different window
        detail = {
            n: "rows-only (oracle=None)"
            if REGISTRY[n].oracle is None
            else f"already graded green in r{graded[n]}"
            for n in dropped
        }
        raise SystemExit(f"pinned queries excluded from window: {detail}")
    window = list(pinned)
    window += [n for n in ungraded if n not in window][
        : max(0, WINDOW - len(window))
    ]
    if len(window) < WINDOW:
        # debt cleared: pad with the stalest green rows for re-verification
        stale = sorted(
            (n for n in oracle_backed if n not in window),
            key=lambda n: (graded.get(n, 0), n),
        )
        window += stale[: WINDOW - len(window)]
    return window


def apply_window(window: list[str]) -> None:
    src = open(INIT_PATH).read()
    pattern = re.compile(
        r"(_PRIORITY = \[\n).*?(    # --- index 50 boundary)", re.S
    )
    body = "".join(f'    "{n}",\n' for n in window)
    new, n_sub = pattern.subn(rf"\g<1>{body}\g<2>", src)
    if n_sub != 1:
        raise SystemExit("_PRIORITY block not found; apply by hand")
    with open(INIT_PATH, "w") as fh:
        fh.write(new)
    print(f"rewrote {INIT_PATH} with a {len(window)}-query window")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--apply"]
    window = next_window(args)
    graded = graded_by_round()
    n_ungraded_left = len(
        [
            n
            for n in window
            if n not in graded
        ]
    )
    for name in window:
        tag = "" if name not in graded else f"  (re-verify, r{graded[name]})"
        print(f"{name}{tag}")
    print(
        f"\n{len(window)} queries; {n_ungraded_left} never-graded in window"
    )
    if "--apply" in sys.argv[1:]:
        apply_window(window)
        # sanity: the rewritten module must import and still expose
        # the window as its first entries
        import importlib

        import aws_lakehouse_spark.plans as plans

        importlib.reload(plans)
        got = list(plans.REGISTRY)[: len(window)]
        assert got == window, "reorder mismatch after apply"
        print("re-import check: window confirmed as the first entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
