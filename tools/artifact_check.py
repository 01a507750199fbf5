#!/usr/bin/env python
"""Round-close tripwire for the driver-facing artifacts (r10 verdict
item 6): one command that exits non-zero listing every red artifact,
so a FAIL can never again ship unnoticed while the round notes say
PASS (r9 shipped a red BENCH gate that way; r10 shipped an unrotated
grading window).

    python tools/artifact_check.py

Checks (each prints one PASS/FAIL line):

1. bench_gate       — BENCH_DETAIL.json's raw gate verdict is pass
2. correctness      — every row of the LATEST CORRECTNESS_r*.json is
                      fully green (rows + schema + hash)
3. parity_sf001     — the latest PARITY_SF001_r*.txt counts 328 pass,
                      0 fail
4. parity_sf1       — same for the latest PARITY_SF1_r*.txt
5. shuffle_gate     — SHUFFLE_GATE.json (persisted by
                      `shuffle_audit.py --gate`) is pass
6. window_rotated   — `_PRIORITY[:50]` differs from the latest graded
                      key set: the next driver run buys fresh
                      evidence instead of re-grading last round's
                      window (the r10 fumble). Run
                      `python tools/rotate_window.py --changed
                      --apply` to clear.
7. copycheck        — COPYCHECK.json flags nothing
8. leakcheck        — LEAKCHECK.json has zero hits

Staleness is reported (file round vs latest correctness round) but
only hard-fails for the parity artifacts, which are regenerated every
round by contract.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest(pattern: str) -> tuple[str | None, int]:
    best, best_round = None, -1
    for path in glob.glob(os.path.join(REPO, pattern)):
        m = re.search(r"_r0*(\d+)\.(?:json|txt)$", path)
        rnd = int(m.group(1)) if m else 0
        if rnd > best_round:
            best, best_round = path, rnd
    return best, best_round


def _parity_counts(path: str) -> tuple[int, int]:
    n_pass = n_fail = 0
    for line in open(path):
        if line.startswith("pass "):
            n_pass += 1
        elif line.startswith("fail "):
            n_fail += 1
    return n_pass, n_fail


def main() -> int:
    results: list[tuple[str, bool, str]] = []

    def check(name: str, ok: bool, msg: str) -> None:
        results.append((name, ok, msg))

    # 1. bench gate
    bench_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if os.path.exists(bench_path):
        gate = json.load(open(bench_path)).get("gate", {})
        check(
            "bench_gate",
            bool(gate.get("pass")),
            f"baseline r{gate.get('baseline_round')}, "
            f"median_ratio={gate.get('median_ratio')}, "
            f"regressions={sorted(gate.get('regressions', {}))}",
        )
    else:
        check("bench_gate", False, "BENCH_DETAIL.json missing")

    # 2. latest correctness window green
    corr_path, corr_round = _latest("CORRECTNESS_r*.json")
    corr_keys: set[str] = set()
    if corr_path:
        rows = json.load(open(corr_path))
        corr_keys = set(rows)
        red = sorted(
            n
            for n, r in rows.items()
            if not (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            )
        )
        check(
            "correctness",
            not red,
            f"r{corr_round}: {len(rows) - len(red)}/{len(rows)} green"
            + (f", red: {red}" if red else ""),
        )
    else:
        check("correctness", False, "no CORRECTNESS_r*.json")

    # 3-4. parity artifacts (must be from the current round by
    # contract — staleness vs the latest graded round hard-fails)
    for label, pattern in (
        ("parity_sf001", "PARITY_SF001_r*.txt"),
        ("parity_sf1", "PARITY_SF1_r*.txt"),
    ):
        path, rnd = _latest(pattern)
        if path is None:
            check(label, False, f"no {pattern}")
            continue
        n_pass, n_fail = _parity_counts(path)
        ok = n_pass == 328 and n_fail == 0
        stale = corr_round > 0 and rnd < corr_round
        check(
            label,
            ok and not stale,
            f"r{rnd}: {n_pass} pass, {n_fail} fail"
            + (
                f" — STALE (latest graded round is r{corr_round}; "
                "regenerate via tools/check_parity.py)"
                if stale
                else ""
            ),
        )

    # 5. shuffle gate (persisted verdict)
    sg_path = os.path.join(REPO, "SHUFFLE_GATE.json")
    if os.path.exists(sg_path):
        sg = json.load(open(sg_path))
        check(
            "shuffle_gate",
            bool(sg.get("pass")),
            f"vs r{sg.get('baseline_round')} baseline"
            + (
                f", failures: {sg.get('failures')}"
                if sg.get("failures")
                else ""
            ),
        )
    else:
        check(
            "shuffle_gate",
            False,
            "SHUFFLE_GATE.json missing — run "
            "`python tools/shuffle_audit.py --gate`",
        )

    # 6. window rotated since the last graded round
    sys.path.insert(0, REPO)
    from aws_lakehouse_spark.plans import REGISTRY

    window = set(list(REGISTRY)[:50])
    if corr_keys:
        check(
            "window_rotated",
            window != corr_keys,
            "next driver window "
            + (
                "re-grades the already-graded "
                f"r{corr_round} key set — run `python "
                "tools/rotate_window.py --changed --apply`"
                if window == corr_keys
                else f"differs from the r{corr_round} graded set "
                f"({len(window - corr_keys)} fresh)"
            ),
        )
    else:
        check("window_rotated", True, "no graded rounds yet")

    # 7-8. hygiene artifacts
    # COPYCHECK/LEAKCHECK are DRIVER-emitted: they are quoted in the
    # verdicts but never land in the repo, so on a builder machine
    # "missing" is the normal state — reporting it as FAIL would make
    # the tripwire permanently red and train readers to ignore red
    # (the exact failure mode this tool exists to prevent). Missing →
    # skip with a note; present-and-flagging → the real failure.
    cc_path = os.path.join(REPO, "COPYCHECK.json")
    if os.path.exists(cc_path):
        flagged = json.load(open(cc_path)).get("flagged", ["<unread>"])
        check("copycheck", not flagged, f"flagged: {flagged}")
    else:
        check("copycheck", True, "skipped: driver-side artifact not present")
    lc_path = os.path.join(REPO, "LEAKCHECK.json")
    if os.path.exists(lc_path):
        n = json.load(open(lc_path)).get("n_hits", -1)
        check("leakcheck", n == 0, f"n_hits={n}")
    else:
        check("leakcheck", True, "skipped: driver-side artifact not present")

    width = max(len(n) for n, _, _ in results)
    n_red = 0
    for name, ok, msg in results:
        n_red += not ok
        print(f"{name:<{width}}  {'PASS' if ok else 'FAIL'}  {msg}")
    print(
        f"\n{len(results) - n_red}/{len(results)} artifact checks green"
        + ("" if not n_red else f" — {n_red} RED")
    )
    return 1 if n_red else 0


if __name__ == "__main__":
    raise SystemExit(main())
