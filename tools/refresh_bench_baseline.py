#!/usr/bin/env python
"""Accept the current bench sidecar as the normalized-gate baseline.

``bench.py`` gates every run's canary-normalized per-query ratios
against ``BENCH_NORMALIZED_BASELINE.json`` (r7 verdict item 8 — host
drift must not masquerade as regression or improvement). The baseline
only moves DELIBERATELY: run this after a round's numbers are
accepted (idle host confirmed via the canaries, no unexplained
regressions) to promote ``BENCH_DETAIL.json``'s normalized map.

    python tools/refresh_bench_baseline.py --round 8
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    args = ap.parse_args()
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    gate = detail.get("gate", detail.get("normalized_gate", {}))
    base = {
        "round": args.round,
        "comment": "Per-query RAW trimmed-mean walls (seconds) plus "
        "raw canary walls from the accepted round-"
        f"{args.round} bench — bench.py's gate reads the raw walls "
        "(r10 verdict item 1: the 0.1 s calib_spark normalization "
        "denominator swings 2x between sessions and manufactured a "
        "false code-regression FAIL). The normalized map stays for "
        "the advisory block only. Refresh deliberately at round "
        "close: python tools/refresh_bench_baseline.py --round N",
        # raw per-query warm-best walls: the numbers the gate
        # decides on (min over warm trials — a code regression
        # raises the floor, GC spikes only the mean)
        "raw": detail.get("warm_best", detail["trimmed_mean"]),
        # raw canary walls: fixed multi-second jobs whose RAW ratio
        # vs these values attributes a uniform shift to the host
        "calib_raw_sec": detail.get("calib_raw_sec"),
        "calib_engine_sec": detail.get("calib_engine_sec"),
        # measurement-design version of the engine canary (r11
        # verdict item 8): the gate only compares calib_engine_sec
        # across equal designs
        "calib_engine_design": detail.get("calib_engine_design", 1),
        "calib_sched_sec": detail.get("calib_sched_sec"),
        # advisory-only normalized schema (r7-r9 gate, demoted)
        "calib_spark_sec": detail["calib_spark_sec"],
        "normalized": detail["normalized"],
        "headline_normalized": detail["headline_normalized"],
    }
    out = os.path.join(REPO, "BENCH_NORMALIZED_BASELINE.json")
    json.dump(base, open(out, "w"), indent=1)
    print(
        f"baseline -> round {args.round}: {len(base['normalized'])} "
        f"queries, headline_normalized {base['headline_normalized']} "
        f"(previous gate: pass={gate.get('pass')}, "
        f"total_ratio={gate.get('total_ratio')})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
