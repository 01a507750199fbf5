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
    gate = detail.get("normalized_gate", {})
    base = {
        "round": args.round,
        "comment": "Canary-normalized per-query ratios (best-of-n "
        "seconds / calib_spark_sec) from the accepted round-"
        f"{args.round} bench. bench.py gates each run against these "
        "so host drift can't masquerade as regression or improvement "
        "(r7 verdict item 8). Refresh deliberately at round close: "
        "python tools/refresh_bench_baseline.py --round N",
        "calib_spark_sec": detail["calib_spark_sec"],
        # the ENGINE-shaped canary (scan+shuffle+collect) is the
        # code-vs-environment discriminator for uniform shifts (r8
        # verdict item 2); absent only in pre-r8 sidecars
        "calib_engine_sec": detail.get("calib_engine_sec"),
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
