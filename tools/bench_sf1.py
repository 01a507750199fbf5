#!/usr/bin/env python
"""sf1 sidecar bench for the widened kernels (r8 verdict item 5).

The one-split serialization class (r8: banded-join / minhash /
winnowing / simhash kernels collapsing onto the few splits of a
single small parquet file) only manifests a decade above the bench
scale, so the sf0.1 bench cannot watch the ``widen_if_underparallel``
fix. This sidecar runs the widened kernels (plus the two heaviest
ANN/dedup pipelines whose sf1 walls the r8 sweep flagged) ONCE each
at sf1 at round close and writes ``BENCH_SF1_r{N}.json``; deltas vs
the previous round's sidecar make a widening regression visible.

    python tools/bench_sf1.py --round 9 [--sf /root/repo/.localdata/sf1]

One trial per query is deliberate (the verdict's spec): at 30-90 s
walls the signal is the ORDER OF MAGNITUDE (36 s vs the unwidened
119 s), not ±10%; calib canaries ride along for drift context.
Run on an idle host — never concurrently with pytest or a parity
sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_lakehouse_spark.registry import load_all  # noqa: E402
from aws_lakehouse_spark.session import get_spark  # noqa: E402

# the r8 one-split class, plus the heavy pipelines whose sf1 walls
# were flagged engine-vs-oracle-unattributable before the timing
# split (check_parity now records engine_s separately, but the
# sidecar keeps them watched round-over-round)
WIDENED_KERNELS = [
    "join_range_banded",
    "join_interval_overlap",
    "dedup_minhash_signature",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "text_winnow_fingerprint",
    "ann_lsh_bucketed",
    "dedup_incremental_minhash",
]


def _calibrate(spark, cpus: int) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, cpus).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default=os.path.join(REPO, ".localdata", "sf1"))
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = load_all()
    # fail fast BEFORE Spark is up: a renamed/unregistered watched
    # kernel must not KeyError mid-run and lose the partial timings
    # (r9 advice)
    unknown = [n for n in WIDENED_KERNELS if n not in registry]
    if unknown:
        raise SystemExit(f"WIDENED_KERNELS not in registry: {unknown}")
    spark = get_spark(
        "bench-sf1", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    calib_spark = _calibrate(spark, cpus)
    timings: dict[str, float] = {}
    for name in WIDENED_KERNELS:
        t0 = time.time()
        registry[name].fn(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.time() - t0, 2)
        print(f"{name}: {timings[name]}s", flush=True)
        spark.catalog.clearCache()
    spark.stop()

    result = {
        "round": args.round,
        "sf": 1.0,
        "trials": 1,
        "calib_spark_sec": calib_spark,
        "queries": timings,
    }
    prev_path = os.path.join(REPO, f"BENCH_SF1_r{args.round - 1:02d}.json")
    if os.path.exists(prev_path):
        prev = json.load(open(prev_path))
        result["delta_vs_prev"] = {
            n: round(t / prev["queries"][n], 2)
            for n, t in timings.items()
            if prev.get("queries", {}).get(n)
        }
    out = os.path.join(REPO, f"BENCH_SF1_r{args.round:02d}.json")
    json.dump(result, open(out, "w"), indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
