#!/usr/bin/env python
"""sf1 sidecar bench for the widened kernels (r8 verdict item 5).

The one-split serialization class (r8: banded-join / minhash /
winnowing / simhash kernels collapsing onto the few splits of a
single small parquet file) only manifests a decade above the bench
scale, so the sf0.1 bench cannot watch the ``widen_if_underparallel``
fix. This sidecar runs the widened kernels (plus the two heaviest
ANN/dedup pipelines whose sf1 walls the r8 sweep flagged) at sf1 at
round close and writes ``BENCH_SF1_r{N}.json``; deltas vs the
previous round's sidecar make a widening regression visible.

    python tools/bench_sf1.py --round 10 [--sf /root/repo/.localdata/sf1]

Measurement design (r10 — the original one-shared-session/one-trial
design produced PHANTOM 2-4x round-over-round deltas):

- **one subprocess (fresh JVM) per kernel.** PySpark's
  ``spark.stop()`` keeps the py4j JVM and its heap alive, so a shared
  session makes every wall depend on which kernels ran before it —
  measured: ``dedup_simhash_pairs`` (emits 16.8M pair rows) left the
  heap in a state where the NEXT kernels ran 2-3x slower, and even
  its own warm trial measured anywhere between 16 s and 67 s
  depending on session history. A fresh JVM per kernel makes each
  number a function of the kernel alone.
- **two trials per kernel, warm wall is the signal.** The first
  execution pays Python-worker fork, codegen, Arrow init and
  allocator warm-up (``ann_lsh_bucketed``: 6.5 s cold vs 0.7-1.0 s
  warm with identical plans on an idle host). The cold wall is
  recorded for context; the round-over-round delta compares WARM
  walls. The one-split serialization class this sidecar watches
  shows in the warm wall too (a serialized band join is 119 s warm,
  widened 36 s).

Run on an idle host — never concurrently with pytest or a parity
sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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

# runs inside the per-kernel subprocess; prints one JSON line
_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from aws_lakehouse_spark.registry import load_all
from aws_lakehouse_spark.session import get_spark

name, sf, cpus = {name!r}, {sf!r}, {cpus}
fn = load_all()[name].fn
spark = get_spark("bench-sf1", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
walls = []
for _ in range(2):
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 2))
    spark.catalog.clearCache()
print("SIDECAR_RESULT " + json.dumps(walls))
"""


def _calibrate(cpus: int) -> float:
    from aws_lakehouse_spark.session import get_spark

    spark = get_spark(
        "bench-sf1-calib", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, cpus).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).collect()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    return round(best, 4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default=os.path.join(REPO, ".localdata", "sf1"))
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from aws_lakehouse_spark.registry import load_all

    registry = load_all()
    # fail fast BEFORE Spark is up: a renamed/unregistered watched
    # kernel must not KeyError mid-run and lose the partial timings
    # (r9 advice)
    unknown = [n for n in WIDENED_KERNELS if n not in registry]
    if unknown:
        raise SystemExit(f"WIDENED_KERNELS not in registry: {unknown}")
    calib_spark = _calibrate(cpus)
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in WIDENED_KERNELS:
        code = _CHILD.format(repo=REPO, name=name, sf=args.sf, cpus=cpus)
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        lines = [
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("SIDECAR_RESULT ")
        ]
        if proc.returncode != 0 or not lines:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"kernel subprocess failed: {name}")
        walls = json.loads(lines[-1].split(" ", 1)[1])
        cold[name] = walls[0]
        timings[name] = walls[1]
        print(f"{name}: cold {walls[0]}s warm {walls[1]}s", flush=True)

    result = {
        "round": args.round,
        "sf": 1.0,
        "trials": 2,
        # measurement-design version (r10 advice): a delta computed
        # across DIFFERENT designs (shared-session vs isolated-JVM)
        # is method noise, not signal — the field lets the delta
        # logic below detect and annotate that
        "design": "isolated-jvm-2trial-warm",
        "comment": (
            "one fresh JVM per kernel (shared-session walls depend on "
            "which kernels ran before — see tool docstring); queries = "
            "WARM second-trial walls, the round-over-round signal; "
            "cold_first_trial = first-execution walls (worker fork + "
            "codegen + Arrow init) for context"
        ),
        "calib_spark_sec": calib_spark,
        "queries": timings,
        "cold_first_trial": cold,
    }
    prev_path = os.path.join(REPO, f"BENCH_SF1_r{args.round - 1:02d}.json")
    if os.path.exists(prev_path):
        prev = json.load(open(prev_path))
        prev_design = prev.get("design")
        if prev_design is not None and prev_design != result["design"]:
            # cross-design deltas are measurement-method noise
            # (r10 advice): suppress the numbers, record why
            result["delta_vs_prev_suppressed"] = (
                f"previous artifact used design {prev_design!r} vs "
                f"{result['design']!r} — a cross-design delta is "
                "method noise, not signal"
            )
        else:
            result["delta_vs_prev"] = {
                n: round(t / prev["queries"][n], 2)
                for n, t in timings.items()
                if prev.get("queries", {}).get(n)
            }
            if prev_design is None:
                result["delta_vs_prev_note"] = (
                    "previous artifact predates the design field "
                    "(r10's sidecar already used per-kernel JVM "
                    "isolation, so the delta is comparable; treat "
                    "any older artifact's delta as method noise)"
                )
    out = os.path.join(REPO, f"BENCH_SF1_r{args.round:02d}.json")
    json.dump(result, open(out, "w"), indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
