#!/usr/bin/env python
"""Per-cell-isolated A/B bench for SESSION CONF variants (r11).

Conf changes can't be A/B'd inside one session (most are build-time),
and cross-process single runs drift 1.4x on this host — so each
(variant, query) cell is a FRESH JVM subprocess (the r10 sidecar
lesson: spark.stop() keeps the py4j JVM alive and heap history
contaminates every later wall) running N warm trials, and cells are
COUNTERBALANCED per query (A, B, B, A) so neither variant
systematically pays drift. The per-variant statistic is the min of
its cells' warm-best walls — a real conf win lowers the floor.

    python tools/ab_conf.py '{"label":"base"}' \
        '{"label":"shj","conf":{"spark.sql.join.preferSortMergeJoin":"false"}}' \
        query1 [query2 ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
SPARK_GRAFT_AB_TRIALS (4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_AB_TRIALS", "4"))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from aws_lakehouse_spark.registry import load_all
from aws_lakehouse_spark.session import get_spark

name, sf, cpus, trials = {name!r}, {sf!r}, {cpus}, {trials}
extra = {extra!r}
extra = dict(extra)
extra.setdefault("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
extra.setdefault("spark.sql.files.openCostInBytes", str(64 * 1024))
fn = load_all()[name].fn
spark = get_spark("ab-conf", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus, extra_conf=extra)
walls = []
for _ in range(trials):
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 3))
    spark.catalog.clearCache()
print("AB_CELL " + json.dumps(walls))
"""


def run_cell(name: str, extra: dict) -> list[float]:
    code = _CHILD.format(
        repo=REPO, name=name, sf=SF_DIR, cpus=CPUS, trials=TRIALS,
        extra=extra,
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_CELL "):
            return json.loads(line[len("AB_CELL "):])
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
    raise RuntimeError(f"cell failed: {name}")


def main() -> int:
    variants = []
    args = sys.argv[1:]
    while args and args[0].lstrip().startswith("{"):
        variants.append(json.loads(args.pop(0)))
    queries = args
    if len(variants) != 2 or not queries:
        print(__doc__)
        return 2
    a, b = variants
    results: dict[str, dict] = {}
    for name in queries:
        cells = {"a": [], "b": []}
        for tag in ("a", "b", "b", "a"):
            v = a if tag == "a" else b
            walls = run_cell(name, v.get("conf", {}))
            warm = walls[1:] or walls
            cells[tag].append(min(warm))
            print(f"  {name} [{v['label']}] walls={walls}", flush=True)
        best_a, best_b = min(cells["a"]), min(cells["b"])
        results[name] = {
            a["label"]: best_a,
            b["label"]: best_b,
            "ratio": round(best_b / best_a, 3) if best_a else None,
        }
        print(f"{name}: {results[name]}", flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "trials": TRIALS,
                      "variants": [a, b], "results": results}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
