#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/r12/.

Round-11 deliverable: for each query touched this round, commit
``plans/r12/<query>_before.txt`` and ``..._after.txt`` so the plan
claims in OPTIMIZATION_r12.md are checkable without running Spark.

    python tools/dump_plans_r12.py before               # all bench queries
    python tools/dump_plans_r12.py after q1 q2 ...      # a subset
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_lakehouse_spark.registry import load_all  # noqa: E402
from aws_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    assert suffix in ("before", "after"), suffix
    registry = load_all()
    names = sys.argv[2:] or [n for n, s in registry.items() if s.bench]
    unknown = [n for n in names if n not in registry]
    assert not unknown, f"unknown queries: {unknown}"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans-r12", master="local[8]", shuffle_partitions=8)
    jvm = spark._sc._jvm
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        formatted = jvm.PythonSQLUtils.explainString(qe, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted.rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
