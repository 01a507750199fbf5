#!/usr/bin/env python
"""Same-table rescan audit: for EVERY registry query, count how many
times each source table's parquet appears in the physical plan and
report queries that scan one table more than once.

At 100 TB, a derived frame consumed by k downstream operators without
a pin re-embeds its full derivation k times — and the compounding is
multiplicative down a chain (round-5's worst: triangle counting
re-ran the two-shuffle co-purchase expansion 14 times). This audit is
the diagnostic that found the round-5 pinning batch;
tests/test_plans.py::test_pinned_fanout_scan_budget locks the fixed
set at its minimal visible scan count.

Interpreting the output — a rescan is NOT automatically a defect:
- correlated-aggregate shapes (TPC-H q17/q18/q20/q21) join a table
  against its own aggregate by definition
- self-joins (stream-stream, as-of trades/quotes, wedge joins on a
  PINNED frame) read the same relation twice on purpose
- two-period drift slices and IVM delta tiles are differently-
  filtered pushed-down scans — columnar parquet reads each column
  once either way
- corpus-sized shared frames (exploded token/bigram frames) are often
  CHEAPER to re-derive than to materialize
The defect signature is a SMALL derived frame (an aggregate, a top-k,
a per-key summary) consumed more than once without a localCheckpoint.

    python tools/rescan_audit.py           # sf0.001 (plan-only, fast)
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_lakehouse_spark.registry import load_all  # noqa: E402

TABLES = {
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
}


def main() -> int:
    from aws_lakehouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("rescan-audit", master="local[4]", shuffle_partitions=4)
    flagged = 0
    for name, spec in load_all().items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = spark._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            hits = Counter(
                t
                for t in re.findall(
                    r"InMemoryFileIndex[^\n]*/(\w+)\.parquet", plan
                )
                if t in TABLES
            )
            dups = {t: c for t, c in hits.items() if c >= 2}
            if dups:
                flagged += 1
                print(f"{name}: {dups}", flush=True)
        except Exception as e:  # noqa: BLE001 - diagnostic sweep
            print(f"ERR {name}: {type(e).__name__}", flush=True)
    print(f"\n{flagged} queries with same-table rescans (see module "
          "docstring before treating any as a defect)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
