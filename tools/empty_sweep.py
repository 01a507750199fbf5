#!/usr/bin/env python
"""Empty-input sweep: run EVERY registry query against zero-row
copies of the driver tables and report crashes.

At 100 TB, any operator can receive zero rows — an upstream filter
that matches nothing, a stale partition, a pipeline's first run —
and the correct behavior is an empty result, not a driver-side
exception. This sweep is the diagnostic that found the round-5
empty-edge bugs (numpy kernels stacking empty batches, PageRank's
1/0 node count, PQ codebook collects indexed without rows, demo
roundtrips asserting on scenarios an empty input can't produce);
tests/test_empty_inputs.py regression-locks the fixed set.

    python tools/empty_sweep.py            # zero-row tables
    python tools/empty_sweep.py --rows 1   # one-row boundary (also
                                           # breaks referential
                                           # integrity across tables)
    python tools/empty_sweep.py --nulls    # every column NULL except
                                           # each table's first id
                                           # (a bad upstream extract)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_lakehouse_spark.registry import load_all  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def build_truncated_dir(src: str, rows: int, nulls: bool = False) -> str:
    """``rows``-row parquet per table, preserving physical types
    (duckdb round-trips TIMESTAMP_NS for the events table). With
    ``nulls``, every column except each table's first is NULLed."""
    import duckdb

    tag = "nulls" if nulls else f"rows{rows}"
    out = tempfile.mkdtemp(prefix=f"lakehouse_sf_{tag}_")
    con = duckdb.connect()
    for t in TABLES:
        proj = "*"
        if nulls:
            cols = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
            proj = ", ".join(
                f'"{n}"' if i == 0 else f'CAST(NULL AS {ty}) AS "{n}"'
                for i, (n, ty, *_rest) in enumerate(cols)
            )
        con.execute(
            f"COPY (SELECT {proj} FROM read_parquet('{src}/{t}.parquet') "
            f"LIMIT {rows}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    rows = 0
    nulls = "--nulls" in sys.argv
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    if nulls and not rows:
        rows = 200
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    empty_dir = build_truncated_dir(src, rows, nulls)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok, fails = 0, []
    for name, spec in load_all().items():
        try:
            n = spec.fn(spark, empty_dir).count()
            ok += 1
            print(f"ok {name}: {n}", flush=True)
        except Exception as e:  # noqa: BLE001 - diagnostic sweep
            fails.append(name)
            msg = str(e).splitlines()[0][:200] if str(e) else ""
            print(f"CRASH {name}: {type(e).__name__}: {msg}", flush=True)
    print(f"\n{ok} ok, {len(fails)} crash")
    if fails:
        print("crashes:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
