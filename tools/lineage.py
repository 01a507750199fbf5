#!/usr/bin/env python
"""Registry-wide lineage report: which source tables each registered
query actually scans (derived from the ANALYZED plan, not from
docstrings), plus category and oracle status → LINEAGE.md.

Lineage from the plan keeps the report honest: a query that silently
starts scanning an extra table (or stops pruning one) shows up as a
review diff. Queries that write temp data mid-build are executed the
same way the driver executes them, so their lineage reflects the
real read set.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_lakehouse_spark.registry import load_all  # noqa: E402
from aws_lakehouse_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    registry = load_all()
    spark = get_spark("lineage", master="local[8]", shuffle_partitions=8)

    lines = [
        "# Query lineage",
        "",
        f"Derived from each query's analyzed plan at `{sf_dir}` by",
        "`tools/lineage.py`. `tables` = source parquet tables actually",
        "scanned (temp-dir intermediates excluded); queries whose plan",
        "could not be built are marked ERROR.",
        "",
        "| query | category | tables scanned | oracle |",
        "|---|---|---|---|",
    ]
    by_table: Counter[str] = Counter()
    for name, spec in registry.items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().analyzed().toString()
            paths = set(re.findall(r"file:[^\s,\]]+?([a-z_]+)\.parquet", plan))
            tables = sorted(t for t in paths if t in TABLES)
            # checkpointed frames hide their scans behind LogicalRDD —
            # fall back to the docstring-free registration source: the
            # builder already ran, so also scan the executed plan text
            if not tables:
                phys = df._jdf.queryExecution().executedPlan().toString()
                paths = set(
                    re.findall(r"file:[^\s,\]]+?([a-z_]+)\.parquet", phys)
                )
                tables = sorted(t for t in paths if t in TABLES)
            for t in tables:
                by_table[t] += 1
            shown = ", ".join(tables) if tables else "(generated/checkpointed)"
            oracle = "oracle" if spec.oracle else "rows-only"
            lines.append(
                f"| {name} | {spec.category} | {shown} | {oracle} |"
            )
        except Exception as exc:  # pragma: no cover
            lines.append(f"| {name} | {spec.category} | ERROR: {exc} | — |")
    lines += [
        "",
        "## Scans per source table",
        "",
        "| table | queries reading it |",
        "|---|---|",
    ]
    for t in TABLES:
        lines.append(f"| {t} | {by_table.get(t, 0)} |")
    spark.stop()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LINEAGE.md",
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(registry)} queries")


if __name__ == "__main__":
    main()
