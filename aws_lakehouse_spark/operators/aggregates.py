"""Aggregation operators (SURVEY §2.4 A1-A4 + extensions).

The reference's aggregate surface: COUNT(*) table stats
(``README.md:253``), grouped COUNT/AVG/SUM revenue rollups
(``README.md:256-264``), grouped top-k (``README.md:266-275``), and
SELECT DISTINCT dimension extraction
(``glue-jobs/noaa_ghcn_silver_to_gold.py:56-79``).

All go through ``groupBy().agg()`` so Spark plans partial (map-side)
+ final hash aggregation automatically — at 100 TB the partial agg
is what keeps the shuffle small. Extensions: exact + approximate
count-distinct, rollup/cube grouping sets.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def count_star(df: DataFrame, alias: str = "n_rows") -> DataFrame:
    """A1 — COUNT(*) as a one-row DataFrame (not an eager
    ``df.count()`` — the reference's triple-count anti-pattern,
    SURVEY §4.3.1, is deliberately not reproduced)."""
    return df.agg(F.count(F.lit(1)).alias(alias))


def group_agg(
    df: DataFrame,
    keys: Sequence[str | Column],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """A2 — grouped aggregation; every output aliased explicitly."""
    return df.groupBy(*keys).agg(
        *[col.alias(name) for name, col in aggs.items()]
    )


def distinct_projection(df: DataFrame, cols: Sequence[Column | str]) -> DataFrame:
    """A4 — SELECT DISTINCT over a projection (dimension extraction,
    ``glue-jobs/noaa_ghcn_silver_to_gold.py:67,79``)."""
    return df.select(*cols).distinct()


def group_topk(
    df: DataFrame,
    keys: Sequence[str | Column],
    aggs: Mapping[str, Column],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """A3 — grouped aggregate + ORDER BY ... LIMIT k.

    Spark plans TakeOrderedAndProject: each partition keeps a k-row
    heap, the driver merges k·p rows — no global sort at any scale.
    Callers must include a unique tie-break in ``order_by`` for
    deterministic results.
    """
    return group_agg(df, keys, aggs).orderBy(*order_by).limit(k)


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: Mapping[str, Column]
) -> DataFrame:
    """Grouping-sets extension: ROLLUP with grouping indicators."""
    out = df.rollup(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out


def cube_agg(
    df: DataFrame, keys: Sequence[str], aggs: Mapping[str, Column]
) -> DataFrame:
    """Grouping-sets extension: CUBE with grouping indicators."""
    return df.cube(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
