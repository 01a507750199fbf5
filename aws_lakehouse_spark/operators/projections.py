"""Projection operators (SURVEY §2.2 P1-P2).

Re-expresses the reference's Bronze→Silver standardization step —
select-list with alias + cast to a snake_case typed schema
(reference ``glue-jobs/noaa_ghcn_bronze_to_silver.py:76-85``) and
``withColumn`` derivations (``:67,70-72,95-99``) — as generic
operators. Both stay fully inside Catalyst: projection pushdown and
column pruning reach the parquet scan for free.
"""

from __future__ import annotations

from collections.abc import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def project_rename_cast(
    df: DataFrame, spec: Mapping[str, tuple[str, str | None]]
) -> DataFrame:
    """P1 — typed, renamed projection.

    ``spec`` maps output column name → (source column/expr, cast type
    or None). A single ``select`` so the optimizer sees one
    projection (the reference does exactly this shape at
    ``noaa_ghcn_bronze_to_silver.py:76-85``).
    """
    cols: list[Column] = []
    for out_name, (src, cast_to) in spec.items():
        col = F.expr(src) if not src.isidentifier() else F.col(src)
        if cast_to:
            col = col.cast(cast_to)
        cols.append(col.alias(out_name))
    return df.select(*cols)


def derive_columns(df: DataFrame, exprs: Mapping[str, Column]) -> DataFrame:
    """P2 — add derived columns in one pass.

    Uses a single ``withColumns`` (not chained ``withColumn``) so the
    analyzer builds one Project node regardless of how many
    derivations are added.
    """
    return df.withColumns(dict(exprs))
