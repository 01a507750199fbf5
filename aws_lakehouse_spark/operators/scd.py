"""Slowly-changing-dimension (type 2) versioning.

The reference's Gold dimensions are rebuilt-in-full each run
(``noaa_ghcn_silver_to_gold.py:55-67``); a production lakehouse
usually keeps dimension HISTORY instead. ``scd2_versions`` derives
the SCD2 shape from an event stream of attribute observations:
one row per (key, attribute-value run) with validity interval and
current flag.

Scale shape: a single window shuffle partitioned by the dimension
key — no self-join, no driver state. At 100 TB the fact-sized event
input is the only big side and it shuffles exactly once.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def scd2_versions(
    events: DataFrame,
    key_cols: Sequence[str],
    attr_col: str,
    order_cols: Sequence[Column],
    effective_col: str,
) -> DataFrame:
    """Collapse an observation stream into SCD2 version rows.

    ``events``: one row per observation of ``attr_col`` for a key,
    ordered within key by ``order_cols`` (must be a total order for
    determinism — include a unique tie-break). ``effective_col`` is
    the string/date column stamped into ``valid_from``/``valid_to``.

    A new version opens at every observation whose attribute differs
    from the previous observation (lag); ``valid_to`` is the next
    version's ``valid_from`` (NULL for the current version);
    ``version`` numbers run 1..n per key.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    with_prev = events.withColumn("__prev", F.lag(attr_col).over(w))
    changes = with_prev.filter(
        F.col("__prev").isNull() | (F.col(attr_col) != F.col("__prev"))
    ).drop("__prev")
    wc = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        changes.withColumn("valid_from", F.col(effective_col))
        .withColumn("valid_to", F.lead("valid_from").over(wc))
        .withColumn("version", F.row_number().over(wc).cast("int"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
