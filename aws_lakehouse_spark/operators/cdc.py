"""Change-data-capture and incremental-maintenance operators.

The reference rebuilds Gold in full each run; at 100 TB the viable
pattern is incremental: diff what changed (CDC) and fold deltas into
standing aggregates instead of recomputing them. Both operators are
pure DataFrame compositions — one full-outer join keyed on the
natural key, or one union+re-aggregate on algebraic partials.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC between two table snapshots: one row per changed key with
    ``change_type`` ∈ {insert, delete, update}.

    Plan shape: ONE full-outer equi-join on the key (both sides
    shuffle once on the same key — co-partitioned), change class
    derived from null-side-ness and column comparison. Unchanged rows
    are dropped before anything else happens, so downstream work
    scales with |changes|, not |table|. Works directly on two
    ``sources.snapshots`` versions for time-travel diffs.
    """
    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
    )
    cond = None
    for k in key_cols:
        t = F.col(f"k_{k}") == F.col(f"nk_{k}")
        cond = t if cond is None else cond & t
    j = o.join(n, cond, "full_outer")

    old_present = F.col(f"k_{key_cols[0]}").isNotNull()
    new_present = F.col(f"nk_{key_cols[0]}").isNotNull()
    differs = None
    for c in compare_cols:
        # null-safe inequality per compared column
        t = ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
        differs = t if differs is None else differs | t

    change = (
        F.when(old_present & ~new_present, F.lit("delete"))
        .when(new_present & ~old_present, F.lit("insert"))
        .when(differs, F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"k_{k}"), F.col(f"nk_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *out_keys,
            "change_type",
            *[F.col(f"o_{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"n_{c}").alias(f"new_{c}") for c in compare_cols],
        )
    )


def merge_partial_aggregates(
    base: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta batch's
    partial aggregates into a standing aggregate table.

    Both inputs carry the SAME schema (keys + partial sums + count).
    Only algebraic aggregates merge this way (sum/count/min/max —
    avg derives as sum/count); the merge is a union + one re-agg
    shuffle over |base keys| + |delta keys| rows — at 100 TB that is
    dim-cardinality work, never a fact-table rescan.
    """
    merged = base.unionByName(delta)
    aggs = [F.sum(count_col).alias(count_col)]
    aggs += [F.sum(c).alias(c) for c in sum_cols]
    return merged.groupBy(*key_cols).agg(*aggs)
