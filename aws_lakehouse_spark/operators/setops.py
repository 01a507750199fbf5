"""Set operators (SURVEY §2.7).

None exist in the reference's code, but its NYC surface implies
unioning yellow+green taxi file sets into one Silver table
(``README.md:120-121,285``) — ``unionByName`` with missing-column
tolerance is the faithful Spark expression. intersect/except come
free and are exposed for the declared query surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_relations(
    dfs: list[DataFrame], allow_missing_columns: bool = True
) -> DataFrame:
    """UNION ALL by column name across heterogeneous file sets."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns),
        dfs,
    )


def intersect_relations(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def except_relations(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
