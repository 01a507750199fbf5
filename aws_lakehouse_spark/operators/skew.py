"""Skew-mitigation operators (SURVEY §4.4; task north-star).

AQE's skew-join splitting handles skewed *joins*; skewed *group-bys*
(a handful of hot keys receiving most rows) still funnel each hot
key through one reducer. ``salted_group_agg`` is the classic
two-stage fix: append a random salt to the key, pre-aggregate
(keys+salt) — spreading each hot key over N reducers — then
aggregate the partials by the true key.

Only algebraic aggregates decompose this way; the helper supports
count/sum/min/max and derives avg = sum/count. The salt is
``rand``-based — nondeterministic per row, but the *result* is
exactly the direct aggregation (oracle-checked in plans.core_ext).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_alias: str | None = "n_rows",
    avg_of: Sequence[str] = (),
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation, exact-equivalent to a direct
    ``groupBy(keys)`` with the same aggregates.

    Output columns: ``sum_<c>``, ``min_<c>``, ``max_<c>``,
    ``count_alias``, and ``avg_<c>`` for each ``avg_of`` (which must
    also be in ``sum_cols``-style inputs; avg is computed from the
    re-aggregated sum and count, never averaged-of-averages).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )

    partial_aggs: list[Column] = [F.count(F.lit(1)).alias("__pc")]
    partial_aggs += [F.sum(c).alias(f"__ps_{c}") for c in set(sum_cols) | set(avg_of)]
    partial_aggs += [F.min(c).alias(f"__pm_{c}") for c in min_cols]
    partial_aggs += [F.max(c).alias(f"__px_{c}") for c in max_cols]
    # avg must ignore NULLs like F.avg / SQL AVG: carry a per-column
    # NON-NULL count through the partial stage and divide by that,
    # never by the overall row count
    partial_aggs += [F.count(F.col(c)).alias(f"__pn_{c}") for c in avg_of]
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)

    final_aggs: list[Column] = []
    if count_alias:
        final_aggs.append(F.sum("__pc").alias(count_alias))
    final_aggs += [
        F.sum(f"__ps_{c}").alias(f"sum_{c}") for c in set(sum_cols) | set(avg_of)
    ]
    final_aggs += [F.min(f"__pm_{c}").alias(f"min_{c}") for c in min_cols]
    final_aggs += [F.max(f"__px_{c}").alias(f"max_{c}") for c in max_cols]
    final_aggs += [F.sum(f"__pn_{c}").alias(f"__n_{c}") for c in avg_of]
    out = partial.groupBy(*keys).agg(*final_aggs)
    for c in avg_of:
        # NULL when every input was NULL — matches F.avg; 0/0 would
        # otherwise surface as NULL anyway via division, but guard
        # explicitly for integer-typed sums
        out = out.withColumn(
            f"avg_{c}",
            F.when(
                F.col(f"__n_{c}") > 0, F.col(f"sum_{c}") / F.col(f"__n_{c}")
            ),
        )
    return out.drop(*[f"__n_{c}" for c in avg_of])


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join, exact-equivalent to
    ``skewed.join(other, skewed[skewed_key] == other[other_key], how)``.

    The skewed (big, hot-keyed) side gets a random salt in
    [0, salt_buckets); the other side is replicated once per salt
    value via an explode — so a hot key's rows spread over
    ``salt_buckets`` reducers instead of funneling through one.
    Join key becomes (key, salt) both sides.

    Use when AQE's skew-join split can't help: e.g. the skewed side
    feeds a window/aggregation that pins partitioning, or the skew is
    in a single key exceeding one executor's memory. The other side
    is replicated ×salt_buckets — keep it the smaller side.
    ``how`` supports inner/left (semantics preserved: salt never
    changes match cardinality since every skewed row has exactly one
    salt and every other-side key carries all salts).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = salted.join(
        replicated,
        (salted[skewed_key] == replicated[other_key])
        & (salted["__salt"] == replicated["__salt"]),
        how,
    )
    return out.drop("__salt")
