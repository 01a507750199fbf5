"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All three functions delegate to the engine's query registry
(``aws_lakehouse_spark.registry``), where every SURVEY.md §2 operator
is declared alongside its oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from aws_lakehouse_spark.registry import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The star-revenue query: Silver cleanse (range quality filters) +
    window dedup + 3-way star join + grouped agg + ordered result —
    scan→filter→window→join→agg→sort in one Catalyst plan.
    """
    from aws_lakehouse_spark.plans.medallion import star_revenue
    from aws_lakehouse_spark.session import configure_runtime

    configure_runtime(spark)
    return star_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI oracle for each SQL-expressible query;
    non-SQL-expressible ops are omitted → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
