"""Query registry — the engine's declared query surface.

Every operator from SURVEY.md §2 that the engine implements is
registered here as a :class:`QuerySpec`: a named Spark query builder
``(spark, sf_dir) -> DataFrame`` paired (when SQL-expressible) with
an ANSI-SQL oracle string that DuckDB runs on the same parquet tables
for the driver's correctness gate (row-count + schema +
order-insensitive value hash).

Contract notes (SURVEY §7 "hash-match discipline"):
- every computed column is aliased identically on both sides;
- float aggregates are rounded identically on both sides;
- any LIMIT/top-k query orders by a unique tie-break key;
- integer derivations are cast to the same width on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    category: str = ""  # SURVEY §2 section, e.g. "2.3 joins"
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    category: str = "",
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            category=category,
            doc=doc or (fn.__doc__ or "").strip(),
            bench=bench,
            tags=tags,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every plans module (side effect: populates REGISTRY)."""
    from aws_lakehouse_spark import plans  # noqa: F401

    return REGISTRY
