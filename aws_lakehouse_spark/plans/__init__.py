"""The engine's registered query surface.

Importing this package populates :data:`aws_lakehouse_spark.registry.
REGISTRY` with every declared query: the SURVEY §2 operator inventory
(core relational + scalar functions + event-time windows), the
medallion pipeline queries, and the LLM training-data extensions
(dedup / similarity / text analysis / multimodal).
"""

from aws_lakehouse_spark.plans import (  # noqa: F401
    core,
    core_ext,
    scalar,
    events_windows,
    medallion,
    sql_surface,
    quality,
    tpch,
    tpch2,
    llm_text,
    llm_dedup,
    llm_similarity,
    multimodal,
)

from aws_lakehouse_spark.registry import REGISTRY

__all__ = ["REGISTRY"]
