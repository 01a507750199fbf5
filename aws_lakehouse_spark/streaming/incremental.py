"""Bookmark-equivalent incremental processing (SURVEY §2.10 option 1).

Glue job bookmarks make the reference's Bronze→Silver job process
only files that appeared since the last run. The exact Spark
equivalent: a file-source ``readStream`` with a checkpoint +
``Trigger.AvailableNow`` — each invocation drains *new* files only,
then stops. State (which files were seen) lives in the checkpoint,
not in a hand-rolled bookkeeping table, and survives restarts.

At 100 TB this is the difference between a daily full rescan and a
daily delta: the file index grows, but processed bytes stay
proportional to new data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from aws_lakehouse_spark.session import configure_runtime


def incremental_process(
    spark: SparkSession,
    source_path: str,
    schema: StructType | str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    sink_path: str,
    partition_by: tuple[str, ...] = (),
    fmt: str = "parquet",
) -> None:
    """Process only-new files under ``source_path`` through
    ``transform`` into ``sink_path``; blocks until the backlog is
    drained (AvailableNow), then returns — one 'bookmarked run'.

    The file source needs an explicit ``schema`` (streaming scans
    don't infer) — pass the Silver DDL, which the reference also
    declares explicitly (``noaa_ghcn_bronze_to_silver.py:120-130``).
    """
    configure_runtime(spark)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1000)
        .parquet(source_path)
    )
    out = transform(stream)
    writer = (
        out.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint_dir)
        .option("path", sink_path)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    query = writer.start()
    query.awaitTermination()
