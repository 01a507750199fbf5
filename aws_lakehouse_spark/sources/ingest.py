"""Ingest operators (SURVEY §2.1 S8-S9).

The reference's Lambda (``lambda/nyc_tlc_ingest.py``) lists a public
source prefix, filters to ``.parquet``, and copies each object into
the Bronze layout *iff absent* (idempotent daily re-runs,
``:45-53,183-186,242-245``). Engine equivalent without boto3: Spark
reads the source directly and writes the Bronze partition layout;
idempotency is a target-existence check — file-level bookkeeping
replaced by partition-level presence, which is what scales (one
listing per partition instead of one HEAD per object).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.sources.readers import scan_parquet


def _target_exists(path: str) -> bool:
    # local/posix path check; on object stores this is a prefix list
    return os.path.isdir(path) and any(
        not n.startswith((".", "_")) for n in os.listdir(path)
    )


def ingest_copy(
    spark: SparkSession,
    source_path: str,
    bronze_root: str,
    dataset: str,
    partition_by: tuple[str, ...] = (),
    transform=None,
) -> dict:
    """S8+S9 — copy-if-absent ingest into the Bronze layout.

    Reads the source as Parquet, optionally applies a light
    ``transform`` (e.g. adding partition columns), and writes
    ``{bronze_root}/{dataset}/KEY=value/...`` — the same layout the
    reference's Lambda constructs by string-formatting object keys
    (``nyc_tlc_ingest.py:30-37``), except Spark's ``partitionBy``
    produces it natively. Skips entirely when the target already has
    data (idempotent re-run).

    Returns a small manifest dict (driver-side bookkeeping only —
    no per-row driver work).
    """
    target = f"{bronze_root.rstrip('/')}/{dataset}"
    if _target_exists(target):
        return {"dataset": dataset, "target": target, "skipped": True}

    df: DataFrame = scan_parquet(spark, source_path)
    if transform is not None:
        df = transform(df)
    w = df.write.mode("overwrite").format("parquet")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(target)
    return {"dataset": dataset, "target": target, "skipped": False}
