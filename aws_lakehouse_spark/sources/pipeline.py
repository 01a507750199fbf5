"""Pipeline orchestration (SURVEY §2.12 C1-C5).

The reference's Step Functions state machine — IngestBronze →
ProcessDimensions → BronzeToSilver → SilverToGold → Maintenance with
per-state retry/backoff (``terraform/stepfunctions.tf:72-179``) —
collapsed into one SparkSession and a Python call chain. Data passes
through the catalog/filesystem between stages exactly as it did
through S3, but without five cluster cold-starts.
"""

from __future__ import annotations

import functools
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from aws_lakehouse_spark.sources.ingest import ingest_copy
from aws_lakehouse_spark.sources.maintenance import run_maintenance
from aws_lakehouse_spark.sources.medallion import (
    bronze_to_silver_observations,
    parse_countries,
    parse_inventory,
    parse_states,
    parse_stations,
    silver_to_gold,
)
from aws_lakehouse_spark.sources.writers import (
    sink_partition_overwrite,
    sink_table_overwrite,
)


def retrying(
    attempts: int = 2, interval_s: float = 30.0, backoff: float = 2.0
):
    """C2 — per-stage retry with backoff (the reference's 2 attempts
    / 30-60 s interval / ×2.0 backoff,
    ``terraform/stepfunctions.tf:83-90``)."""

    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            delay = interval_s
            for attempt in range(attempts + 1):
                try:
                    return fn(*args, **kwargs)
                except Exception:
                    if attempt == attempts:
                        raise
                    time.sleep(delay)
                    delay *= backoff
            raise AssertionError("unreachable")

        return wrapped

    return deco


@dataclass
class PipelineConfig:
    """Stage parameters, mirroring the Glue job args
    (``noaa_ghcn_bronze_to_silver.py:15-24``)."""

    source_path: str
    bronze_root: str
    silver_db: str = "silver"
    gold_db: str = "gold"
    dataset: str = "observations"
    dim_paths: dict[str, str] = field(default_factory=dict)
    retry_interval_s: float = 0.1  # test-friendly; prod: 30.0
    maintenance_tables: tuple[str, ...] = ()
    # when set, each run also commits the gold fact to a manifest
    # snapshot log (sources.snapshots) — one version per pipeline
    # run, time-travelable, with real M1/M3 maintenance; the
    # engine's stand-in for the reference's Iceberg gold tables
    gold_snapshot_path: str | None = None


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict:
    """C1 — the full DAG; returns a stage→result manifest.

    C4 (empty-input short-circuit) uses ``isEmpty()`` — one partial
    scan, not the reference's triple ``count()`` (SURVEY §4.3.1).
    """
    retry = retrying(attempts=2, interval_s=cfg.retry_interval_s)
    manifest: dict = {}

    for db in (cfg.silver_db, cfg.gold_db):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")

    # 1. IngestBronze (S8)
    manifest["ingest"] = retry(ingest_copy)(
        spark, cfg.source_path, cfg.bronze_root, cfg.dataset
    )

    # 2. ProcessDimensions — overwrite semantics (S5)
    parsers = {
        "dim_stations": parse_stations,
        "dim_countries": parse_countries,
        "dim_states": parse_states,
        "dim_inventory": parse_inventory,
    }
    for dim, parser in parsers.items():
        path = cfg.dim_paths.get(dim)
        if not path:
            continue
        df = retry(parser)(spark, path)
        sink_table_overwrite(df, f"{cfg.silver_db}.{dim}")
        manifest[dim] = "overwritten"

    # 3. BronzeToSilver — cleanse, empty short-circuit (C4), then
    #    partition-overwrite. The reference appended here and relied
    #    on Glue job bookmarks for only-new-files; the engine's batch
    #    path gets the same idempotency by overwriting exactly the
    #    date partitions present in this run's input (re-running a
    #    day reprocesses that day, never duplicates it). True
    #    only-new-files incremental is streaming.incremental_process.
    silver = retry(bronze_to_silver_observations)(
        spark, f"{cfg.bronze_root.rstrip('/')}/{cfg.dataset}"
    )
    if silver.isEmpty():
        manifest["bronze_to_silver"] = "empty-input-short-circuit"
        return manifest
    silver_table = f"{cfg.silver_db}.observations"
    sink_partition_overwrite(silver, silver_table, ("year", "month", "day"))
    manifest["bronze_to_silver"] = {"table": silver_table, "format": "parquet"}

    # 4. SilverToGold — dims overwrite, fact partition-overwrite
    #    (fixes the reference's append-duplication, SURVEY §4.3.5)
    gold = silver_to_gold(spark.table(silver_table))
    sink_table_overwrite(gold["dim_element"], f"{cfg.gold_db}.dim_element")
    sink_table_overwrite(gold["dim_date"], f"{cfg.gold_db}.dim_date")
    sink_partition_overwrite(
        gold["fact_climate"],
        f"{cfg.gold_db}.fact_climate",
        ("year", "month", "day"),
    )
    manifest["silver_to_gold"] = "done"

    if cfg.gold_snapshot_path:
        from aws_lakehouse_spark.sources.snapshots import snapshot_write

        version = snapshot_write(
            spark, gold["fact_climate"], cfg.gold_snapshot_path, "overwrite"
        )
        manifest["gold_snapshot"] = {
            "path": cfg.gold_snapshot_path, "version": version,
        }

    # 5. Maintenance (M1-M4)
    tables = cfg.maintenance_tables or (silver_table,)
    manifest["maintenance"] = run_maintenance(spark, list(tables))
    return manifest
