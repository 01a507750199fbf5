"""Real table-format delegation (Delta Lake) for the snapshot API.

The reference's ACID layer is actual Iceberg on Glue
(``glue-jobs/noaa_ghcn_bronze_to_silver.py:108-143`` writes Iceberg
tables; ``glue-jobs/iceberg_maintenance.py:47-81`` runs its
procedures). In this sandbox no Delta/Iceberg jars are obtainable
(probe documented in ``sources/snapshots.py``), so the engine's
manifest log implements the same semantic surface from first
principles. On a real cluster the jars usually ARE present — a user
switching from the reference would expect ``snapshot_write`` /
``read_snapshot`` / ``merge_into`` / ``rewrite_data_files`` to land
on the genuine format. This module makes that happen (r7 verdict
item 4):

- :func:`delta_runtime_available` probes the LIVE session once — the
  ``delta-spark`` Python bindings must import, the ``DeltaCatalog``
  class must resolve on the JVM classpath, and the session must have
  been built with the Delta SQL extension (a jar on the classpath
  without the extension cannot parse Delta DML);
- :func:`backend_for` picks per TABLE: an existing table keeps the
  backend it was created with (``_delta_log`` → delta, the manifest
  log dir → manifest); a brand-new table uses Delta when the runtime
  is usable unless ``SPARK_GRAFT_TABLE_FORMAT=manifest`` pins the
  offline implementation. In-sandbox the probe is always False, so
  behavior is unchanged by construction;
- the delegated surface is the CORE one (plain append/overwrite,
  versioned reads, update-all/insert-all/delete MERGE, bin-pack
  OPTIMIZE). The manifest log's extensions (WAP staging, branches,
  segments, stats/bloom manifest pruning) stay on the manifest
  backend — a delegated call passing those raises ``ValueError``
  rather than silently dropping semantics.

Equivalence is asserted where it matters: ``tests/test_snapshots.py::
test_delta_delegation_matches_manifest_backend`` runs the same
lifecycle through both backends and compares query results — marked
skip when the jars are absent, exactly the "passes when jars exist,
no behavior change in-sandbox" contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DELTA_LOG_DIR = "_delta_log"

# session id -> probe result (the probe costs a JVM class lookup and
# a Python import; both are stable for a session's lifetime)
_RUNTIME_CACHE: dict[int, bool] = {}


def delta_runtime_available(spark: SparkSession) -> bool:
    """True only when Delta is genuinely USABLE in this session."""
    key = id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(
        spark
    )
    if key in _RUNTIME_CACHE:
        return _RUNTIME_CACHE[key]
    ok = False
    try:
        import delta.tables  # noqa: F401  (delta-spark bindings)

        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        )
        exts = spark.conf.get("spark.sql.extensions", "") or ""
        ok = "DeltaSparkSessionExtension" in exts
    except Exception:
        ok = False
    _RUNTIME_CACHE[key] = ok
    return ok


def backend_for(spark: SparkSession, table_path: str) -> str:
    """'delta' or 'manifest' for ``table_path`` in this session.

    Existing tables keep their birth format. New tables prefer the
    real format when the runtime can actually serve it; the
    ``SPARK_GRAFT_TABLE_FORMAT=manifest`` env var pins the offline
    implementation (useful for comparing backends on one cluster).
    """
    if os.path.isdir(os.path.join(table_path, DELTA_LOG_DIR)):
        if not delta_runtime_available(spark):
            raise RuntimeError(
                f"{table_path!r} is a Delta table but this session has "
                "no usable Delta runtime (jar + SQL extension); rebuild "
                "the session with delta-spark configured"
            )
        return "delta"
    from aws_lakehouse_spark.sources.snapshots import _log_path

    if os.path.isdir(_log_path(table_path)):
        return "manifest"
    if os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "").lower() == "manifest":
        return "manifest"
    return "delta" if delta_runtime_available(spark) else "manifest"


def _delta_table(spark: SparkSession, table_path: str):
    from delta.tables import DeltaTable

    return DeltaTable.forPath(spark, table_path)


def delta_latest_version(spark: SparkSession, table_path: str) -> int:
    h = _delta_table(spark, table_path).history(1).collect()
    return int(h[0]["version"])


def delta_write(
    spark: SparkSession, df: DataFrame, table_path: str, mode: str
) -> int:
    """Plain append/overwrite through the Delta writer; returns the
    committed Delta version (the same contract as the manifest
    ``snapshot_write``)."""
    df.write.format("delta").mode(mode).save(table_path)
    return delta_latest_version(spark, table_path)


def delta_read(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", version)
    return reader.load(table_path)


def delta_merge(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    on: list[str],
    when_matched_delete=None,
    when_not_matched_insert: bool = True,
) -> dict:
    """The core MERGE surface on Delta: matched rows update-all (or
    delete when ``when_matched_delete`` holds), unmatched source rows
    insert-all. Custom per-column assignment expressions stay on the
    manifest backend (their ``__src_`` reference convention has no
    faithful Delta translation).

    Semantics alignment with the manifest backend (r9 advice): the
    match condition is PLAIN equality, not null-safe ``<=>`` — a NULL
    merge key matches nothing on either backend (ANSI MERGE
    semantics; the manifest join uses ``on=on`` equality), so the
    same call gives the same result per backend. Delete conditions on
    the Delta path use Delta's own ``t.``/``s.`` alias convention; a
    manifest-style ``__src_<col>`` reference is rejected loudly
    rather than silently failing to resolve."""
    if when_matched_delete is not None and "__src_" in str(
        when_matched_delete
    ):
        raise ValueError(
            "when_matched_delete references manifest-style __src_ "
            "columns; on a Delta-backed table write the condition "
            "with Delta's aliases (target 't.', source 's.')"
        )
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in on)
    builder = _delta_table(spark, table_path).alias("t").merge(
        source.alias("s"), cond
    )
    if when_matched_delete is not None:
        builder = builder.whenMatchedDelete(condition=when_matched_delete)
    builder = builder.whenMatchedUpdateAll()
    if when_not_matched_insert:
        builder = builder.whenNotMatchedInsertAll()
    builder.execute()
    return {
        "op": "merge_into",
        "version": delta_latest_version(spark, table_path),
        "backend": "delta",
    }


def delta_rewrite_data_files(spark: SparkSession, table_path: str) -> dict:
    """Delta OPTIMIZE bin-pack (the Iceberg rewrite_data_files
    equivalent); Delta chooses the output file count itself."""
    row = spark.sql(f"OPTIMIZE delta.`{table_path}`").collect()[0]
    metrics = row["metrics"].asDict() if "metrics" in row else {}
    return {
        "op": "rewrite_data_files",
        "applied": True,
        "files_before": int(metrics.get("numFilesRemoved", 0)),
        "files_after": int(metrics.get("numFilesAdded", 0)),
        "version": delta_latest_version(spark, table_path),
        "backend": "delta",
    }
