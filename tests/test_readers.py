"""Reader-operator tests (SURVEY §2.1 S1-S2 + csv/json extensions)."""

from __future__ import annotations

import pyspark.sql.functions as F

from aws_lakehouse_spark.sources import (
    scan_csv,
    scan_json,
    scan_parquet,
    scan_text,
)


def test_scan_parquet_partition_discovery_and_pruning(spark, tmp_path):
    src = str(tmp_path / "tree")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("year"),
    )
    df.write.partitionBy("year").parquet(src)

    out = scan_parquet(spark, src)
    assert "year" in out.columns  # discovered as a real partition col

    pruned = out.filter(F.col("year") == 2)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    # the filter must prune at the file index, not post-scan
    assert "PartitionFilters: [isnotnull(year" in plan
    assert pruned.count() == 25


def test_scan_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("k,v\n1,a\n2,b\n")
    out = scan_csv(spark, str(p), schema="k INT, v STRING")
    assert out.schema.simpleString() == "struct<k:int,v:string>"
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [
        (1, "a"), (2, "b")
    ]


def test_scan_json_lines(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    out = scan_json(spark, str(p), schema="k BIGINT, v STRING")
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [
        (1, "a"), (2, "b")
    ]


def test_scan_text_single_value_column(spark, tmp_path):
    p = tmp_path / "fixed.txt"
    p.write_text("US  United States\nFR  France\n")
    out = scan_text(spark, str(p))
    assert out.columns == ["value"]
    assert out.count() == 2


def test_csv_json_write_read_roundtrip(spark, tmp_path):
    from aws_lakehouse_spark.sources import sink_csv_path, sink_json_path

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k INT, v STRING, x DOUBLE"
    )
    cpath, jpath = str(tmp_path / "c"), str(tmp_path / "j")
    sink_csv_path(df, cpath)
    sink_json_path(df, jpath)
    back_c = scan_csv(spark, cpath, schema="k INT, v STRING, x DOUBLE")
    back_j = scan_json(spark, jpath, schema="k INT, v STRING, x DOUBLE")
    rows = sorted((r["k"], r["v"], r["x"]) for r in df.collect())
    assert sorted((r["k"], r["v"], r["x"]) for r in back_c.collect()) == rows
    assert sorted((r["k"], r["v"], r["x"]) for r in back_j.collect()) == rows
