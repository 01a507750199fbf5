"""Oracle-parity tests: the driver's correctness gate, replicated.

One test per registered query: run the Spark builder and the DuckDB
oracle over the same sf0.001 parquet and compare row count, columns,
and order-insensitive values (float tolerance 1e-9). Mirrors what
the driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import duckdb
import pytest

from aws_lakehouse_spark.catalog import TABLES
from aws_lakehouse_spark.registry import load_all
from tools.check_parity import compare

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only contract: must run and return a well-formed frame
        assert spark_pdf.shape[1] > 0
        return
    duck_pdf = duck.sql(spec.oracle).df()
    problems = compare(name, spark_pdf, duck_pdf)
    hard = [
        p
        for p in problems
        if "values-match" not in p and "NOT bitwise" not in p
    ]
    assert not hard, f"{name}: {hard}"
