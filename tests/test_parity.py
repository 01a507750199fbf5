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
    # no registered query may emit a DecimalType column: Spark's
    # decimal arithmetic (e.g. BIGINT / a 100.0 literal parsed as
    # DECIMAL(4,1)) produces scale-padded values that are numerically
    # equal to the oracle's doubles but fail the driver's exact
    # representation hash — the class that kept sql_pipe_syntax red
    # for three rounds. CAST to DOUBLE at the source.
    from pyspark.sql.types import DecimalType

    dec_cols = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]
    assert not dec_cols, (
        f"{name}: DecimalType output column(s) {dec_cols} — "
        "driver hash would fail; CAST to DOUBLE"
    )
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
