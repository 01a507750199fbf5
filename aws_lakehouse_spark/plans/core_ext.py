"""Scale-path extension queries: skew-salted aggregation and the
numpy-vectorized similarity search."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.operators.skew import salted_group_agg
from aws_lakehouse_spark.registry import register


@register(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_l_quantity,
           MIN(l_extendedprice) AS min_l_extendedprice,
           MAX(l_extendedprice) AS max_l_extendedprice,
           ROUND(AVG(l_quantity), 4) AS avg_l_quantity
    FROM lineitem GROUP BY l_returnflag
    """,
    category="2.4 aggregates (skew path)",
    doc="Salted two-stage aggregation over a 3-distinct-key column "
    "(maximum skew shape): hot keys spread across 16 salt buckets in "
    "the partial stage, exact results re-combined by true key — "
    "oracle-checked equal to the direct GROUP BY.",
)
def agg_salted_skew_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_group_agg(
        li,
        ["l_returnflag"],
        sum_cols=["l_quantity"],
        min_cols=["l_extendedprice"],
        max_cols=["l_extendedprice"],
        avg_of=["l_quantity"],
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
        "min_l_extendedprice",
        "max_l_extendedprice",
        F.round("avg_l_quantity", 4).alias("avg_l_quantity"),
    )


@register(
    "ann_bruteforce_vectorized",
    oracle=None,  # BLAS pairwise summation → tolerance-equal only
    category="llm similarity",
    doc="Numpy-vectorized exact cosine top-k via mapInPandas: each "
    "Arrow batch scored against all queries in one BLAS matmul, "
    "per-batch top-k cut, window merge. Equals ann_bruteforce_topk "
    "within float tolerance (asserted in tests/test_llm.py).",
    bench=True,
)
def ann_bruteforce_vectorized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.similarity import brute_force_topk_vectorized

    emb = load_table(spark, sf_dir, "embeddings")
    queries_pdf = emb.filter(F.col("vec_id") < 10).toPandas()
    return brute_force_topk_vectorized(emb, queries_pdf, k=5)
