"""Distributed PCA (llm/pca.py) vs a sequential numpy reference:
covariance reduction exactness, eigh sign convention, and projection
parity on the real embeddings table."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from aws_lakehouse_spark.llm import pca

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from aws_lakehouse_spark.catalog import load_table

    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    return np.stack(pdf["embedding"].to_numpy()).astype(np.float64)


def test_covariance_matches_numpy(emb, emb_np):
    n, mean, cov = pca.covariance_matrix(emb, "embedding", 64)
    assert n == emb_np.shape[0]
    np.testing.assert_allclose(mean, emb_np.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(
        cov, np.cov(emb_np, rowvar=False, bias=True), atol=1e-9
    )


def test_projection_matches_numpy_pca(emb, emb_np):
    n, mean, cov = pca.covariance_matrix(emb, "embedding", 64)
    vals, comps = pca.principal_components(cov, k=3)
    assert vals[0] >= vals[1] >= vals[2] > 0
    # sign convention: largest-|coordinate| entry positive
    for row in comps:
        assert row[np.argmax(np.abs(row))] > 0

    got = (
        pca.project(emb, mean, comps, round_digits=None)
        .orderBy("vec_id")
        .select("pc1", "pc2", "pc3")
        .toPandas()
        .to_numpy()
    )
    want = (emb_np - emb_np.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_projection_variance_is_eigenvalue(emb, emb_np):
    # the defining PCA property: variance along component j == lambda_j
    _, mean, cov = pca.covariance_matrix(emb, "embedding", 64)
    vals, comps = pca.principal_components(cov, k=2)
    proj = pca.project(emb, mean, comps, round_digits=None)
    stats = proj.agg(
        F.var_pop("pc1").alias("v1"), F.var_pop("pc2").alias("v2")
    ).collect()[0]
    assert abs(stats["v1"] - vals[0]) < 1e-8 * max(1, vals[0])
    assert abs(stats["v2"] - vals[1]) < 1e-8 * max(1, vals[1])


def test_covariance_empty_input_raises(spark):
    empty = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pca.covariance_matrix(empty, "embedding", 64)
