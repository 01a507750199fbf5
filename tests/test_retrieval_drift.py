"""Behavioral tests for the retrieval + drift tier.

Oracle parity already runs via test_parity.py; these verify the
statistics against independent sequential references (the oracle SQL
shares formula structure with the Spark side, so an algorithmic bug
could pass parity — a second, structurally different reference
can't).
"""

from __future__ import annotations

import numpy as np
import pytest

from aws_lakehouse_spark.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_bm25_scores_positive_and_ranked(spark):
    pdf = REGISTRY["text_bm25_topk"].fn(spark, SF).toPandas()
    assert len(pdf) == 20
    assert (pdf["bm25"] > 0).all()
    # ranks are 1..20 and ordered by (score desc, doc_id)
    assert sorted(pdf["rnk"]) == list(range(1, 21))
    s = pdf.sort_values("rnk")
    assert (s["bm25"].diff().dropna() <= 1e-12).all()


def test_rrf_bounds_and_coverage(spark):
    pdf = REGISTRY["ann_hybrid_rrf"].fn(spark, SF).toPandas()
    assert len(pdf) == 20
    # RRF with k=60 and two retrievers is bounded by 2/(60+1)
    assert (pdf["rrf"] <= 2 / 61 + 1e-9).all()
    assert (pdf["rrf"] > 0).all()
    # the query vector itself (vec 0, rank 1 on the cosine side)
    # must appear in the fused top-20
    assert 0 in set(pdf["doc_id"])


def test_product_quantization_vs_numpy_reference(spark):
    """Independent full-precision check: PQ approximate distances
    must equal an end-to-end numpy recomputation, and the PQ top-20
    must share most of its membership with exact L2 top-20 (sanity
    that the approximation is usable, not just self-consistent)."""
    import pandas as pd

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.array([[float(x) for x in v] for v in emb["embedding"]])
    C = X[:16]  # codebook = vectors 0..15
    q = X[42]
    m, dsub, k = 8, 8, 16
    codes = np.zeros((len(X), m), dtype=int)
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub[:, None, :] - C[None, :, j * dsub:(j + 1) * dsub]) ** 2).sum(
            -1
        )
        codes[:, j] = np.argmin(np.round(d2, 6), axis=1)
    qd = np.array(
        [
            [
                ((q[j * dsub:(j + 1) * dsub] - C[c, j * dsub:(j + 1) * dsub]) ** 2).sum()
                for c in range(k)
            ]
            for j in range(m)
        ]
    )
    approx = np.round(qd[np.arange(m)[None, :], codes].sum(axis=1), 6)
    order = np.lexsort((emb["vec_id"].values, approx))
    expect = pd.DataFrame(
        {
            "vec_id": emb["vec_id"].values[order[:20]],
            "approx_d2": approx[order[:20]],
        }
    )

    got = (
        REGISTRY["ann_product_quantization"].fn(spark, SF)
        .toPandas()
        .sort_values("rnk")
    )
    assert list(got["vec_id"]) == list(expect["vec_id"])
    np.testing.assert_allclose(
        got["approx_d2"].values, expect["approx_d2"].values, atol=1e-6
    )

    # approximation quality: PQ top-20 overlaps exact-L2 top-20
    exact = ((X - q) ** 2).sum(axis=1)
    exact_top = set(emb["vec_id"].values[np.argsort(exact)[:20]])
    assert len(exact_top & set(got["vec_id"])) >= 5


def test_cusum_matches_sequential_recursion(spark):
    """The closed-form prefix-minus-running-min rewrite must equal
    the textbook recursion S_t = max(0, S_(t-1) + x_t - mu - k)."""
    got = (
        REGISTRY["events_cusum_changepoint"].fn(spark, SF)
        .toPandas()
        .sort_values(["event_type", "hr"])
    )
    for etype, g in got.groupby("event_type"):
        x = g["n_events"].values.astype(float)
        mu = x.mean()
        s, expect = 0.0, []
        for v in x:
            s = max(0.0, s + v - mu - 1.0)
            expect.append(s)
        np.testing.assert_allclose(
            g["cusum"].values, np.round(expect, 6), atol=1e-6
        )
        assert ((g["cusum"] > 5.0).astype(int) == g["breach"]).all()


def test_ks_matches_bruteforce(spark):
    import duckdb

    got = REGISTRY["quality_ks_drift"].fn(spark, SF).toPandas()
    orders = duckdb.sql(
        f"SELECT o_totalprice, o_orderstatus FROM "
        f"read_parquet('{SF}/orders.parquet') "
        f"WHERE o_orderstatus IN ('F','O')"
    ).df()
    a = np.sort(orders[orders.o_orderstatus == "F"].o_totalprice.values)
    b = np.sort(orders[orders.o_orderstatus == "O"].o_totalprice.values)
    pts = np.concatenate([a, b])
    ks = max(
        abs(
            np.searchsorted(a, v, side="right") / len(a)
            - np.searchsorted(b, v, side="right") / len(b)
        )
        for v in pts
    )
    assert got["n1"].iloc[0] == len(a)
    assert got["n2"].iloc[0] == len(b)
    assert abs(got["ks_stat"].iloc[0] - round(ks, 6)) < 1e-6


def test_psi_terms_sum_to_headline(spark):
    pdf = REGISTRY["quality_psi_drift"].fn(spark, SF).toPandas()
    assert len(pdf) == 10
    # smoothed probabilities each sum to ~1
    assert abs(pdf["p_ref"].sum() - 1.0) < 1e-3
    assert abs(pdf["p_cur"].sum() - 1.0) < 1e-3
    # PSI is a sum of non-negative terms (each (p-q)ln(p/q) >= 0)
    assert (pdf["psi_term"] >= -1e-9).all()


def test_cusum_closed_form_identity_random_series():
    """Property: prefix - min(0, running-min(prefix)) equals the
    recursion S_t = max(0, S_(t-1) + d_t) for arbitrary drifts —
    the identity the Spark plan relies on (no Spark needed)."""
    rng = np.random.RandomState(7)
    for _ in range(200):
        d = rng.randn(rng.randint(1, 60)) * rng.uniform(0.1, 10)
        prefix = np.cumsum(d)
        runmin = np.minimum.accumulate(prefix)
        closed = prefix - np.minimum(runmin, 0.0)
        s, rec = 0.0, []
        for v in d:
            s = max(0.0, s + v)
            rec.append(s)
        np.testing.assert_allclose(closed, rec, atol=1e-9)


def test_geo_plan_has_no_cartesian_and_broadcasts_cells(spark):
    df = REGISTRY["geo_haversine_neighbor_join"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_rag_plan_shape(spark):
    """RAG pipeline: no cartesian product; the only guaranteed
    exchange is aggregate-sided (bucket/id keyed)."""
    df = REGISTRY["rag_index_pipeline"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_pushes_term_filter_below_aggregation(spark):
    """The query-term filter must run scan-side (before any
    exchange), so only matching (doc, term) pairs shuffle. Asserted
    on the shared TF fragment (bm25_tf_frame) — the registry queries
    pin its result, which hides this subtree behind a checkpoint in
    their final plans."""
    import re

    from aws_lakehouse_spark.catalog import load_table
    from aws_lakehouse_spark.plans.retrieval import bm25_tf_frame

    df = bm25_tf_frame(load_table(spark, SF, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # every term-IN filter must sit DIRECTLY above its Generate explode
    # (i.e. applied to the exploded rows before any Exchange)
    filt_idx = [
        i for i, ln in enumerate(lines)
        if re.search(r"Filter term#\d+ IN", ln) or "INSET" in ln and "term#" in ln
    ]
    assert filt_idx, plan
    for i in filt_idx:
        below = "\n".join(lines[i + 1 : i + 3])
        assert "Generate explode" in below, plan


def test_ivf_pq_consistent_with_full_pq_scan(spark):
    """ann_ivf_pq must assign every returned candidate the SAME
    ADC distance the full-corpus PQ scan computes (same codebook,
    same query), and its ranking must be the full scan's ranking
    restricted to the probed cells' candidates — IVF routing only
    drops candidates, never rescores them."""
    ivf = {
        r["vec_id"]: r["approx_d2"]
        for r in REGISTRY["ann_ivf_pq"].fn(spark, SF).collect()
    }
    assert len(ivf) == 10
    full = {
        r["vec_id"]: r["approx_d2"]
        for r in REGISTRY["ann_product_quantization"].fn(spark, SF).collect()
    }
    shared = set(ivf) & set(full)
    assert shared, "expected overlap between IVF-PQ and full PQ top-k"
    for vid in shared:
        assert ivf[vid] == full[vid], (vid, ivf[vid], full[vid])


def test_ivf_pq_candidates_come_from_probed_cells(spark):
    """Every returned neighbor's coarse cell must be one of the
    query's nprobe nearest cells (recomputed independently with
    numpy from the same deterministic centroids)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    vecs = {
        int(r.vec_id): np.array([float(x) for x in r.embedding])
        for r in emb.itertuples()
    }
    cents = {c: vecs[15 + c] for c in (1, 2, 3, 4)}

    def cos(a, b):
        return round(
            float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b)), 6
        )

    q = vecs[42]
    probe = sorted(cents, key=lambda c: (-cos(q, cents[c]), c))[:2]

    def cell(v):
        return min(cents, key=lambda c: (-cos(v, cents[c]), c))

    out = REGISTRY["ann_ivf_pq"].fn(spark, SF).collect()
    for r in out:
        assert cell(vecs[int(r["vec_id"])]) in probe, r
