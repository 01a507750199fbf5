"""Similarity-search query surface (LLM training-data ops).

The dot products on both sides are sequential left-to-right double
accumulation over the same float32→float64-widened values, and the
similarity is rounded to 6 digits *before* ranking on both sides, so
even the ranked output hash-matches. Even the LSH-bucketed ANN
variant is fully oracle-checked: its hyperplanes are md5-seeded, so
the oracle replicates the exact buckets with the plane weights
embedded as SQL literals (see ``_lsh_oracle``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.llm.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
)
from aws_lakehouse_spark.registry import register

# DuckDB's native vectorized dot — bitwise-identical to the
# interpreted list_transform/list_sum fold (verified element-order
# summation over the sf1 corpus, 0 differing rows) and ~3000x faster
# at sf1: the lambda shape re-materialized the 64-element weight
# literal per row (89.6 s for the 6-plane bucket pass vs 0.03 s
# native — the r9 sf1 sweep's entire ann_* oracle wall)
DUCK_DOT = "list_dot_product({a}, {b})"


def _cos(a: str, b: str) -> str:
    return (
        f"{DUCK_DOT.format(a=a, b=b)} / "
        f"(sqrt({DUCK_DOT.format(a=a, b=a)}) * "
        f"sqrt({DUCK_DOT.format(a=b, b=b)}))"
    )


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_cos('q.v', 'c.v')}, 6) AS cosine_sim
        FROM c, q WHERE q.vec_id != c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
    category="llm similarity",
    doc="Exact brute-force cosine top-5 for 10 query vectors over "
    "the full corpus: query side broadcast, corpus scanned once, "
    "per-query window top-k.",
    bench=True,
)
def ann_bruteforce_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5, round_digits=6)


@register(
    "ann_embedding_neardup",
    oracle=f"""
    WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id % 10 = 0)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_cos('a.v', 'b.v')}, 6) AS cosine_sim
    FROM s a, s b
    WHERE a.vec_id < b.vec_id
      AND ROUND({_cos('a.v', 'b.v')}, 6) > 0.3
    """,
    category="llm similarity",
    doc="Embedding-cosine near-duplicate pairs over a demo subset; "
    "threshold 0.3 sits inside the synthetic corpus's similarity "
    "range (random 64-dim cosines top out ~0.41 at sf0.01), so the "
    "correctness check exercises real matches instead of passing "
    "vacuously on 0 rows. At scale candidates come from the LSH "
    "buckets instead of the subset cross join.",
)
def ann_embedding_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.operators.joins import widen_if_underparallel

    # per-pair cosine over a broadcast side runs inside the scan
    # tasks; a one-split embeddings file serializes it (r9 core-count
    # probe: ~25 s at sf1 regardless of cores)
    emb = widen_if_underparallel(
        load_table(spark, sf_dir, "embeddings")
    ).filter(F.col("vec_id") % 10 == 0)
    from aws_lakehouse_spark.llm.similarity import (
        cosine_ratio_col,
        dot_col,
        norm_col,
    )

    # per-side norms hoisted out of the per-pair cosine (same bits —
    # sqrt(dot(v,v)) is computed once per row instead of per pair)
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").cast("array<double>").alias("va"),
    ).withColumn("__na", norm_col("va"))
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").cast("array<double>").alias("vb"),
    ).withColumn("__nb", norm_col("vb"))
    sim = F.round(
        cosine_ratio_col(
            dot_col("va", "vb"),
            F.col("__na"),
            F.col("__nb"),
        ),
        6,
    )
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") > 0.3)
        .select("vec_a", "vec_b", "cosine_sim")
    )


@register(
    "ann_lsh_bucketed",
    oracle=None,  # replaced with the full deterministic oracle below
    category="llm similarity",
    doc="ANN top-k via deterministic random-hyperplane LSH buckets "
    "(6 bits): the probe equi-joins on the bucket id, touching "
    "~1/64 of the corpus — the 100 TB scale path.",
)
def ann_lsh_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_bucket_topk(emb, queries, dim=64, bits=6, k=5)


@register(
    "ann_ivf_topk",
    oracle=None,  # approximate recall → rows-only check
    category="llm similarity",
    doc="ANN top-k via IVF inverted lists: deterministic seed "
    "centroids + one Lloyd refinement (all DataFrame ops), corpus "
    "assigned to its max-cosine list once at build, queries probe "
    "their 4 nearest of 16 lists via an int equi-join — candidate "
    "work ~nprobe/n_centroids of the corpus; recall measured "
    "against brute force in pytest.",
)
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(
        emb, queries, n_centroids=16, nprobe=4, k=5, refine_iterations=1
    )


def _lsh_weight(seed: str, b: int, d: int) -> float:
    """The engine's own weight derivation — one source of truth, so
    the embedded literal is the bit-identical double Spark uses."""
    from aws_lakehouse_spark.llm.similarity import hyperplane_weight

    return hyperplane_weight(seed, b, d)


def _lsh_oracle(dim: int = 64, bits: int = 6, k: int = 5) -> str:
    def bucket_expr(v: str) -> str:
        terms = []
        for b in range(bits):
            w = "[" + ", ".join(
                repr(_lsh_weight("lsh", b, d)) for d in range(dim)
            ) + "]"
            dot = f"list_dot_product({v}, {w}::DOUBLE[])"
            terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
        return " + ".join(terms)

    return f"""
    WITH c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
               {bucket_expr('(embedding::DOUBLE[])')} AS bucket
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
               {bucket_expr('(embedding::DOUBLE[])')} AS bucket
        FROM embeddings WHERE vec_id < 10
    ), scored AS (
        SELECT q.query_id, c.neighbor_id,
               ROUND({_cos('q.qv', 'c.cv')}, 6) AS cosine_sim
        FROM c JOIN q USING (bucket)
        WHERE q.query_id != c.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rnk
        FROM scored
    ) WHERE rnk <= {k}
    """


# Upgrade ann_lsh_bucketed from rows-only to a full oracle: the
# hyperplanes are md5-seeded (deterministic across engines), so the
# buckets — and therefore the exact candidate sets — are replicable
# in SQL with the plane weights embedded as literals.
import dataclasses as _dc  # noqa: E402

from aws_lakehouse_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["ann_lsh_bucketed"] = _dc.replace(
    _REG["ann_lsh_bucketed"], oracle=_lsh_oracle(), bench=True
)


def _ivf_oracle(
    dim: int = 64, n_centroids: int = 16, nprobe: int = 4, k: int = 5
) -> str:
    """DuckDB replica of ivf_topk (1 Lloyd refinement): seeds by
    md5-order, argmin assignment (sim rounded to 6dp), per-dim means
    rounded to 9dp, probe + score. Mirrors the Spark ops' rounding
    exactly, so even the iterative index build hash-matches."""
    rng = f"range(1, {dim + 1})"

    def cos(a: str, b: str) -> str:
        d = f"list_dot_product({a}, {b})"
        na = f"sqrt(list_dot_product({a}, {a}))"
        nb = f"sqrt(list_dot_product({b}, {b}))"
        return f"{d} / ({na} * {nb})"

    return f"""
    WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), seeds AS (
        SELECT CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR))) AS INTEGER)
                 AS centroid_id,
               v AS cent
        FROM (SELECT * FROM c
              ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_centroids})
    ), assign0 AS (
        SELECT vec_id, centroid_id FROM (
            SELECT c.vec_id, s.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY ROUND({cos('c.v', 's.cent')}, 6) DESC,
                                s.centroid_id) AS rn
            FROM c, seeds s
        ) WHERE rn = 1
    ), refined AS (
        SELECT centroid_id, list(avgv ORDER BY i) AS cent FROM (
            SELECT a.centroid_id, t.i, ROUND(AVG(c.v[t.i]), 9) AS avgv
            FROM assign0 a
            JOIN c ON c.vec_id = a.vec_id, {rng} AS t(i)
            GROUP BY a.centroid_id, t.i
        ) GROUP BY centroid_id
    ), lists AS (
        SELECT vec_id AS neighbor_id, centroid_id FROM (
            SELECT c.vec_id, r.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY ROUND({cos('c.v', 'r.cent')}, 6) DESC,
                                r.centroid_id) AS rn
            FROM c, refined r
        ) WHERE rn = 1
    ), probes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.vec_id AS query_id, r.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND({cos('q.v', 'r.cent')}, 6) DESC,
                                r.centroid_id) AS rn
            FROM (SELECT * FROM c WHERE vec_id < 10) q, refined r
        ) WHERE rn <= {nprobe}
    ), scored AS (
        SELECT p.query_id, l.neighbor_id,
               ROUND({cos('q.v', 'cv.v')}, 6) AS cosine_sim
        FROM probes p
        JOIN lists l ON l.centroid_id = p.centroid_id
        JOIN c q ON q.vec_id = p.query_id
        JOIN c cv ON cv.vec_id = l.neighbor_id
        WHERE p.query_id != l.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rnk
        FROM scored
    ) WHERE rnk <= {k}
    """


_REG["ann_ivf_topk"] = _dc.replace(_REG["ann_ivf_topk"], oracle=_ivf_oracle())


def _lsh_multiprobe_oracle(dim: int = 64, bits: int = 6, k: int = 5) -> str:
    def bucket_expr(v: str) -> str:
        terms = []
        for b in range(bits):
            w = "[" + ", ".join(
                repr(_lsh_weight("lsh", b, d)) for d in range(dim)
            ) + "]"
            dot = f"list_dot_product({v}, {w}::DOUBLE[])"
            terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
        return " + ".join(terms)

    probe_cond = " OR ".join(
        ["c.bucket = q.home"]
        + [f"c.bucket = xor(q.home, {1 << b})" for b in range(bits)]
    )
    return f"""
    WITH c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
               {bucket_expr('(embedding::DOUBLE[])')} AS bucket
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
               {bucket_expr('(embedding::DOUBLE[])')} AS home
        FROM embeddings WHERE vec_id < 10
    ), scored AS (
        SELECT DISTINCT q.query_id, c.neighbor_id,
               ROUND({_cos('q.qv', 'c.cv')}, 6) AS cosine_sim
        FROM c JOIN q ON ({probe_cond})
        WHERE q.query_id != c.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rnk
        FROM scored
    ) WHERE rnk <= {k}
    """


@register(
    "ann_lsh_multiprobe",
    oracle=_lsh_multiprobe_oracle(),
    category="llm similarity",
    doc="Multi-probe LSH ANN: each query probes its home bucket plus "
    "the 6 single-bit-flip neighbors — ~7/64 of the corpus for "
    "substantially higher recall; the probe fan-out rides the query "
    "side only, the corpus index is untouched. Fully oracle-checked "
    "(deterministic md5 hyperplanes).",
)
def ann_lsh_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.similarity import lsh_bucket_topk_multiprobe

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_bucket_topk_multiprobe(emb, queries, dim=64, bits=6, k=5)


@register(
    "ann_quantize_int8",
    oracle="""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), mm AS (
        SELECT vec_id, e,
               list_min(e) AS mn, list_max(e) AS mx,
               (list_max(e) - list_min(e)) / 255.0 AS scale
        FROM v
    )
    SELECT vec_id,
           ROUND(mn, 6) AS q_min,
           ROUND(mx, 6) AS q_max,
           ROUND(list_max(list_transform(e,
                x -> abs(x - (mn + (CASE WHEN scale > 0
                     THEN round((x - mn) / scale) ELSE 0 END) * scale)))),
                6) AS max_abs_err
    FROM mm
    """,
    category="llm similarity",
    doc="Scalar int8 quantization of the embedding column: "
    "per-vector min/max affine scale over 255 levels plus max "
    "absolute reconstruction error — the 4x memory cut that lets an "
    "ANN candidate set stay executor-resident at corpus scale. "
    "Max-abs (not RMS) error keeps the check order-independent, so "
    "the doubles are bit-identical across engines. One scan, pure "
    "array expressions, no shuffle.",
)
def ann_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.similarity import quantize_int8_cols
    from aws_lakehouse_spark.operators.joins import widen_if_underparallel

    # the per-row quantization folds are CPU-heavy; one-split inputs
    # serialize them (r9 core-count probe)
    emb = widen_if_underparallel(load_table(spark, sf_dir, "embeddings"))
    cols = quantize_int8_cols(F.col("embedding").cast("array<double>"))
    return emb.select(
        "vec_id",
        cols["q_min"].alias("q_min"),
        cols["q_max"].alias("q_max"),
        cols["max_abs_err"].alias("max_abs_err"),
    )


def _cos_dim(a: str, b: str, dim: int) -> str:
    dot = "list_dot_product({a}, {b})"
    return (
        f"{dot.format(a=a, b=b)} / "
        f"(sqrt({dot.format(a=a, b=a)}) * "
        f"sqrt({dot.format(a=b, b=b)}))"
    )


@register(
    "embed_matryoshka_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v
               FROM embeddings),
         q AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v
               FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_cos_dim('q.v', 'c.v', 16)}, 6) AS cosine_sim
        FROM c, q WHERE q.vec_id != c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
    category="llm similarity",
    doc="Matryoshka (MRL) truncated-dimension retrieval: cosine "
    "top-5 using only the FIRST 16 of 64 embedding dimensions — the "
    "memory/accuracy dial an MRL-trained embedding model exposes "
    "(prefix dims carry the coarse signal, so a 4x-smaller index "
    "answers the same query; re-rank survivors at full width when "
    "precision matters). Cosine renormalizes over the slice, so no "
    "separate renormalization pass is needed. Same scale shape as "
    "brute-force: query side broadcast, corpus scanned once — but "
    "the scanned vector bytes drop 4x, which at 100 TB is the "
    "difference between an in-memory and a spilling candidate scan.",
)
def embed_matryoshka_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sliced = emb.select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 16).alias(
            "embedding"
        ),
    )
    queries = sliced.filter(F.col("vec_id") < 10)
    return brute_force_topk(sliced, queries, k=5, round_digits=6)


@register(
    "ann_range_search",
    oracle=f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_cos('q.v', 'c.v')}, 6) AS cosine_sim
        FROM c, q WHERE q.vec_id != c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim
    FROM scored WHERE cosine_sim >= 0.2
    """,
    category="llm similarity",
    doc="RANGE search (radius query): ALL corpus neighbors within "
    "cosine >= 0.2 of each of 10 query vectors — the "
    "fixed-similarity-floor complement to top-k (near-dup sweeps "
    "and contamination checks want 'everything this close', not "
    "'the k closest'). The 0.2 floor sits inside the synthetic "
    "corpus's similarity range so matches are non-vacuous. Scale: "
    "query side broadcast, corpus scanned once, selection is a "
    "pure filter — no window, no sort; the LSH-bucketed variant "
    "replaces the scan when the query set grows.",
)
def ann_range_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    from aws_lakehouse_spark.llm.similarity import (
        cosine_ratio_col,
        dot_col,
        norm_col,
    )

    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cv")
    ).withColumn("__cn", norm_col("cv"))
    queries = (
        emb.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .withColumn("__qn", norm_col("qv"))
    )
    sim = F.round(
        cosine_ratio_col(
            dot_col("qv", "cv"),
            F.col("__qn"),
            F.col("__cn"),
        ),
        6,
    )
    return (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= 0.2)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cosine_sim",
        )
    )


def _recall_oracle(k: int = 5) -> str:
    """Exact-vs-LSH recall report: the exact CTE repeats the
    brute-force oracle, the approx CTE wraps ``_lsh_oracle`` (same
    literal hyperplanes), so the candidate sets — and the recall —
    are bit-identical across engines."""
    exact = f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
             q AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings WHERE vec_id < 10),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({_cos('q.v', 'c.v')}, 6) AS cosine_sim
            FROM c, q WHERE q.vec_id != c.vec_id
        )
        SELECT query_id, neighbor_id
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS rnk
            FROM scored
        ) WHERE rnk <= {k}
    """
    return f"""
    WITH exact AS (SELECT * FROM ({exact})),
         approx AS (
             SELECT query_id, neighbor_id FROM ({_lsh_oracle(k=k)})
         ),
         n_app AS (
             SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_approx
             FROM approx GROUP BY query_id
         ),
         hits AS (
             SELECT e.query_id,
                    CAST(COUNT(*) AS BIGINT) AS n_exact,
                    CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits
             FROM exact e
             LEFT JOIN approx a
               ON a.query_id = e.query_id
              AND a.neighbor_id = e.neighbor_id
             GROUP BY e.query_id
         )
    SELECT h.query_id, h.n_exact,
           COALESCE(n_app.n_approx, 0) AS n_approx,
           h.n_hits,
           ROUND(h.n_hits / CAST(h.n_exact AS DOUBLE), 2) AS recall_at_k
    FROM hits h LEFT JOIN n_app USING (query_id)
    ORDER BY h.query_id
    """


@register(
    "ann_recall_eval",
    oracle=_recall_oracle(),
    category="llm similarity (evaluation)",
    doc="Recall@5 of the LSH-bucketed ANN path against exact brute "
    "force, per query — the evaluation harness every approximate "
    "index deployment runs before trusting its candidates (the "
    "similarity-side analogue of dedup_lsh_quality). Both arms "
    "reuse the engine's own kernels (brute_force_topk / "
    "lsh_bucket_topk with the md5-seeded hyperplanes), so the "
    "report measures the REAL production index, not a re-"
    "implementation. Plan: both arms broadcast the 10-vector query "
    "set; the exact arm scans the corpus once, the approx arm "
    "touches ~1/64 of it via the bucket equi-join; everything "
    "after is top-k-sized (a join of two <=50-row frames). At "
    "scale the exact arm runs on a fixed query SAMPLE (as here), "
    "so the full-corpus scan it costs is one scan regardless of "
    "query volume. On this corpus the report correctly exposes "
    "single-probe 6-bit LSH as low-recall (random 64-dim "
    "embeddings have near-uniform cosines) — the measurement that "
    "justifies the multiprobe and IVF variants.",
)
def ann_recall_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5, round_digits=6).select(
        "query_id", "neighbor_id"
    )
    # two consumers (per-query counts, the hit join) — pin the tiny
    # (queries x k) result so the whole LSH pass runs once
    approx = (
        lsh_bucket_topk(emb, queries, dim=64, bits=6, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    n_app = approx.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_approx")
    )
    hits = (
        exact.join(
            approx.withColumn("__hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("__hit").cast("bigint").alias("n_hits"),
        )
    )
    return (
        hits.join(n_app, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_approx", F.lit(0).cast("bigint")).alias(
                "n_approx"
            ),
            "n_hits",
            F.round(
                F.col("n_hits") / F.col("n_exact").cast("double"), 2
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )
