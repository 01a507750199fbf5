"""Semantic-dedup and corpus-statistics query surface.

Extensions beyond the reference (SURVEY §2.14): embedding k-means
cluster assignment, SemDeDup cluster-then-drop near-dup removal
(Abbas et al., 2023), and rare-bigram quality scoring — the
corpus-frequency analog of the rare-word heuristics used in
training-data quality filters.

Oracle discipline: similarities are rounded to 6 digits *before*
any argmax/threshold on both sides (sequential left-to-right double
accumulation matches DuckDB's list_sum evaluation); ratio features
divide exact integers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.llm.semantic import (
    assign_clusters,
    clustered_vectors,
    semdedup_pairs,
    semdedup_summary,
)
from aws_lakehouse_spark.registry import register

K_CENTROIDS = 8
SEMDEDUP_T = 0.20
RARE_DF = 20  # bigram corpus-count below this = "rare"

_DOT = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"


def _cos(a: str, b: str) -> str:
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * "
        f"sqrt({_DOT.format(a=b, b=b)}))"
    )


_ASSIGN_CTE = f"""
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v FROM emb
             WHERE vec_id < {K_CENTROIDS}),
    scored AS (
        SELECT emb.vec_id, cent.cid,
               ROUND({_cos('emb.v', 'cent.v')}, 6) AS cosine_sim
        FROM emb, cent
    ),
    assign AS (
        SELECT vec_id, cid AS cluster_id, cosine_sim
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id
                ORDER BY cosine_sim DESC, cid) AS rn
            FROM scored
        ) WHERE rn = 1
    )
"""


@register(
    "embed_cluster_assign",
    oracle=f"""
    WITH {_ASSIGN_CTE}
    SELECT vec_id, cluster_id, cosine_sim FROM assign
    """,
    category="llm semantic",
    doc="K-means E-step over the embedding corpus: assign every "
    "vector to its max-cosine centroid (first K vectors as the "
    "deterministic seed set). Centroids broadcast; corpus scanned "
    "once, never shuffled on the vectors; similarity rounded before "
    "the argmax so the winner is engine-independent. The "
    "partitioner for all per-cluster semantic work.",
)
def embed_cluster_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.layout import widen_if_narrow

    # N*K cosine scoring is compute-bound; a sub-split-size parquet
    # input would run it on one core (no-op at real scale)
    emb = widen_if_narrow(load_table(spark, sf_dir, "embeddings"))
    centroids = emb.filter(F.col("vec_id") < K_CENTROIDS).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    return assign_clusters(emb, centroids)


@register(
    "embed_semdedup",
    oracle=f"""
    WITH {_ASSIGN_CTE},
    pairs AS (
        SELECT a.cluster_id, a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM assign a
        JOIN assign b
          ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        JOIN emb x ON x.vec_id = a.vec_id
        JOIN emb y ON y.vec_id = b.vec_id
        WHERE ROUND({_cos('x.v', 'y.v')}, 6) > {SEMDEDUP_T}
    )
    SELECT m.cluster_id, m.n_members,
           COALESCE(d.n_dropped, 0)::BIGINT AS n_dropped
    FROM (SELECT cluster_id, COUNT(*) AS n_members
          FROM assign GROUP BY cluster_id) m
    LEFT JOIN (SELECT cluster_id,
                      COUNT(DISTINCT vec_b) AS n_dropped
               FROM pairs GROUP BY cluster_id) d
      ON m.cluster_id = d.cluster_id
    """,
    category="llm semantic",
    doc="SemDeDup (arXiv:2303.09540): cluster the corpus, compare "
    "pairs ONLY within a cluster, drop every vector that has a "
    "lower-id in-cluster neighbor above the similarity threshold. "
    "The pair join is an equi-join on cluster_id — O(Σ|c|²) not "
    "O(N²); with centroids sampled ∝ N, cluster sizes and thus "
    "total work stay ~linear. Per-cluster member/dropped summary.",
    bench=True,
)
def embed_semdedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.layout import widen_if_narrow

    emb = widen_if_narrow(load_table(spark, sf_dir, "embeddings"))
    centroids = emb.filter(F.col("vec_id") < K_CENTROIDS).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    # ONE pinned frame for the whole pipeline (r12): the clustered
    # frame (assignment ⋈ vectors + per-row norm) feeds both pair
    # sides AND the member count, so a single checkpoint materializes
    # the corpus-vs-centroid scoring exactly once — at 100 TB that is
    # two whole corpus scans saved. The pre-r12 shape ALSO pinned the
    # bare assignment, paying a second checkpoint write of the same N
    # rows (plus its build-time stage execution) for no scan saved.
    assignment = assign_clusters(emb, centroids)
    clustered = clustered_vectors(emb, assignment)
    # K_CENTROIDS clusters << cores: salt the pair join so each
    # cluster's quadratic pair work spreads across the machine
    fanout = max(
        1, spark.sparkContext.defaultParallelism // K_CENTROIDS
    )
    pairs = semdedup_pairs(
        emb, assignment, SEMDEDUP_T, fanout=fanout, clustered=clustered
    )
    return semdedup_summary(clustered, pairs)


@register(
    "text_bigram_rarity",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, str_split(text, ' ') AS t FROM documents
    ), doc_bigrams AS (
        SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN
            list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
            ELSE [] END) AS bigram
        FROM toks
    ), freq AS (
        SELECT bigram, COUNT(*) AS corpus_n
        FROM doc_bigrams GROUP BY bigram
    )
    SELECT d.doc_id,
           COUNT(*) AS n_bigrams,
           SUM(CASE WHEN f.corpus_n < {RARE_DF} THEN 1 ELSE 0
               END)::BIGINT AS n_rare,
           ROUND(SUM(CASE WHEN f.corpus_n < {RARE_DF} THEN 1 ELSE 0
                 END)::DOUBLE / COUNT(*), 6) AS rare_ratio
    FROM doc_bigrams d JOIN freq f ON d.bigram = f.bigram
    GROUP BY d.doc_id
    """,
    category="llm text",
    doc="Rare-bigram quality score: corpus bigram frequencies "
    "(one count shuffle keyed by bigram), then each document's "
    "share of bigrams the corpus has seen < threshold times — the "
    "n-gram-frequency quality heuristic from training-data filter "
    "stacks. Frequency table joined back by bigram (broadcast-able: "
    "it is vocabulary-sized, not corpus-sized); ratio divides exact "
    "integers.",
)
def text_bigram_rarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.operators.joins import widen_if_underparallel

    # bigram derivation serializes on a one-split corpus (r9
    # core-count probe); no-op at production file counts
    docs = widen_if_underparallel(load_table(spark, sf_dir, "documents"))
    bigram_arr = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat_ws(' ', slice(split(text, ' '), i, 2))) "
        "ELSE array() END"
    )
    doc_bigrams = docs.select(
        "doc_id", F.explode(bigram_arr).alias("bigram")
    )
    freq = doc_bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("corpus_n")
    )
    rare_flag = F.when(F.col("corpus_n") < RARE_DF, 1).otherwise(0)
    return (
        doc_bigrams.join(F.broadcast(freq), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(rare_flag).cast("bigint").alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_rare",
            F.round(
                F.col("n_rare").cast("double") / F.col("n_bigrams"), 6
            ).alias("rare_ratio"),
        )
    )


OUTLIER_T = 0.07  # ~5% of sf0.01 vectors fall below (probed)


@register(
    "embed_outliers",
    oracle=f"""
    WITH {_ASSIGN_CTE}
    SELECT vec_id, cluster_id, cosine_sim,
           cosine_sim < {OUTLIER_T} AS is_outlier
    FROM assign
    """,
    category="llm semantic",
    doc="Embedding-space outlier detection: each vector's max cosine "
    "to the seed centroid set; vectors far from EVERY centroid "
    f"(best sim < {OUTLIER_T}) are flagged — the semantic-quality "
    "filter that drops off-distribution samples (mojibake, wrong "
    "modality, adversarial junk) which text heuristics cannot see. "
    "Same broadcast-centroid scan shape as cluster assignment: "
    "corpus scanned once, never shuffled on the vectors.",
)
def embed_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < K_CENTROIDS).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    return assign_clusters(emb, centroids).withColumn(
        "is_outlier", F.col("cosine_sim") < OUTLIER_T
    )


@register(
    "embed_pca_covariance",
    oracle="""
    SELECT i, j, ROUND(COVAR_POP(e1, e2), 5) AS cov
    FROM (
        SELECT t1.i AS i, t2.j AS j,
               CAST(list_extract(em.embedding, t1.i) AS DOUBLE) AS e1,
               CAST(list_extract(em.embedding, t2.j) AS DOUBLE) AS e2
        FROM embeddings em, range(1, 65) t1(i), range(1, 65) t2(j)
        WHERE t1.i <= t2.j
    )
    GROUP BY i, j
    ORDER BY i, j
    """,
    category="llm semantic (PCA)",
    doc="Distributed covariance of the 64-dim embedding corpus "
    "(llm/pca.py — the reduction that makes PCA a driver-side d x d "
    "problem): single Arrow-vectorized scan BLAS-accumulates "
    "per-partition (n, sum x, sum xx^T) partials, a map-side-combined "
    "posexplode/groupBy collapses them to d^2 scalars, and the query "
    "emits the upper triangle as (i, j, cov) rows. The corpus is "
    "never shuffled. Oracle recomputes every COVAR_POP pair straight "
    "from the parquet lists.",
)
def embed_pca_covariance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.pca import covariance_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    if emb.isEmpty():
        # the kernel rightly refuses a covariance of nothing; the
        # query face degrades to an empty matrix
        return spark.createDataFrame([], "i long, j long, cov double")
    _, _, cov = covariance_matrix(emb, "embedding", 64)
    rows = [
        (i + 1, j + 1, round(float(cov[i, j]), 5))
        for i in range(64)
        for j in range(i, 64)
    ]
    return spark.createDataFrame(rows, "i long, j long, cov double").orderBy(
        "i", "j"
    )


def _pca_literal_oracle() -> str:
    """DuckDB oracle for the frozen-basis projection: the same
    (x − μ)·wⱼ elementwise-then-list_sum arithmetic the Spark side
    folds with zip_with/aggregate, against the identical float64
    literals (%.17e round-trips exactly, and the e-notation makes
    DuckDB parse them as DOUBLE, never DECIMAL — the sql_pipe_syntax
    representation lesson)."""
    from aws_lakehouse_spark.llm.pca_fixture import (
        PCA_MEAN,
        PCA_W1,
        PCA_W2,
    )

    def lst(vals: list[float]) -> str:
        return "[" + ", ".join(f"{v:.17e}" for v in vals) + "]"

    return f"""
    WITH basis AS (
        SELECT CAST({lst(PCA_MEAN)} AS DOUBLE[]) AS mu,
               CAST({lst(PCA_W1)} AS DOUBLE[]) AS w1,
               CAST({lst(PCA_W2)} AS DOUBLE[]) AS w2
    )
    SELECT vec_id, label,
           ROUND(list_sum(list_transform(
               CAST(embedding AS DOUBLE[]),
               (x, i) -> (x - mu[i]) * w1[i])), 6) AS pc1,
           ROUND(list_sum(list_transform(
               CAST(embedding AS DOUBLE[]),
               (x, i) -> (x - mu[i]) * w2[i])), 6) AS pc2
    FROM embeddings, basis
    ORDER BY vec_id
    """


@register(
    "embed_pca_project",
    oracle=_pca_literal_oracle(),
    category="llm semantic (PCA)",
    doc="PCA projection of every embedding onto the top-2 principal "
    "components of the FROZEN fixture basis (llm/pca_fixture.py: the "
    "sign-fixed eigenvectors the engine's own covariance_matrix + "
    "principal_components pipeline produced once from the sf0.01 "
    "fixture, inlined as literals so the oracle is plain arithmetic "
    "— r7 verdict item 2, retiring the registry's one rows-only "
    "entry). The projection pass is the production path unchanged: "
    "one scan, built-in zip_with/aggregate (x - mu) . w_j folds "
    "against literal component vectors, fully JVM-side, corpus never "
    "shuffled. The LIVE eigendecomposition stays certified by "
    "embed_pca_covariance's oracle (the d x d reduction) plus "
    "tests/test_pca.py's numpy cross-check of the end-to-end eigh "
    "path.",
)
def embed_pca_project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from aws_lakehouse_spark.llm.pca import project
    from aws_lakehouse_spark.llm.pca_fixture import (
        PCA_MEAN,
        PCA_W1,
        PCA_W2,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return project(
        emb, np.array(PCA_MEAN), np.array([PCA_W1, PCA_W2])
    ).select("vec_id", "label", "pc1", "pc2").orderBy("vec_id")


@register(
    "embed_kmeans_iteration",
    oracle=f"""
    WITH {_ASSIGN_CTE}
    SELECT a.cluster_id, r.i AS pos,
           ROUND(AVG(list_extract(e.v, r.i)), 6) AS centroid,
           COUNT(*) AS n_members
    FROM assign a
    JOIN emb e ON e.vec_id = a.vec_id, range(1, 65) r(i)
    GROUP BY a.cluster_id, r.i
    ORDER BY a.cluster_id, r.i
    """,
    category="llm semantic",
    doc="One full Lloyd (k-means) iteration: broadcast-centroid "
    "E-step assignment (assign_clusters), then the M-step recomputes "
    "every centroid as the per-cluster elementwise mean via "
    "posexplode into a map-side-combined avg — shuffle carries at "
    "most tasks x K x d partial rows, the corpus is scanned once and "
    "never exchanged. The caller collects the K x d result (the same "
    "small table it broadcasts back) and loops to convergence — the "
    "iterative-algorithm shape (driver-coordinated small state, "
    "corpus-resident big data) that also drives the semantic-dedup "
    "tier's clustering. Oracle recomputes assignment and per-dim "
    "means in SQL.",
)
def embed_kmeans_iteration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.semantic import (
        assign_clusters,
        update_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < K_CENTROIDS).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    assignment = assign_clusters(emb, centroids)
    return update_centroids(emb, assignment).orderBy("cluster_id", "pos")


@register(
    "embed_drift_monitor",
    oracle="""
    WITH dims AS (
        SELECT CASE WHEN vec_id % 2 = 0 THEN 'ref' ELSE 'prod' END AS side,
               u.i AS pos,
               CAST(embedding[u.i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, 65)) AS u(i)
    ),
    means AS (
        SELECT side, pos, ROUND(AVG(x), 9) AS m
        FROM dims GROUP BY side, pos
    ),
    per_pos AS (
        SELECT pos,
               MAX(CASE WHEN side = 'ref' THEN m END) AS mr,
               MAX(CASE WHEN side = 'prod' THEN m END) AS mp
        FROM means GROUP BY pos
    ),
    folded AS (
        SELECT
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list(mr * mp ORDER BY pos)), (a, b) -> a + b) AS dot,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list(mr * mr ORDER BY pos)), (a, b) -> a + b) AS nr,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list(mp * mp ORDER BY pos)), (a, b) -> a + b) AS np,
            list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list(abs(mr - mp) ORDER BY pos)), (a, b) -> a + b) AS sad,
            MAX(abs(mr - mp)) AS mad
        FROM per_pos
    ),
    counts AS (
        SELECT
            CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_ref,
            CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_prod
        FROM embeddings
    )
    SELECT counts.n_ref, counts.n_prod,
           ROUND(dot / (sqrt(nr) * sqrt(np)), 6) AS mean_cosine,
           ROUND(mad, 6) AS max_dim_shift,
           ROUND(sad / 64.0, 6) AS avg_dim_shift
    FROM folded CROSS JOIN counts
    """,
    category="llm semantic (drift)",
    doc="Embedding-distribution drift between a reference and a "
    "production cohort (even vs odd vec_ids): cosine between the "
    "cohort MEAN vectors plus the max and average per-dimension "
    "mean shift — the cheap first-line monitor for 'did the "
    "upstream encoder or data distribution move' before anything "
    "expensive (re-clustering, re-indexing) runs. Per-dim means "
    "come off ONE posexplode aggregate (9 dp-rounded, the "
    "engine's established cross-engine mean convention); the "
    "64-dim reductions are ORDERED folds (dimension order), so "
    "every double is bit-identical on both engines. Scale: one "
    "corpus scan, shuffle bounded at sides × dims rows.",
)
def embed_drift_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    side = F.when(F.col("vec_id") % 2 == 0, "ref").otherwise("prod")
    dims = emb.select(
        side.alias("side"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        ),
    )
    # the (sides × 64)-row means frame feeds BOTH the drift fold and
    # the cohort counts; the lazy checkpoint materializes it so the
    # corpus is scanned exactly once
    means = (
        dims.groupBy("side", "pos")
        .agg(
            F.round(F.avg("x"), 9).alias("m"),
            F.count(F.lit(1)).alias("nrows"),
        )
        .localCheckpoint(eager=False)
    )
    per_pos = means.groupBy("pos").agg(
        F.max(F.when(F.col("side") == "ref", F.col("m"))).alias("mr"),
        F.max(F.when(F.col("side") == "prod", F.col("m"))).alias("mp"),
    )

    def fold(expr):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", expr.alias("t")))
                ),
                lambda s: s["t"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    folded = per_pos.agg(
        fold(F.col("mr") * F.col("mp")).alias("dot"),
        fold(F.col("mr") * F.col("mr")).alias("nr"),
        fold(F.col("mp") * F.col("mp")).alias("np"),
        fold(F.abs(F.col("mr") - F.col("mp"))).alias("sad"),
        F.max(F.abs(F.col("mr") - F.col("mp"))).alias("mad"),
    )
    # cohort sizes come off the SAME aggregated frame (each row
    # contributes every pos, so nrows at pos 0 IS the cohort count)
    # — no second scan of the embeddings table
    counts = (
        means.filter(F.col("pos") == 0)
        .groupBy()
        .agg(
            F.max(F.when(F.col("side") == "ref", F.col("nrows")))
            .cast("bigint")
            .alias("n_ref"),
            F.max(F.when(F.col("side") == "prod", F.col("nrows")))
            .cast("bigint")
            .alias("n_prod"),
        )
    )
    # counts is a one-row global aggregate: broadcast it explicitly
    # (uniform with every other scalar join-back in the package)
    # instead of relying on AQE to pick the broadcast strategy
    return folded.crossJoin(F.broadcast(counts)).select(
        "n_ref",
        "n_prod",
        F.round(
            F.col("dot")
            / F.nullif(
                F.sqrt(F.col("nr")) * F.sqrt(F.col("np")), F.lit(0.0)
            ),
            6,
        ).alias("mean_cosine"),
        F.round(F.col("mad"), 6).alias("max_dim_shift"),
        F.round(F.col("sad") / 64.0, 6).alias("avg_dim_shift"),
    )
