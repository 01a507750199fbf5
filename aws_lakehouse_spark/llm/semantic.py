"""Semantic clustering and SemDeDup-style embedding dedup.

Training-data ops the reference lacks (extension per SURVEY §2.14):

- **cluster assignment**: every vector is assigned to its
  max-cosine centroid — the E-step of k-means and the partitioner
  for any downstream per-cluster work. Centroids are broadcast
  (there are K of them, K ≪ N); the corpus is scanned once and
  never shuffled on the vectors.
- **SemDeDup** (Abbas et al., 2023, arXiv:2303.09540): semantic
  near-duplicate removal = cluster first, then compare pairs ONLY
  within a cluster, dropping all but one representative of each
  high-similarity pair. Clustering turns the O(N²) all-pairs
  problem into Σ_c |c|² — with K ∝ N (centroids from a corpus
  sample) cluster sizes stay ~constant and total work is ~O(N).

Scale notes (100 TB): the within-cluster self-join is an equi-join
on ``cluster_id`` — Spark shuffles both sides on that key, so each
cluster's pairs are produced on one reducer without any cross join.
Skewed (over-large) clusters are the known failure mode; the
standard remedies are more centroids or recursively re-clustering
any cluster above a size cap, both expressible with these same two
functions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from aws_lakehouse_spark.llm.similarity import (
    cosine_ratio_col,
    dot_col,
    norm_col,
)


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    round_digits: int = 6,
) -> DataFrame:
    """Assign each vector to its max-cosine centroid.

    Returns (id_col, cluster_id, cosine_sim). Similarity is rounded
    *before* the argmax so the winner is reproducible across
    accumulation orders; ties break on the lower centroid id.

    ``centroids`` must be small (it is broadcast). The corpus side
    is scanned once; only (id, cluster, sim) triples move.
    """
    # per-side norms hoisted out of the per-pair cosine: sqrt(dot(v,v))
    # is the same bits wherever it runs, so each (vector, centroid)
    # pair costs one HOF dot fold instead of three
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).withColumn("__vn", norm_col("__v"))
    c = centroids.select(
        F.col(centroid_id_col).alias("__cid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__cn", norm_col("__cv"))
    sim = F.round(
        cosine_ratio_col(
            dot_col("__v", "__cv"),
            F.col("__vn"),
            F.col("__cn"),
        ),
        round_digits,
    )
    # argmax via a combinable aggregate, not a window: max over
    # struct(sim, -cid) picks (max sim, tie -> min cid) exactly, and
    # the partial (map-side) max means the shuffle carries N rows of
    # (id, struct) — a row_number window would shuffle + sort all
    # N*K scored rows
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col,
        F.struct(
            sim.alias("cosine_sim"),
            (-F.col("__cid")).alias("__negcid"),
        ).alias("__sc"),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.max("__sc").alias("__m"))
        .select(
            id_col,
            (-F.col("__m.__negcid")).alias("cluster_id"),
            F.col("__m.cosine_sim").alias("cosine_sim"),
        )
    )


def clustered_vectors(
    vectors: DataFrame,
    assignment: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster_id, __v, __n): the assignment joined back to its
    vectors with the per-row norm attached, PINNED (lazy checkpoint).

    This is the one frame the whole SemDeDup pipeline should pin:
    both pair-join sides AND the member count read it, so a single
    checkpoint materializes the corpus-vs-centroid scoring exactly
    once. Pinning the assignment separately (the pre-r12 shape) paid
    a SECOND checkpoint write of the same N rows plus one more
    build-time stage execution for no additional scan saved —
    measured 0.3-0.5 s of the query's ~1 s non-job wall at sf0.1.
    """
    return (
        assignment.select(F.col(id_col), "cluster_id")
        .join(
            vectors.select(
                F.col(id_col),
                F.col(vec_col).cast("array<double>").alias("__v"),
            ),
            id_col,
        )
        .withColumn("__n", norm_col("__v"))
        .localCheckpoint(eager=False)
    )


def semdedup_pairs(
    vectors: DataFrame,
    assignment: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    fanout: int = 1,
    clustered: DataFrame | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs (vec_a < vec_b, cos > t).

    ``assignment`` is (id, cluster_id) from :func:`assign_clusters`.
    The pair join is an equi-join on ``cluster_id`` — never a global
    cross join; per-cluster pair volume is the SemDeDup cost model.

    Per-vector norms are computed ONCE on the clustered frame, so a
    pair costs one dot product instead of three array aggregations;
    ``dot/(norm_a*norm_b)`` is bit-identical to computing the full
    cosine per pair (same operations, same order), so the rounded
    similarity — and thus the oracle comparison — is unchanged.

    ``fanout`` salts the self-join for the K < cores regime (few
    clusters, e.g. a fixed small centroid set): side *a* gets a
    deterministic salt in ``[0, fanout)``, side *b* is replicated
    once per salt, and the join key becomes (cluster_id, salt) —
    every pair is still produced exactly once, but one cluster's
    pair work spreads over ``fanout`` reducers instead of one. At
    real scale K ∝ N ≫ cores, so callers leave fanout=1 and pay no
    replication.

    Pass a prebuilt ``clustered`` frame (:func:`clustered_vectors`)
    when the caller also consumes it elsewhere (e.g. the member
    count in :func:`semdedup_summary`), so the pipeline pins ONE
    frame instead of two.
    """
    from aws_lakehouse_spark.llm.similarity import (
        cosine_ratio_col,
        dot_col,
    )

    # join the vectors back ONCE, then self-join the clustered frame
    # on cluster_id — the lazy checkpoint makes both pair sides read
    # the same materialized partitions instead of each re-running the
    # assignment-to-vector join
    if clustered is None:
        clustered = clustered_vectors(vectors, assignment, id_col, vec_col)
    fanout = max(1, int(fanout))
    a = clustered.select(
        F.col(id_col).alias("vec_a"),
        "cluster_id",
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(fanout))
        .cast("int")
        .alias("__salt"),
    )
    b = clustered.select(
        F.col(id_col).alias("vec_b"),
        "cluster_id",
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.explode(
            F.sequence(F.lit(0), F.lit(fanout - 1)).cast("array<int>")
        ).alias("__salt"),
    )
    pairs = a.join(b, ["cluster_id", "__salt"]).filter(
        F.col("vec_a") < F.col("vec_b")
    )
    sim = F.round(
        cosine_ratio_col(
            dot_col("__va", "__vb"),
            F.col("__na"),
            F.col("__nb"),
        ),
        round_digits,
    )
    return (
        pairs.withColumn("pair_sim", sim)
        .filter(F.col("pair_sim") > threshold)
        .select("cluster_id", "vec_a", "vec_b", "pair_sim")
    )


def semdedup_summary(
    assignment: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Per-cluster SemDeDup outcome: members vs dropped.

    A vector is *dropped* when some lower-id vector in its cluster
    sits above the similarity threshold (keep-the-first policy —
    deterministic, no ordering sensitivity). Returns
    (cluster_id, n_members, n_dropped), n_dropped counting distinct
    ``vec_b`` values of the pair set.

    ``assignment`` may be any one-row-per-vector frame carrying
    ``cluster_id`` — in particular the pinned
    :func:`clustered_vectors` frame (its inner join back to the
    vectors preserves every assigned row, so member counts are
    identical), which lets the pipeline read ONE materialized frame
    for both the pair sides and the member count.
    """
    members = assignment.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    dropped = pairs.groupBy("cluster_id").agg(
        F.countDistinct("vec_b").alias("n_dropped")
    )
    return (
        members.join(dropped, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce(F.col("n_dropped"), F.lit(0))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


def update_centroids(
    vectors: DataFrame,
    assignment: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """The k-means M-step: per-cluster elementwise mean of the
    assigned vectors, as (cluster_id, pos, centroid) rows with pos
    1-based — pair with :func:`assign_clusters` (the E-step) to run
    full Lloyd iterations; the caller collects the K×d result (the
    same small table it broadcast as centroids) and loops.

    Scale shape: one equi-join of the (id, cluster) assignment back
    to the vectors on the id, then posexplode to (cluster, dim,
    value) triples feeding a map-side-combined avg — the shuffle
    carries at most #tasks × K × d partial rows, never the corpus.
    The corpus itself is scanned once and never exchanged (the
    assignment join shuffles only (id, cluster) pairs against the
    vector table's own layout).
    """
    joined = assignment.select(F.col(id_col), "cluster_id").join(
        vectors.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__v"),
        ),
        id_col,
    )
    return (
        joined.select("cluster_id", F.posexplode("__v").alias("pos", "val"))
        .withColumn("pos", (F.col("pos") + 1).cast("long"))
        .groupBy("cluster_id", "pos")
        .agg(
            F.round(F.avg("val"), round_digits).alias("centroid"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
