"""Deduplication operators for training-data curation.

Five tiers, all shuffle-disciplined for 100 TB:

- **exact**: group by content digest (md5) — one shuffle on the
  digest, never on the raw text;
- **MinHash**: k independent min-hashes over token shingles. Hashing
  is md5-based (identical hex in every engine → oracle-checkable and
  cluster-reproducible); signatures are computed scan-side with
  higher-order array functions, no UDF;
- **LSH banding**: candidate pairs come from an equi-join on
  (band_id, band_hash) — the only shuffle key; no cross join exists
  anywhere;
- **n-gram Jaccard**: exact verification for candidate pairs via
  shared-shingle equi-join + per-pair set arithmetic;
- **SimHash**: 16-bit sign-aggregated fingerprint; hamming-close
  docs bucket together.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def content_digest(text: Column) -> Column:
    """Stable content fingerprint for exact dedup."""
    return F.md5(text)


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact dedup: one surviving id per distinct content digest.

    Returns (digest, keep_id, n_copies). Survivor = min id
    (deterministic). The shuffle key is the 32-char digest, not the
    document body — at 100 TB the exchange carries ~50 B/row.
    """
    return (
        df.select(
            content_digest(F.col(text_col)).alias("digest"),
            F.col(id_col).alias("keep_id"),
        )
        .groupBy("digest")
        .agg(
            F.min("keep_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles of a document as an array column.

    Built with sequence+transform over one split — no explode until
    a join actually needs rows.
    """
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 4) -> list[Column]:
    """MinHash signature: for seed j, min over shingles of
    md5(j || ':' || shingle). md5's hex ordering is engine-agnostic,
    so signatures are bit-identical everywhere."""
    # closure factory, NOT a default-arg lambda: PySpark HOF lambdas
    # are arity-inspected, and a 2-arg lambda binds the array index
    def seeded(j: int):
        prefix = f"{j}:"

        def h(s: Column) -> Column:
            return F.md5(F.concat(F.lit(prefix), s))

        return h

    return [
        F.array_min(F.transform(shingles, seeded(j))).alias(f"minhash_{j}")
        for j in range(num_hashes)
    ]


def lsh_band_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 4,
    band_size: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash-LSH banding.

    Signature of ``num_hashes`` min-hashes is cut into bands of
    ``band_size``; docs agreeing on any full band are candidates.
    Plan: scan→project (signatures) → explode bands (num_hashes/
    band_size rows per doc) → self-equi-join on (band_id, band_hash)
    → distinct pairs. The join key is a digest: uniform, small,
    skew-free.
    """
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        *minhash_signature(shingles_col(F.col(text_col), shingle_k), num_hashes),
    )
    n_bands = num_hashes // band_size
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"minhash_{b * band_size + r}")
                                    for r in range(band_size)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")

    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    |A∩B| from a shared-shingle equi-join; |A|,|B| carried alongside;
    J = |A∩B| / (|A|+|B|-|A∩B|). Returns (doc_a, doc_b, jaccard).
    The shingle join key is content-uniform; a stopword-like shingle
    hot key would be the skew risk → AQE skew-join covers it.
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(F.col(text_col), shingle_k).alias("shingles"),
    ).withColumn("set_size", F.size("shingles"))
    exploded = sh.select(
        "doc_id", "set_size", F.explode("shingles").alias("shingle")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = inter.select(
        "doc_a",
        "doc_b",
        (
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
        ).alias("jaccard"),
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def connected_components(
    pairs: DataFrame, max_iterations: int = 15
) -> DataFrame:
    """Resolve near-dup pairs into duplicate clusters: (node, component)
    where component = min doc id reachable through the pair graph.

    Iterative label propagation: each round, every node takes the min
    label among itself and its neighbors; converged when no label
    changes. Near-dup graphs are forests of tiny cliques, so rounds ≈
    longest chain (a handful); each round is one join + one aggregate
    — no driver-side graph state, only a scalar convergence count.
    ``max_iterations`` bounds adversarial chains.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "dst_node"),
                edges.dst == F.col("dst_node"),
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("component").alias("neighbor_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        # localCheckpoint would truncate lineage on a long chain; the
        # near-dup graphs here converge in <5 rounds
        labels = new_labels
        if changed == 0:
            break
    return labels


def near_duplicate_survivors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.6,
    shingle_k: int = 3,
) -> DataFrame:
    """End-to-end near-dup resolution: LSH candidates → exact Jaccard
    verification → connected components → one survivor (min id) per
    duplicate cluster. Returns (doc_id, survivor_id, is_survivor) for
    every doc that belongs to some cluster; docs with no near-dup are
    implicitly their own survivors.

    Exact Jaccard is computed only for the candidate pairs, per pair
    via array_intersect/union on the two shingle sets — O(candidates),
    never the all-shared-shingle-pairs blowup.
    """
    candidates = lsh_band_pairs(df, id_col, text_col, shingle_k)
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(F.col(text_col), shingle_k).alias("sh"),
    )
    verified = (
        candidates.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b")
    )
    comps = connected_components(verified)
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("survivor_id"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )


def simhash_col(text: Column, bits: int = 16) -> Column:
    """SimHash fingerprint: per-token md5 → first 28 hex bits as int;
    fingerprint bit i is the sign of Σ_tokens (±1 by token bit i).

    Pure array-expression implementation (conv + bitwise ops inside
    aggregate) — deterministic and portable.
    """
    toks = F.array_distinct(F.split(text, " "))
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long")
    )
    def bit_vote(i: int):
        mask = 1 << i

        def merge(acc: Column, h: Column) -> Column:
            return acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1)

        return merge

    bit_sums = [
        F.aggregate(hashes, F.lit(0), bit_vote(i)) for i in range(bits)
    ]
    fingerprint = None
    for i, s in enumerate(bit_sums):
        term = F.when(s > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return fingerprint.cast("bigint")


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: candidates = docs agreeing on either
    8-bit half of the fingerprint (pigeonhole: any pair within
    hamming ≤ 3 of a 16-bit code agrees on at least one half when the
    differing bits don't split 2/2 — with the verify step this is the
    standard banded recall/cost trade), verified by exact hamming
    distance bit_count(xor). Both stages are equi-joins on small int
    keys — never a cross join."""
    fp = df.select(
        F.col(id_col).alias("doc_id"),
        simhash_col(F.col(text_col), bits).alias("fp"),
    )
    low = F.col("fp").bitwiseAND(F.lit(255))
    high = F.shiftright(F.col("fp"), 8).bitwiseAND(F.lit(255))
    bands = fp.select(
        "doc_id", F.lit(0).alias("band_id"), low.alias("bv")
    ).unionByName(
        fp.select("doc_id", F.lit(1).alias("band_id"), high.alias("bv"))
    )
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
