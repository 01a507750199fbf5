"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **brute force** (the correctness baseline): query set × corpus
  cosine, top-k per query. The query side is broadcast (queries are
  few); the corpus is scanned once, never shuffled on the vectors —
  only the (query_id, sim) pairs move, and TakeOrdered-style window
  top-k bounds the output.
- **LSH-bucketed** (the scale path): deterministic random-hyperplane
  signatures bucket the corpus; queries probe only their bucket.
  At 100 TB the corpus index is computed once and bucket-partitioned
  on disk; a probe touches 1/2^bits of the data.

Dot products use ``F.zip_with`` + ``F.aggregate`` — sequential
left-to-right double accumulation, bit-identical to the DuckDB
oracle's list_sum(list_transform(...)) evaluation, so even raw
cosine values hash-match.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the sequential dot fold over two array columns —
    the exact expression the Column path builds (zip_with multiply,
    0.0 double seed, left-to-right accumulate), emitted as one
    string. Same summation order, bit-identical results."""
    return (
        f"aggregate(zip_with(`{a}`, `{b}`, (x, y) -> x * y), "
        "0.0D, (acc, v) -> acc + v)"
    )


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product of two double arrays.

    Pass column NAMES where possible: each Python-lambda HOF costs
    ~60-100 py4j round trips (~20 ms) of pure query-BUILD time per
    call site, re-paid on every fresh plan, while parsing one
    ``F.expr`` string is a single round trip with JVM-side parsing
    (the :func:`hyperplane_signature` lesson, r11: construction of
    the vector queries was 0.3-0.5 s of almost pure py4j socket
    wait). Both paths build the same ``aggregate(zip_with(...))``
    expression — same fold order, bit-identical scores."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(f"sqrt({_dot_sql(a, a)})")
    return F.sqrt(dot_col(a, a))


def cosine_ratio_col(dot: Column, na: Column, nb: Column) -> Column:
    """``dot / (na · nb)`` with the zero-magnitude guard every cosine
    site shares: a zero vector makes the denominator exactly 0.0, and
    under ANSI mode (the Spark 4 default, and therefore the DRIVER's
    vanilla sessions) double ``0/0`` THROWS ``DIVIDE_BY_ZERO`` instead
    of yielding NaN — one all-zero embedding row (real corpora ship
    them as padding) would kill the whole query. ``nullif`` maps the
    zero denominator to NULL — similarity-to-a-zero-vector is
    undefined, and NULL propagates gracefully through rounds, filters
    and rankings — while any nonzero denominator passes through
    UNCHANGED, so scores stay bit-identical to the unguarded form."""
    return dot / F.nullif(na * nb, F.lit(0.0))


def cosine_sim_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; inputs should be pre-cast to
    ``array<double>`` (float32→float64 widening is exact). Zero
    vectors yield NULL (see :func:`cosine_ratio_col`). Column names
    take the one-expr-string fast path (see :func:`dot_col`)."""
    return cosine_ratio_col(dot_col(a, b), norm_col(a), norm_col(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Returns (query_id, neighbor_id, cosine_sim, rnk); self-matches
    excluded; ties broken by neighbor id. ``round_digits`` rounds the
    similarity *before* ranking so rank order is reproducible across
    engines/accumulation orders (pass None for raw doubles).
    """
    from aws_lakehouse_spark.layout import widen_if_narrow

    # norms attached per SIDE before the pair join: sqrt(dot(v, v))
    # is the same bits wherever it runs, so hoisting it from the
    # per-pair expression to a per-row projection changes nothing in
    # the output while cutting the per-pair HOF work from three
    # interpreted dot folds to one (HOF lambdas never enter codegen
    # — at N pairs per query that third is the whole scoring cost)
    c = widen_if_narrow(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).withColumn("__cn", norm_col("c_vec"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("__qn", norm_col("q_vec"))
    sim = cosine_ratio_col(
        dot_col("q_vec", "c_vec"),
        F.col("__qn"),
        F.col("__cn"),
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", sim)
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries_pdf,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = None,
) -> DataFrame:
    """Numpy-vectorized exact cosine top-k (the throughput path).

    ``queries_pdf`` is a small pandas DataFrame (id, vector) —
    query sets are tiny by definition; it ships to executors as a
    task broadcast. Each Arrow batch of the corpus is scored against
    ALL queries in one ``numpy`` matmul (BLAS), then a per-batch
    top-k cut bounds what leaves Python; a final window top-k
    merges. ~100× the scalar-expression path on wide vectors, and
    the corpus still streams batch-by-batch — nothing is collected.

    With ``round_digits=None`` results are tolerance-equal (not
    bitwise) to ``brute_force_topk`` because BLAS uses pairwise
    summation. Pass ``round_digits`` to round similarities BEFORE
    the per-batch cut and final ranking: ties then break by
    ascending neighbor id at both levels (the per-batch cut uses
    the same (sim desc, id asc) order as the merge window, so the
    global top-k is provably contained in the union of batch
    top-ks), making the ranked output hash-reproducible against a
    sequential-accumulation oracle.
    """
    import numpy as np
    import pandas as pd

    out_schema = "query_id long, neighbor_id long, cosine_sim double"
    # null vectors cannot be scored (np.stack would raise); drop them
    # on both sides — query set driver-side, corpus via a pushed-down
    # JVM filter before any batch reaches Python
    queries_pdf = queries_pdf[queries_pdf[vec_col].notna()]
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    if len(queries_pdf) == 0:
        # an upstream filter can legitimately match no query rows;
        # np.stack([]) raises, and an empty top-k is the right answer
        return (
            corpus.sparkSession.createDataFrame([], out_schema)
            .withColumn("rnk", F.lit(0))
        )

    q_ids = queries_pdf[id_col].to_numpy()
    q_mat = np.stack(queries_pdf[vec_col].to_list()).astype("float64")
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue  # empty Arrow batch from an empty partition
            ids = pdf[id_col].to_numpy()
            c_mat = np.stack(pdf[vec_col].to_list()).astype("float64")
            c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_norm @ q_norm.T  # (batch, n_queries)
            if round_digits is not None:
                sims = np.round(sims, round_digits)
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = ids != qid
                mids = ids[mask]
                # lexsort: primary -sim desc, secondary id asc — same
                # total order as the merge window below
                cand_idx = np.lexsort((mids, -col[mask]))[:k]
                cand_ids = mids[cand_idx]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": cand_ids,
                        "cosine_sim": col[mask][cand_idx],
                    }
                )

    # no widen here: each Arrow batch is ONE BLAS matmul; the
    # per-partition Python-worker spin-up costs more than the matmul
    # until partitions carry ~millions of rows, and at real scale the
    # scan is already wide
    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


def quantize_int8_cols(vec: Column, round_digits: int = 6) -> dict[str, Column]:
    """Scalar int8 quantization of an embedding vector: per-vector
    min/max affine scale, 255 levels, plus the max absolute
    reconstruction error. 4× memory cut for ANN candidate storage;
    max-abs (not RMS) error because a per-element max is order-
    independent and therefore reproducible across engines. Pure
    array expressions — one scan, no shuffle, no Python."""
    mn = F.array_min(vec)
    mx = F.array_max(vec)
    scale = (mx - mn) / F.lit(255.0)

    def code(x: Column) -> Column:
        return F.when(scale > 0, F.round((x - mn) / scale)).otherwise(
            F.lit(0.0)
        )

    err = F.array_max(
        F.transform(vec, lambda x: F.abs(x - (mn + code(x) * scale)))
    )
    return {
        "q_min": F.round(mn, round_digits),
        "q_max": F.round(mx, round_digits),
        "max_abs_err": F.round(err, round_digits),
    }


def hyperplane_weight(seed: str, b: int, d: int) -> float:
    """Deterministic pseudo-random plane weight in [-1, 1): derived
    from md5(seed:bit:dim), so it is reproducible across engines,
    languages and cluster restarts (no RNG state to ship). The same
    IEEE ops (x / 1000.0 - 1.0) run everywhere, so oracles can embed
    the literal and get the bit-identical double."""
    import hashlib

    h = hashlib.md5(f"{seed}:{b}:{d}".encode()).hexdigest()[:7]
    return (int(h, 16) % 2000) / 1000.0 - 1.0


def hyperplane_signature(
    vec_name: str, dim: int, bits: int = 8, seed: str = "lsh"
) -> Column:
    """Deterministic random-hyperplane LSH signature (int bucket id)
    of the array column named ``vec_name``.

    Weights are computed driver-side (:func:`hyperplane_weight`) and
    emitted as plain double literals: an earlier revision derived
    each weight with in-plan md5/conv expressions, and folding those
    bits×dim literal subtrees cost ~6-8 s of ANALYSIS time per fresh
    plan — pure driver overhead re-paid on every query build. The
    whole signature is ONE ``F.expr`` string (not bits×dim ``F.lit``
    Column objects): each py4j Column construction costs ~1 ms on
    the driver, and 2 sides × bits × dim of them added >1 s of pure
    query-BUILD time per run — parsing one SQL string is JVM-side
    and ~free. Dot products keep the same sequential
    zip_with+aggregate shape as :func:`dot_col`, so oracle literals
    still match bit-for-bit.
    """
    terms = []
    for b in range(bits):
        arr = ", ".join(
            f"{hyperplane_weight(seed, b, d)!r}D" for d in range(dim)
        )
        proj = (
            f"aggregate(zip_with({vec_name}, array({arr}), "
            f"(x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {proj} > 0.0D THEN {1 << b} ELSE 0 END)")
    return F.expr(f"CAST({' + '.join(terms)} AS INT)")


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 6,
    k: int = 5,
) -> DataFrame:
    """ANN top-k: probe only the query's LSH bucket.

    Candidate set = corpus rows whose signature equals the query's →
    the join is an equi-join on the bucket id (shuffle key: one int).
    Recall < 1.0 by construction; raise ``bits`` tables or multi-probe
    for higher recall.
    """
    from aws_lakehouse_spark.layout import widen_if_narrow

    c = (
        widen_if_narrow(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("c_vec"),
        )
        .withColumn("bucket", hyperplane_signature("c_vec", dim, bits))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
        )
        .withColumn("bucket", hyperplane_signature("q_vec", dim, bits))
        # query-side norm hoisted (tiny frame, pairs >> queries); the
        # CORPUS norm stays per-pair on purpose — bucketing makes
        # candidate pairs ~ corpus x queries / 2^bits, FEWER than
        # corpus rows for small query sets, so a per-row corpus fold
        # would cost more than it saves (measured +29% at sf0.1).
        # Net per pair: two HOF folds (dot + corpus norm) vs three.
        .withColumn("__qn", norm_col("q_vec"))
    )

    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # round before ranking: reproducible top-k across engines
        .withColumn(
            "cosine_sim",
            F.round(
                cosine_ratio_col(
                    dot_col("q_vec", "c_vec"),
                    F.col("__qn"),
                    norm_col("c_vec"),
                ),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    refine_iterations: int = 1,
) -> DataFrame:
    """IVF coarse quantizer: deterministic seed centroids (corpus rows
    in md5(id) order — an unbiased reproducible sample, no RNG state)
    optionally refined by Lloyd iterations done entirely as DataFrame
    ops: assign → per-centroid element-wise mean via posexplode +
    groupBy(centroid, pos). Returns (centroid_id, cent_vec).

    The centroid table is n_centroids rows at any corpus scale — it is
    the one structure that is ALWAYS broadcastable. It is returned
    PINNED (lazy checkpoint): its derivation embeds 1 + 2·iterations
    corpus scans, and every consumer (inverted-list assignment, query
    probe routing) would otherwise re-run them all — the k-rows-from-
    a-petabyte shape where a pin is pure win. Per-iteration pins also
    keep the Lloyd loop's plan depth constant instead of linear in
    iterations."""
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cent_vec"),
    )
    cents = (
        c.orderBy(F.md5(F.col("cid").cast("string")))
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy(F.md5(F.col("cid").cast("string"))))
            .cast("int")
            .alias("centroid_id"),
            "cent_vec",
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(refine_iterations):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        vecs = corpus.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).join(assigned.withColumnRenamed(id_col, "vid"), "vid")
        cents = (
            vecs.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            # 9dp round: partial-agg accumulation order differs across
            # engines/partitionings; the rounded mean is reproducible
            .agg(F.round(F.avg("x"), 9).alias("x"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "x"))
                ).alias("px")
            )
            .select(
                "centroid_id",
                F.transform(F.col("px"), lambda s: s.getField("x")).alias(
                    "cent_vec"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-list assignment: each corpus vector → its max-cosine
    centroid. One scan × n_centroids dot products (centroids
    broadcast); at build time only — queries never rescan this."""
    v = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("__vn", norm_col("v"))
    cents = centroids.withColumn("__cn", norm_col("cent_vec"))
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "sim",
        F.round(
            cosine_ratio_col(
                dot_col("v", "cent_vec"),
                F.col("__vn"),
                F.col("__cn"),
            ),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("sim"), F.asc("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    refine_iterations: int = 1,
) -> DataFrame:
    """IVF ANN top-k: queries probe only their ``nprobe`` nearest
    inverted lists — candidate work is ~nprobe/n_centroids of the
    corpus instead of all of it.

    Scale shape: centroids broadcast everywhere; the corpus is scored
    against candidates via an EQUI-join on centroid_id (int key, no
    vector ever shuffles); at 100 TB the assignment would be persisted
    partitioned by centroid_id so a probe is a partition-pruned read.
    Recall < 1.0 by construction (raise nprobe for recall)."""
    cents = ivf_centroids(
        corpus, id_col, vec_col, n_centroids, refine_iterations
    )
    lists = ivf_assign(corpus, cents, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("c_vec"),
        )
        .withColumn("__cn", norm_col("c_vec"))
        .join(lists, "neighbor_id")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("__qn", norm_col("q_vec"))
    q_probe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "sim", F.round(cosine_sim_col("q_vec", "cent_vec"), 6)
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("sim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_vec", "__qn", "centroid_id")
    )

    scored = (
        c.join(F.broadcast(q_probe), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                cosine_ratio_col(
                    dot_col("q_vec", "c_vec"),
                    F.col("__qn"),
                    F.col("__cn"),
                ),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


def lsh_bucket_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 6,
    k: int = 5,
) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket PLUS the
    ``bits`` single-bit-flip neighbor buckets (the most likely homes
    of near neighbors that landed just across one hyperplane).
    Candidate volume ≈ (bits+1)/2^bits of the corpus — still a tiny
    fraction — for substantially higher recall than single-probe
    (measured against brute force in tests). The corpus index is
    untouched; only the probe side fans out, so the extra cost scales
    with queries, not corpus."""
    from aws_lakehouse_spark.layout import widen_if_narrow

    c = (
        widen_if_narrow(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("c_vec"),
        )
        .withColumn("bucket", hyperplane_signature("c_vec", dim, bits))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
        )
        .withColumn("home", hyperplane_signature("q_vec", dim, bits))
        # query-side norm hoisted; corpus norm stays per-pair — same
        # pair-vs-row arithmetic as lsh_bucket_topk (candidates are
        # ~(bits+1)/2^bits of the corpus per query)
        .withColumn("__qn", norm_col("q_vec"))
    )
    probes = F.array(
        F.col("home"), *[
            F.col("home").bitwiseXOR(F.lit(1 << b)) for b in range(bits)
        ]
    )
    q_fan = q.select(
        "query_id", "q_vec", "__qn", F.explode(probes).alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q_fan), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                cosine_ratio_col(
                    dot_col("q_vec", "c_vec"),
                    F.col("__qn"),
                    norm_col("c_vec"),
                ),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lambda_relevance: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    vec_col: str = "embedding",
    score_col: str = "cosine_sim",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) of an ANN candidate set: greedily pick the item maximizing
    ``λ·relevance − (1−λ)·max-similarity-to-already-picked`` — the
    diversity pass retrieval pipelines run on top-N before handing
    top-k to a consumer (dedups near-identical hits that plain
    cosine ranking stacks together).

    Scale shape: MMR is inherently sequential in k, but it runs on
    the BOUNDED candidate table ANN already produced (N per query,
    e.g. 50), grouped per query — so the greedy loop executes inside
    ``applyInPandas``, one Arrow batch per query group, never on the
    corpus. k iterations over N candidates is O(k·N·d) per query —
    microseconds at candidate scale; the cluster-level cost stays
    the one shuffle that groups candidates by query.

    ``candidates`` must carry (query_col, id_col, vec_col,
    score_col). Returns (query_id, neighbor_id, mmr_rank, mmr_score,
    relevance) with deterministic id tie-breaks.
    """
    import numpy as np
    import pandas as pd

    lam = float(lambda_relevance)
    out_schema = (
        f"{query_col} bigint, {id_col} bigint, mmr_rank int, "
        "mmr_score double, relevance double"
    )

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([score_col, id_col], ascending=[False, True])
        vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        n = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        cand = list(range(n))
        while cand and len(picked) < k:
            if not picked:
                # ties already broken by the (score desc, id asc) sort
                best_pos = 0
                best_score = lam * rel[cand[0]]
            else:
                P = unit[picked]
                best_pos, best_score = 0, -np.inf
                for pos, ci in enumerate(cand):
                    redundancy = float(np.max(P @ unit[ci]))
                    s = lam * rel[ci] - (1.0 - lam) * redundancy
                    if s > best_score + 1e-12:
                        best_pos, best_score = pos, s
            picked.append(cand.pop(best_pos))
            scores.append(float(best_score))
        sel = pdf.iloc[picked]
        return pd.DataFrame(
            {
                query_col: sel[query_col].to_numpy(),
                id_col: ids[picked],
                "mmr_rank": np.arange(1, len(picked) + 1, dtype="int32"),
                "mmr_score": np.round(scores, 6),
                "relevance": np.round(rel[picked], 6),
            }
        )

    return candidates.groupBy(query_col).applyInPandas(rerank, out_schema)
