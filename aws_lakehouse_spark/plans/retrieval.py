"""Retrieval / ranking query surface (LLM data + RAG ops).

The reference pipeline feeds curated corpora into retrieval systems;
this tier adds the ranking primitives those systems run at corpus
scale: lexical BM25, hybrid lexical+vector fusion (reciprocal rank
fusion), and product-quantization ANN (the memory-bounded scale path
past int8 quantization).

Hash-match discipline: every score is double arithmetic with
engine-identical accumulation order (sequential left-to-right), and
scores are rounded to 6 dp BEFORE any ranking, so even the ranked
output hash-matches across Spark and DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.llm.text import tokens_col
from aws_lakehouse_spark.registry import register

# BM25 constants (the standard Robertson defaults)
_K1 = 1.2
_B = 0.75
_BM25_TERMS = ("join", "window", "scan")
_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_DUCK_TOKS = "str_split(text, ' ')"


def bm25_tf_frame(docs: DataFrame) -> DataFrame:
    """The BM25 term-frequency fragment: token explode filtered to
    the query terms SCAN-SIDE (before any exchange — only matching
    (doc, term) pairs shuffle), then the per-(doc, term) count.
    Shared by the standalone BM25 query and the hybrid-RRF lexical
    arm; module-level so the plan-shape test can assert the pushed
    filter on the fragment itself (the queries pin the result, which
    hides this subtree behind a checkpoint in their final plans)."""
    toks = tokens_col(F.col("text"))
    exploded = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    ).filter(F.col("term").isin(*_BM25_TERMS))
    return exploded.groupBy("doc_id", "term").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    )


@register(
    "text_bm25_topk",
    bench=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len({_DUCK_TOKS}) AS dl,
               unnest({_DUCK_TOKS}) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, MAX(dl) AS dl, COUNT(*) AS tf
        FROM toks WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ), dft AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), stats AS (
        SELECT COUNT(*) AS n_docs,
               AVG(len({_DUCK_TOKS})) AS avgdl
        FROM documents
    ), scored AS (
        SELECT tf.doc_id,
               ROUND(SUM(
                   ln(1 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                   * tf.tf * ({_K1} + 1)
                   / (tf.tf + {_K1} * (1 - {_B} + {_B} * tf.dl / stats.avgdl))
               ), 6) AS bm25
        FROM tf JOIN dft USING (term) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        FROM scored
    ) WHERE rnk <= 20
    """,
    category="llm retrieval",
    doc="BM25 top-20 documents for a fixed 3-term query: token "
    "explode filtered to the query terms (predicate applied BEFORE "
    "the shuffle, so only matching (doc, term) pairs move), "
    "term-frequency aggregation, a term-cardinality-bounded df "
    "table, and a one-row corpus-stats broadcast. Lucene-style "
    "idf = ln(1 + (N - df + .5)/(df + .5)) keeps scores positive. "
    "At 100 TB the df/stats side stays tiny (3 terms, one row) — "
    "the only data-sized shuffle is the (doc, term) count, and the "
    "global top-20 is a TakeOrdered, never a full sort.",
)
def text_bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    # two consumers (document frequencies, the score aggregate) — pin
    # the query-term-filtered TF frame (tiny: |terms| x matching
    # docs) so the corpus explode runs once
    tf = bm25_tf_frame(docs).localCheckpoint(eager=False)
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"),
    )
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w_term = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(w_term), 6).alias("bm25"))
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("doc_id", "bm25", F.col("rnk").cast("int").alias("rnk"))
    )


_DUCK_DOT = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"


def _duck_cos(a: str, b: str) -> str:
    return (
        f"{_DUCK_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DUCK_DOT.format(a=a, b=a)}) * "
        f"sqrt({_DUCK_DOT.format(a=b, b=b)}))"
    )


@register(
    "ann_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len({_DUCK_TOKS}) AS dl,
               unnest({_DUCK_TOKS}) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, MAX(dl) AS dl, COUNT(*) AS tf
        FROM toks WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ), dft AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), stats AS (
        SELECT COUNT(*) AS n_docs,
               AVG(len({_DUCK_TOKS})) AS avgdl
        FROM documents
    ), lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY ROUND(SUM(
                   ln(1 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                   * tf.tf * ({_K1} + 1)
                   / (tf.tf + {_K1} * (1 - {_B} + {_B} * tf.dl / stats.avgdl))
               ), 6) DESC, doc_id) AS r_lex
        FROM tf JOIN dft USING (term) CROSS JOIN stats
        GROUP BY doc_id
    ), c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
        SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0
    ), vec AS (
        SELECT c.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY ROUND({_duck_cos('q.v', 'c.v')}, 6) DESC,
                            c.vec_id) AS r_vec
        FROM c CROSS JOIN q
    ), fused AS (
        SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / (60 + lex.r_lex), 0)
                     + COALESCE(1.0 / (60 + vec.r_vec), 0), 6) AS rrf
        FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, rrf, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
        FROM fused
    ) WHERE rnk <= 20
    """,
    category="llm retrieval",
    doc="Hybrid retrieval via reciprocal rank fusion (k=60): the "
    "BM25 ranking and the cosine ranking against query vector 0 "
    "are fused as 1/(60+r_lex) + 1/(60+r_vec), full-outer on the "
    "document key so docs ranked by only one retriever still score "
    "their single contribution. Both per-retriever scores are "
    "rounded to 6 dp before their rank windows, so ranks — and "
    "therefore the fused scores — are engine-reproducible. The "
    "vector side broadcasts one query row; the lexical side's df "
    "table is term-bounded; the fusion join is keyed on doc_id "
    "(at scale both rank lists are top-k-truncated first, keeping "
    "the fusion input k-bounded per query).",
)
def ann_hybrid_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.similarity import (
        cosine_ratio_col,
        dot_col,
        norm_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    # two consumers (document frequencies, the score aggregate) — pin
    # the query-term-filtered TF frame (tiny: |terms| x matching
    # docs) so the corpus explode runs once
    tf = bm25_tf_frame(docs).localCheckpoint(eager=False)
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"),
    )
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w_term = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    lex = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(w_term), 6).alias("bm25"))
        .withColumn(
            "r_lex",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_lex")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("qv"))
        .withColumn("__qn", norm_col("qv"))
    )
    vec = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        # per-side norms hoisted out of the per-pair cosine (same
        # bits, one HOF dot per pair instead of three)
        .withColumn("__cn", norm_col("cv"))
        .crossJoin(F.broadcast(q))
        .withColumn(
            "sim",
            F.round(
                cosine_ratio_col(
                    dot_col("qv", "cv"),
                    F.col("__qn"),
                    F.col("__cn"),
                ),
                6,
            ),
        )
        .withColumn(
            "r_vec",
            F.row_number().over(
                Window.orderBy(F.desc("sim"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_vec")
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("r_vec")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("doc_id", "rrf", F.col("rnk").cast("int").alias("rnk"))
    )


# --- product quantization -------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_DSUB = 8  # dims per subspace (8 x 8 = 64)
_PQ_K = 16  # centroids per subspace (vec_id < 16 as the codebook)
_PQ_QUERY = 42  # query vector id
_PQ_TOPK = 20


@register(
    "ann_product_quantization",
    oracle=f"""
    WITH cb AS (
        SELECT j.j, e.vec_id AS c,
               list_transform(range(1, {_PQ_DSUB} + 1),
                   i -> CAST(e.embedding[j.j * {_PQ_DSUB} + i] AS DOUBLE))
                 AS cent
        FROM embeddings e,
             (SELECT unnest(range(0, {_PQ_M})) AS j) j
        WHERE e.vec_id < {_PQ_K}
    ), enc AS (
        SELECT v.vec_id, cb.j, cb.c,
               ROUND(list_sum(list_transform(range(1, {_PQ_DSUB} + 1),
                   i -> (CAST(v.embedding[cb.j * {_PQ_DSUB} + i] AS DOUBLE)
                         - cb.cent[i])
                        * (CAST(v.embedding[cb.j * {_PQ_DSUB} + i] AS DOUBLE)
                           - cb.cent[i]))), 6) AS d2
        FROM embeddings v, cb
    ), coded AS (
        SELECT vec_id, j, c AS code
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id, j ORDER BY d2, c) AS rn
            FROM enc
        ) WHERE rn = 1
    ), q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = {_PQ_QUERY}
    ), adc AS (
        SELECT cb.j, cb.c,
               list_sum(list_transform(range(1, {_PQ_DSUB} + 1),
                   i -> (q.qv[cb.j * {_PQ_DSUB} + i] - cb.cent[i])
                        * (q.qv[cb.j * {_PQ_DSUB} + i] - cb.cent[i]))) AS qd
        FROM cb CROSS JOIN q
    ), approx AS (
        SELECT coded.vec_id, ROUND(SUM(adc.qd), 6) AS approx_d2
        FROM coded JOIN adc ON coded.j = adc.j AND coded.code = adc.c
        GROUP BY coded.vec_id
    )
    SELECT vec_id, approx_d2, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY approx_d2, vec_id) AS rnk
        FROM approx
    ) WHERE rnk <= {_PQ_TOPK}
    """,
    category="llm similarity (product quantization)",
    doc="Product-quantization ANN, the memory-bounded scale path "
    "past int8: the 64-dim space splits into 8 subspaces of 8 dims; "
    "a 16-centroid codebook per subspace (vectors 0..15 as the "
    "deterministic 'trained' codebook) encodes every vector as 8 "
    "nibbles (4 bytes/vector — 64x smaller than float32), and the "
    "query scans codes with an 8x16 asymmetric-distance lookup "
    "table instead of touching raw vectors. Encoding is one "
    "Arrow-batched numpy pass (mapInPandas) with the codebook as a "
    "task broadcast; per-subspace distances accumulate "
    "left-to-right (bit-identical to the oracle's list_sum) and "
    "round to 6 dp before the argmin, so codes — and the ADC "
    "top-20 — hash-match across engines. At 100 TB the code table "
    "is what sits in memory; this plan never shuffles the vectors "
    "at all (the only exchange is the final top-k).",
)
def ann_product_quantization_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    # null vectors cannot be encoded; one pushed-down filter protects
    # the codebook/query collects and every Arrow batch
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    # codebook + query: tiny driver-side collects (16 + 1 rows) — the
    # broadcast-query-set pattern
    cb_rows = (
        emb.filter(F.col("vec_id") < _PQ_K)
        # key-dedupe before the bounded collect: a replayed ingest
        # batch (at-least-once delivery) ships every vec_id twice,
        # and a [2K, d] codebook breaks the [n, K] distance kernel
        .dropDuplicates(["vec_id"])
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    codebook = np.array(
        [[float(x) for x in r["embedding"]] for r in cb_rows], dtype=np.float64
    )  # [K, 64]
    q_row = emb.filter(F.col("vec_id") == _PQ_QUERY).select("embedding").collect()
    if not cb_rows or not q_row:
        # no codebook rows / query vector absent: the search result
        # is empty, not an IndexError
        return spark.createDataFrame(
            [], "vec_id bigint, approx_d2 double, rnk int"
        )
    qv = np.array([float(x) for x in q_row[0]["embedding"]], dtype=np.float64)

    # ADC lookup table qd[j, c]: sequential accumulation to match the
    # oracle's list_sum evaluation order exactly
    qd = np.zeros((_PQ_M, _PQ_K), dtype=np.float64)
    for j in range(_PQ_M):
        for c in range(_PQ_K):
            acc = 0.0
            for i in range(_PQ_DSUB):
                diff = qv[j * _PQ_DSUB + i] - codebook[c, j * _PQ_DSUB + i]
                acc += diff * diff
            qd[j, c] = acc

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue  # empty Arrow batch from an empty partition
            X = np.array(
                [[float(x) for x in v] for v in pdf["embedding"]],
                dtype=np.float64,
            )  # [n, 64]
            total = np.zeros(len(pdf), dtype=np.float64)
            for j in range(_PQ_M):
                sub = X[:, j * _PQ_DSUB:(j + 1) * _PQ_DSUB]  # [n, 8]
                # sequential left-to-right accumulation per centroid —
                # bit-identical to DuckDB's list_sum over the same
                # float64-widened values (numpy pairwise summation
                # would diverge in the last ulp)
                d2 = np.zeros((len(pdf), _PQ_K), dtype=np.float64)
                for i in range(_PQ_DSUB):
                    diff = sub[:, i:i + 1] - codebook[None, :, j * _PQ_DSUB + i]
                    d2 += diff * diff
                d2 = np.round(d2, 6)
                codes = np.argmin(d2, axis=1)  # first min = lowest c
                total += qd[j, codes]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "approx_d2": np.round(total, 6),
                }
            )

    scored = emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id bigint, approx_d2 double"
    )
    w = Window.orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PQ_TOPK)
        .select("vec_id", "approx_d2", F.col("rnk").cast("int").alias("rnk"))
    )


# --- RAG index build ------------------------------------------------------

_RAG_BITS = 4
_RAG_SEED = "rag"
_RAG_CHUNK = 32
_RAG_STRIDE = 24
_RAG_MIN_TOKENS = 16


def _rag_bucket_duck(v: str) -> str:
    from aws_lakehouse_spark.llm.similarity import hyperplane_weight

    terms = []
    for b in range(_RAG_BITS):
        w = "[" + ", ".join(
            repr(hyperplane_weight(_RAG_SEED, b, d)) for d in range(64)
        ) + "]"
        # native dot: bitwise-identical to the interpreted fold and
        # ~3000x faster — the lambda shape re-materialized the
        # 64-element weight literal per row (r10; see llm_similarity)
        dot = f"list_dot_product({v}, {w}::DOUBLE[])"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
    return " + ".join(terms)


def _rag_oracle() -> str:
    return f"""
    WITH base AS (
        SELECT doc_id, len({_DUCK_TOKS}) AS n FROM documents
    ), chunks AS (
        SELECT doc_id,
               CAST(unnest(range(1, n + 1, {_RAG_STRIDE})) AS BIGINT)
                 AS chunk_start,
               n
        FROM base
    ), qualified AS (
        SELECT doc_id, chunk_start,
               LEAST({_RAG_CHUNK}, n - chunk_start + 1) AS n_chunk_tokens
        FROM chunks
        WHERE LEAST({_RAG_CHUNK}, n - chunk_start + 1) >= {_RAG_MIN_TOKENS}
    ), emb AS (
        SELECT vec_id,
               {_rag_bucket_duck('(embedding::DOUBLE[])')} AS bucket
        FROM embeddings
    )
    SELECT emb.bucket,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT q.doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(q.n_chunk_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(q.n_chunk_tokens), 6) AS avg_chunk_tokens
    FROM qualified q JOIN emb ON q.doc_id = emb.vec_id
    GROUP BY emb.bucket
    """


@register(
    "rag_index_pipeline",
    bench=True,
    oracle=_rag_oracle(),
    category="llm retrieval (composite)",
    doc="The RAG ingestion pipeline as ONE Catalyst plan: chunk "
    "documents (32-token windows, stride 24, JVM-side sequence "
    "explode — no shuffle), quality-gate short tail chunks, join "
    "each chunk to its document's embedding on the id key, assign "
    "the md5-seeded 4-bit hyperplane LSH bucket (the index "
    "partition a vector store would route queries to), and emit "
    "per-bucket index statistics. Chunking is scan-parallel; the "
    "chunk-embedding join is a plain equi-join (co-partitionable "
    "on doc id at scale, AQE picks broadcast when the embedding "
    "side fits); the only guaranteed exchange is the final "
    "bucket-count aggregate. Bucket balance from these stats is "
    "what decides whether the index needs more bits.",
)
def rag_index_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.similarity import hyperplane_signature

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    base = docs.select("doc_id", F.size(toks).alias("n"))
    starts = F.sequence(F.lit(1), F.col("n"), F.lit(_RAG_STRIDE))
    chunk_len = F.least(
        F.lit(_RAG_CHUNK), F.col("n") - F.col("chunk_start") + 1
    )
    qualified = (
        base.select(
            "doc_id",
            F.explode(starts).alias("start_i"),
            "n",
        )
        .withColumn("chunk_start", F.col("start_i").cast("bigint"))
        .withColumn("n_chunk_tokens", chunk_len)
        .filter(F.col("n_chunk_tokens") >= _RAG_MIN_TOKENS)
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        hyperplane_signature(
            "CAST(embedding AS ARRAY<DOUBLE>)", 64,
            bits=_RAG_BITS, seed=_RAG_SEED,
        ).alias("bucket"),
    )
    return (
        qualified.join(emb, "doc_id")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("n_chunk_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_chunk_tokens"), 6).alias("avg_chunk_tokens"),
        )
    )


# --- IVF + PQ (IVFADC) ----------------------------------------------------

_IVFPQ_CELLS = 4  # coarse inverted lists (vec_ids 16..19 as centroids)
_IVFPQ_NPROBE = 2
_IVFPQ_TOPK = 10


@register(
    "ann_ivf_pq",
    bench=True,
    oracle=f"""
    WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cells AS (
        SELECT CAST(vec_id - 15 AS INTEGER) AS cell_id, v AS cent
        FROM c WHERE vec_id >= 16 AND vec_id < {16 + _IVFPQ_CELLS}
    ), assigned AS (
        SELECT vec_id, cell_id FROM (
            SELECT c.vec_id, s.cell_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY ROUND({{cos_vc}}, 6) DESC, s.cell_id) AS rn
            FROM c, cells s
        ) WHERE rn = 1
    ), probes AS (
        SELECT cell_id FROM (
            SELECT s.cell_id,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND({{cos_qc}}, 6) DESC, s.cell_id) AS rn
            FROM (SELECT v FROM c WHERE vec_id = {_PQ_QUERY}) q, cells s
        ) WHERE rn <= {_IVFPQ_NPROBE}
    ), cand AS (
        SELECT a.vec_id FROM assigned a
        JOIN probes p ON p.cell_id = a.cell_id
        WHERE a.vec_id != {_PQ_QUERY}
    ), cb AS (
        SELECT j.j, e.vec_id AS cc,
               list_transform(range(1, {_PQ_DSUB} + 1),
                   i -> CAST(e.embedding[j.j * {_PQ_DSUB} + i] AS DOUBLE))
                 AS cent
        FROM embeddings e,
             (SELECT unnest(range(0, {_PQ_M})) AS j) j
        WHERE e.vec_id < {_PQ_K}
    ), enc AS (
        SELECT v.vec_id, cb.j, cb.cc,
               ROUND(list_sum(list_transform(range(1, {_PQ_DSUB} + 1),
                   i -> (CAST(v.embedding[cb.j * {_PQ_DSUB} + i] AS DOUBLE)
                         - cb.cent[i])
                        * (CAST(v.embedding[cb.j * {_PQ_DSUB} + i] AS DOUBLE)
                           - cb.cent[i]))), 6) AS d2
        FROM embeddings v, cb
        WHERE v.vec_id IN (SELECT vec_id FROM cand)
    ), coded AS (
        SELECT vec_id, j, cc AS code
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id, j ORDER BY d2, cc) AS rn
            FROM enc
        ) WHERE rn = 1
    ), q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = {_PQ_QUERY}
    ), adc AS (
        SELECT cb.j, cb.cc,
               list_sum(list_transform(range(1, {_PQ_DSUB} + 1),
                   i -> (q.qv[cb.j * {_PQ_DSUB} + i] - cb.cent[i])
                        * (q.qv[cb.j * {_PQ_DSUB} + i] - cb.cent[i]))) AS qd
        FROM cb CROSS JOIN q
    ), approx AS (
        SELECT coded.vec_id, ROUND(SUM(adc.qd), 6) AS approx_d2
        FROM coded JOIN adc ON coded.j = adc.j AND coded.code = adc.cc
        GROUP BY coded.vec_id
    )
    SELECT vec_id, approx_d2, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY approx_d2, vec_id) AS rnk
        FROM approx
    ) WHERE rnk <= {_IVFPQ_TOPK}
    """.replace(
        "{cos_vc}", _duck_cos("c.v", "s.cent")
    ).replace(
        "{cos_qc}", _duck_cos("q.v", "s.cent")
    ),
    category="llm similarity (IVF + product quantization)",
    doc="The full FAISS-IVFADC retrieval shape: a 4-cell coarse "
    "quantizer routes the query to its nprobe=2 nearest inverted "
    "lists, and ONLY those cells' vectors are scored — by the 8x16 "
    "PQ asymmetric-distance lookup table, never the raw floats. "
    "Composes the engine's IVF (cell assignment as a broadcast-"
    "centroid argmax, candidates via an int equi-join) with its PQ "
    "(4-byte codes, sequential-accumulation encode in Arrow "
    "batches, bit-identical to the oracle's list_sum): candidate "
    "work drops to ~nprobe/cells of the corpus AND the scan reads "
    "codes 64x smaller than the vectors. Non-residual PQ (codes "
    "quantize raw vectors, not cell residuals) keeps one codebook "
    "shared across cells — the memory layout that lets the code "
    "table live executor-resident at 100 TB. Deterministic "
    "'trained' structures: codebook = vectors 0..15, coarse "
    "centroids = vectors 16..19.",
)
def ann_ivf_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from aws_lakehouse_spark.llm.similarity import (
        cosine_ratio_col,
        dot_col,
        norm_col,
    )

    # null vectors cannot be assigned or encoded; one pushed-down
    # filter protects the codebook/query collects and every batch
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )

    cells = (
        emb.filter(
            (F.col("vec_id") >= 16) & (F.col("vec_id") < 16 + _IVFPQ_CELLS)
        )
        .select(
            (F.col("vec_id") - 15).cast("int").alias("cell_id"),
            F.col("embedding").cast("array<double>").alias("cent"),
        )
        # per-side norms hoisted out of the per-pair cosine (same
        # bits, one HOF dot per pair instead of three)
        .withColumn("__cn", norm_col("cent"))
    )

    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("__vn", norm_col("v"))
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.asc("cell_id")
    )
    assigned = (
        v.crossJoin(F.broadcast(cells))
        .withColumn(
            "sim",
            F.round(
                cosine_ratio_col(
                    dot_col("v", "cent"),
                    F.col("__vn"),
                    F.col("__cn"),
                ),
                6,
            ),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id")
    )

    q_vec = v.filter(F.col("vec_id") == _PQ_QUERY).select(
        F.col("v").alias("qv"), F.col("__vn").alias("__qn")
    )
    probes = (
        q_vec.crossJoin(F.broadcast(cells))
        .withColumn(
            "sim",
            F.round(
                cosine_ratio_col(
                    dot_col("qv", "cent"),
                    F.col("__qn"),
                    F.col("__cn"),
                ),
                6,
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("sim"), F.asc("cell_id"))),
        )
        .filter(F.col("rn") <= _IVFPQ_NPROBE)
        .select("cell_id")
    )

    cand = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != _PQ_QUERY)
        .select("vec_id")
    )

    # codebook + query: tiny driver-side collects (16 + 1 rows)
    cb_rows = (
        emb.filter(F.col("vec_id") < _PQ_K)
        # key-dedupe: replayed batches must not double the codebook
        .dropDuplicates(["vec_id"])
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    codebook = np.array(
        [[float(x) for x in r["embedding"]] for r in cb_rows],
        dtype=np.float64,
    )
    q_row = (
        emb.filter(F.col("vec_id") == _PQ_QUERY).select("embedding").collect()
    )
    if not cb_rows or not q_row:
        # no codebook rows / query vector absent: the search result
        # is empty, not an IndexError
        return spark.createDataFrame(
            [], "vec_id bigint, approx_d2 double, rnk int"
        )
    qv = np.array(
        [float(x) for x in q_row[0]["embedding"]], dtype=np.float64
    )

    qd = np.zeros((_PQ_M, _PQ_K), dtype=np.float64)
    for j in range(_PQ_M):
        for cc in range(_PQ_K):
            acc = 0.0
            for i in range(_PQ_DSUB):
                diff = qv[j * _PQ_DSUB + i] - codebook[cc, j * _PQ_DSUB + i]
                acc += diff * diff
            qd[j, cc] = acc

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(
                [[float(x) for x in vv] for vv in pdf["embedding"]],
                dtype=np.float64,
            )
            total = np.zeros(len(pdf), dtype=np.float64)
            for j in range(_PQ_M):
                sub = X[:, j * _PQ_DSUB:(j + 1) * _PQ_DSUB]
                d2 = np.zeros((len(pdf), _PQ_K), dtype=np.float64)
                for i in range(_PQ_DSUB):
                    diff = (
                        sub[:, i:i + 1]
                        - codebook[None, :, j * _PQ_DSUB + i]
                    )
                    d2 += diff * diff
                d2 = np.round(d2, 6)
                codes = np.argmin(d2, axis=1)
                total += qd[j, codes]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "approx_d2": np.round(total, 6),
                }
            )

    scored = (
        emb.select("vec_id", "embedding")
        .join(cand, "vec_id")
        .mapInPandas(encode, "vec_id bigint, approx_d2 double")
    )
    w = Window.orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _IVFPQ_TOPK)
        .select("vec_id", "approx_d2", F.col("rnk").cast("int").alias("rnk"))
    )
