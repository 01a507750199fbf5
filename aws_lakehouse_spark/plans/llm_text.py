"""Text-analysis query surface (LLM training-data ops).

Every query is a pure scan+project over ``documents`` — no shuffle —
and each is oracle-checked: integer-ratio features divide exact ints
so the doubles are bit-identical across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.llm.text import (
    BPE_ISH_PATTERN,
    DEFAULT_STOPWORDS,
    LANGUAGE_PROFILES,
    language_scores,
    quality_features,
    token_count,
    tokens_col,
)
from aws_lakehouse_spark.registry import register

# DuckDB fragment: distinct 3-token shingles of `text` (1-based lists)
DUCK_TOKS = "str_split(text, ' ')"
DUCK_SHINGLES = (
    "list_distinct(list_transform("
    f"range(1, greatest(len({DUCK_TOKS}) - 2, 1) + 1), "
    f"i -> {DUCK_TOKS}[i] || ' ' || {DUCK_TOKS}[i+1] || ' ' || {DUCK_TOKS}[i+2]))"
)


def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({DUCK_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(list_distinct({DUCK_TOKS})) AS BIGINT)
             AS n_distinct_tokens
    FROM documents
    """,
    category="llm text",
    doc="Token counting: whitespace, BPE-ish regex, distinct.",
    bench=True,
)
def text_token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        token_count(text).alias("n_tokens"),
        token_count(text, BPE_ISH_PATTERN).alias("n_bpe_tokens"),
        F.size(F.array_distinct(tokens_col(text)))
        .cast("bigint")
        .alias("n_distinct_tokens"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len({DUCK_TOKS}) AS BIGINT) AS n_tokens,
           length(regexp_replace(text, '\\s+', '', 'g'))
             / greatest(len({DUCK_TOKS}), 1) AS avg_token_len,
           len(list_filter({DUCK_TOKS},
               t -> t IN ({_sql_in_list(DEFAULT_STOPWORDS)})))
             / greatest(len({DUCK_TOKS}), 1) AS stopword_ratio,
           len(list_distinct({DUCK_TOKS}))
             / greatest(len({DUCK_TOKS}), 1) AS distinct_ratio
    FROM documents
    """,
    category="llm text",
    doc="Quality-scoring features: token count, mean token length, "
    "stopword ratio, repetition (distinct-token) ratio.",
)
def text_quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])


def _lang_oracle() -> str:
    score_exprs = []
    for lang in LANGUAGE_PROFILES:
        words = _sql_in_list(tuple(LANGUAGE_PROFILES[lang]))
        score_exprs.append(
            f"len(list_filter({DUCK_TOKS}, t -> t IN ({words})))"
            f" / greatest(len({DUCK_TOKS}), 1) AS score_{lang}"
        )
    langs = sorted(LANGUAGE_PROFILES)
    gmax = f"greatest({', '.join('score_' + l for l in langs)})"
    case = "CASE " + " ".join(
        f"WHEN score_{l} = {gmax} THEN '{l}'" for l in langs
    ) + " ELSE 'unknown' END"
    return f"""
    WITH scored AS (
        SELECT doc_id, lang, {', '.join(score_exprs)} FROM documents
    )
    SELECT doc_id, lang, score_en, score_fr, score_de,
           {case} AS lang_pred
    FROM scored
    """


@register(
    "text_lang_id",
    oracle=_lang_oracle(),
    category="llm text",
    doc="Language-ID heuristic: per-language stopword-hit ratios, "
    "argmax with deterministic (code-order) tie-break; the `lang` "
    "column rides along for downstream accuracy eval.",
)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = language_scores(F.col("text"))
    return docs.select(
        "doc_id", "lang", *[c.alias(n) for n, c in scores.items()]
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(text) AS doc_fp,
           list_min(list_transform({DUCK_SHINGLES}, s -> md5(s)))
             AS min_shingle_fp
    FROM documents
    """,
    category="llm text",
    doc="Document fingerprinting: whole-document digest + minimum "
    "shingle digest (rolling-hash-style winnowing representative).",
)
def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.dedup import shingles_col

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("doc_fp"),
        F.array_min(
            F.transform(shingles_col(F.col("text"), 3), lambda s: F.md5(s))
        ).alias("min_shingle_fp"),
    )
