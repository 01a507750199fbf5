"""Multimodal query surface (binary columns + typed metadata).

The payload bytes are deterministic (utf-8 of the document text), so
metadata and even the Arrow-batched ``mapInPandas`` feature extractor
are oracle-checkable — the oracle recomputes the same features
arithmetically from the text. The codec itself is stubbed
(``llm.multimodal.decode_stub``); the Spark plumbing is real.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.llm.multimodal import (
    attach_media_columns,
    extract_features,
    frame_sample_plan,
)
from aws_lakehouse_spark.registry import register


@register(
    "media_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST((doc_id % 8) * 160 + 320 AS INTEGER) AS meta_width,
           CAST((doc_id % 8) * 90 + 180 AS INTEGER) AS meta_height,
           CAST(strlen(text) AS BIGINT) AS size_bytes
    FROM documents
    """,
    category="llm multimodal",
    doc="Metadata-only media query: the binary payload column is "
    "pruned at the parquet reader — 'list all videos' reads zero "
    "payload bytes.",
)
def media_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "text", "doc_id")
    return media.select(
        "media_id", "modality", "meta_width", "meta_height", "size_bytes"
    )


@register(
    "media_extract_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(strlen(text) AS BIGINT) AS size_bytes,
           CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_byte,
           CAST(list_sum(list_transform(range(1, strlen(text) + 1),
                i -> ascii(substring(text, i, 1)))) % 997 AS BIGINT)
             AS byte_sum_mod
    FROM documents
    """,
    category="llm multimodal",
    doc="Arrow-batched feature extraction over the binary payload "
    "(mapInPandas; decode step stubbed deterministically). The "
    "oracle recomputes the identical features from the text bytes.",
)
def media_extract_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "text", "doc_id")
    return extract_features(media)


@register(
    "media_frame_sample",
    oracle="""
    WITH v AS (
        SELECT doc_id AS media_id,
               CAST(strlen(text) % 120 + 8 AS INTEGER) AS n_frames
        FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id, n_frames,
           CAST((n_frames - 1) // 4 + 1 AS BIGINT) AS n_sampled,
           CAST(((n_frames - 1) // 4) * 4 AS INTEGER) AS last_sampled
    FROM v
    """,
    category="llm multimodal",
    doc="Frame-sampling plan for video payloads (every 4th frame): "
    "metadata-driven index derivation, no decode; summary scalars "
    "returned for the oracle check.",
)
def media_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "text", "doc_id")
    plan = frame_sample_plan(media, every_n=4)
    return plan.select(
        "media_id",
        "n_frames",
        F.size("sampled_frames").cast("bigint").alias("n_sampled"),
        F.element_at("sampled_frames", -1).cast("int").alias("last_sampled"),
    )


@register(
    "media_audio_chunks",
    oracle="""
    WITH a AS (
        SELECT doc_id AS media_id,
               CAST(strlen(text) * 4 AS BIGINT) AS n_samples
        FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id, n_samples,
           CAST((n_samples - 1) // 40000 + 1 AS BIGINT) AS n_chunks,
           CAST(((n_samples - 1) // 40000) * 40000 AS BIGINT)
             AS last_chunk_start
    FROM a
    """,
    category="llm multimodal",
    doc="Audio segmentation plan: overlapped chunk-start offsets "
    "(80k-sample chunks, 40k hop) derived from metadata only — the "
    "codec never runs for planning; summary scalars oracle-checked.",
)
def media_audio_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import audio_chunk_plan

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "text", "doc_id")
    plan = audio_chunk_plan(media)
    return plan.select(
        "media_id",
        "n_samples",
        F.size("chunk_starts").cast("bigint").alias("n_chunks"),
        F.element_at("chunk_starts", -1).alias("last_chunk_start"),
    )


@register(
    "media_resize_plan",
    oracle="""
    WITH img AS (
        SELECT doc_id AS media_id,
               CAST((doc_id % 8) * 160 + 320 AS INTEGER) AS src_width,
               CAST((doc_id % 8) * 90 + 180 AS INTEGER) AS src_height
        FROM documents WHERE doc_id % 3 = 0
    )
    SELECT media_id, src_width, src_height,
           ROUND(LEAST(1.0, 224.0 / GREATEST(src_width, src_height)), 6)
             AS scale,
           CAST(ROUND(src_width
                * LEAST(1.0, 224.0 / GREATEST(src_width, src_height)))
                AS INTEGER) AS out_width,
           CAST(ROUND(src_height
                * LEAST(1.0, 224.0 / GREATEST(src_width, src_height)))
                AS INTEGER) AS out_height
    FROM img
    """,
    category="llm multimodal",
    doc="Image resize plan: aspect-preserving fit-to-224 target "
    "dimensions from metadata only (no decode; upscale suppressed) "
    "— the planning half of a mapInPandas resample stage.",
)
def media_resize_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import resize_plan

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(docs, "text", "doc_id")
    return resize_plan(media, max_side=224)
