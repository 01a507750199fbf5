"""Multimodal query surface (binary columns + typed metadata).

The payload bytes are deterministic (utf-8 of the document text), so
metadata and even the Arrow-batched ``mapInPandas`` feature extractor
are oracle-checkable — the oracle recomputes the same features
arithmetically from the text.

``media_image_decode`` / ``media_audio_decode`` run the REAL codecs
(pure-stdlib PNG inflate+defilter, RIFF/WAV frame read — see
``llm.codecs``) over deterministic generated payloads; their oracles
are literal VALUES computed at registration time from the same
encode parameters, so the driver verifies the distributed
decode-through-Arrow path byte-for-byte.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.llm.codecs import png_encode, wav_encode
from aws_lakehouse_spark.llm.multimodal import (
    attach_media_columns,
    extract_features,
    frame_sample_plan,
)
from aws_lakehouse_spark.registry import register


def _image_fixture() -> list[tuple[int, bytes, int, int]]:
    """24 deterministic gradient PNGs: (media_id, png_bytes, w, h)."""
    out = []
    for i in range(24):
        w, h = 16 + i, 8 + (i % 5)

        def px(x: int, y: int, i: int = i) -> tuple[int, int, int]:
            return ((x * 7 + i) % 256, (y * 11 + i) % 256, (x + y + i) % 256)

        out.append((i, png_encode(w, h, px), w, h))
    return out


def _audio_fixture() -> list[tuple[int, bytes]]:
    """12 deterministic 16-bit PCM WAVs."""
    out = []
    for i in range(12):
        rate = 8000 + 1000 * (i % 4)
        n = 500 + 100 * i

        def amp(j: int, i: int = i) -> int:
            return ((j * 97 + i * 13) % 2000) - 1000

        out.append((i, wav_encode(n, rate, amp, n_channels=1 + (i % 2))))
    return out


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


def _image_decode_oracle() -> str:
    from aws_lakehouse_spark.llm.codecs import png_decode

    rows = []
    for i, png, w, h in _image_fixture():
        d = png_decode(png)
        assert (d["width"], d["height"]) == (w, h)
        # quote the float: DuckDB types a bare decimal literal as
        # DECIMAL (quantized) before any DOUBLE cast; a string parses
        # straight to the correctly-rounded double
        rows.append(
            f"({i}, {d['width']}, {d['height']}, {d['channels']}, "
            f"'{d['mean_pixel']!r}')"
        )
    values = ",\n        ".join(rows)
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(channels AS INTEGER) AS channels,
           CAST(mean_pixel AS DOUBLE) AS mean_pixel
    FROM (VALUES
        {values}
    ) t(media_id, width, height, channels, mean_pixel)
    """


@register(
    "media_image_decode",
    oracle=_image_decode_oracle(),
    category="llm multimodal",
    doc="REAL image decode over Arrow batches: 24 generated gradient "
    "PNGs flow through mapInPandas into the pure-stdlib PNG decoder "
    "(zlib inflate + scanline defilter); width/height/channels and "
    "the mean of the decoded pixel bytes are oracle-checked against "
    "values derived from the encode parameters. The codec is the "
    "real path a production deployment extends with PIL/ffmpeg.",
    bench=True,
)
def media_image_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import extract_image_features

    rows = [(i, bytearray(png)) for i, png, _, _ in _image_fixture()]
    # size the Arrow-decode partitions to the FIXTURE (~6 payloads per
    # task), not to defaultParallelism: 24 tiny PNGs sliced 24-32 ways
    # pay one Python-worker round trip per image — measured 0.73 s at
    # local[32] vs 0.39 s at local[8] (the bench's one anti-scaling
    # query, r11 verdict item 7); 4 slices read 0.28-0.33 s at BOTH
    # core counts. At production scale media arrives from parquet
    # splits, so this literal-fixture sizing has no cluster analog.
    media = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, len(rows) // 6)),
        "media_id bigint, content binary",
    )
    return extract_image_features(media)


def _audio_decode_oracle() -> str:
    from aws_lakehouse_spark.llm.codecs import wav_decode

    rows = []
    for i, wav in _audio_fixture():
        d = wav_decode(wav)
        rows.append(
            f"({i}, {d['n_channels']}, {d['framerate']}, {d['n_frames']}, "
            f"{d['duration_ms']}, {d['peak_amplitude']})"
        )
    values = ",\n        ".join(rows)
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(n_channels AS INTEGER) AS n_channels,
           CAST(framerate AS INTEGER) AS framerate,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(duration_ms AS BIGINT) AS duration_ms,
           CAST(peak_amplitude AS INTEGER) AS peak_amplitude
    FROM (VALUES
        {values}
    ) t(media_id, n_channels, framerate, n_frames, duration_ms,
        peak_amplitude)
    """


@register(
    "media_audio_decode",
    oracle=_audio_decode_oracle(),
    category="llm multimodal",
    doc="REAL audio decode over Arrow batches: generated 16-bit PCM "
    "WAVs flow through mapInPandas into the stdlib RIFF parser; "
    "header fields plus peak amplitude computed from the actual "
    "samples are oracle-checked.",
)
def media_audio_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import extract_audio_features

    rows = [(i, bytearray(wav)) for i, wav in _audio_fixture()]
    # same fixture-sized slicing as media_image_decode_q (one Python
    # worker round trip per payload otherwise)
    media = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, len(rows) // 6)),
        "media_id bigint, content binary",
    )
    return extract_audio_features(media)


def _image_resize_oracle() -> str:
    """Analytic oracle: the NN-resampled mean is recomputed in SQL
    from the gradient encode formula over the exact integer source
    grid ``src = (out_idx * src_dim) // out_dim`` — fully independent
    of the Python codec path it checks."""
    dims = ", ".join(f"({i}, {16 + i}, {8 + (i % 5)})" for i in range(24))
    return f"""
    WITH imgs(media_id, w, h) AS (VALUES {dims}),
    d AS (
        SELECT media_id, w, h,
               CAST(ROUND(w * LEAST(1.0, 12.0 / GREATEST(w, h)))
                    AS INTEGER) AS out_w,
               CAST(ROUND(h * LEAST(1.0, 12.0 / GREATEST(w, h)))
                    AS INTEGER) AS out_h
        FROM imgs
    ), xs AS (
        SELECT d.*, unnest(range(0, out_w)) AS xo FROM d
    ), ys AS (
        SELECT xs.*, unnest(range(0, out_h)) AS yo FROM xs
    ), px AS (
        SELECT media_id, w, h, out_w, out_h,
               (xo * w) // out_w AS sx,
               (yo * h) // out_h AS sy
        FROM ys
    )
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(w AS INTEGER) AS src_width,
           CAST(h AS INTEGER) AS src_height,
           CAST(out_w AS INTEGER) AS out_width,
           CAST(out_h AS INTEGER) AS out_height,
           SUM((sx * 7 + media_id) % 256
               + (sy * 11 + media_id) % 256
               + (sx + sy + media_id) % 256)
             / (out_w * out_h * 3.0) AS out_mean_pixel
    FROM px
    GROUP BY media_id, w, h, out_w, out_h
    ORDER BY media_id
    """


@register(
    "media_image_resize",
    oracle=_image_resize_oracle(),
    category="llm multimodal",
    doc="REAL image resize over Arrow batches: each gradient PNG is "
    "decoded (zlib inflate + defilter), nearest-neighbor-resampled "
    "to fit max_side=12 with exact integer source indices, "
    "re-encoded, and re-decoded; the mean of the emitted payload's "
    "pixels is checked against a fully independent SQL oracle that "
    "recomputes the same mean from the encode formula over the NN "
    "source grid.",
)
def media_image_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import resize_images

    rows = [(i, bytearray(png)) for i, png, _, _ in _image_fixture()]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    return (
        resize_images(media, max_side=12)
        .drop("out_size_bytes")
        .orderBy("media_id")
    )


def _dhash_fixture() -> list[tuple[int, bytes]]:
    """20 sawtooth-patterned PNGs + a 2× NN-upscaled clone of every
    4th one: the clones are byte-different, resolution-different
    files whose 9×8 luma downsample grid is IDENTICAL to their base
    (``floor(floor(2xw/9)/2) == floor(xw/9)``), i.e. true visual
    duplicates. Monotone gradients are useless here — dHash of any
    monotone image is all-zero — so the pattern wraps mod 256 at
    short periods to put rising and falling luma edges everywhere.
    """
    out = []
    for i in range(20):
        w, h = 24 + i, 16 + (i % 7)

        def px(x: int, y: int, i: int = i) -> tuple[int, int, int]:
            return (
                (x * 73 + y * 29 + i * 11) % 256,
                (x * 151 + i * 7) % 256,
                (y * 97 + x * 13 + i * 3) % 256,
            )

        out.append((i, png_encode(w, h, px)))
        if i % 4 == 0:

            def px2(x: int, y: int, px=px) -> tuple[int, int, int]:
                return px(x // 2, y // 2)

            out.append((100 + i, png_encode(2 * w, 2 * h, px2)))
    return out


def _dhash_expected() -> dict[int, str]:
    """Expected dHash per fixture id, computed straight from the
    pixel FORMULA in pure Python (no numpy, no PNG codec) — fully
    independent of the distributed decode-and-hash path it checks."""
    expected: dict[int, str] = {}
    for i in range(20):
        for mid, factor in ((i, 1), (100 + i, 2)) if i % 4 == 0 else ((i, 1),):
            w, h = (24 + i) * factor, (16 + (i % 7)) * factor
            xs = [(x * w) // 9 for x in range(9)]
            ys = [(y * h) // 8 for y in range(8)]
            val = 0
            for y in ys:
                row = []
                for x in xs:
                    sx, sy = x // factor, y // factor
                    r = (sx * 73 + sy * 29 + i * 11) % 256
                    g = (sx * 151 + i * 7) % 256
                    b = (sy * 97 + sx * 13 + i * 3) % 256
                    row.append((299 * r + 587 * g + 114 * b) // 1000)
                for j in range(8):
                    val = (val << 1) | (1 if row[j] > row[j + 1] else 0)
            expected[mid] = format(val, "016x")
    return expected


def _dhash_oracle() -> str:
    groups: dict[str, list[int]] = {}
    for mid, hx in _dhash_expected().items():
        groups.setdefault(hx, []).append(mid)
    rows = []
    for hx, mids in groups.items():
        mids.sort()
        rows.append(
            f"('{hx}', {min(mids)}, {len(mids)}, "
            f"'{','.join(str(m) for m in mids)}')"
        )
    values = ",\n        ".join(sorted(rows))
    return f"""
    SELECT dhash, CAST(keep_id AS BIGINT) AS keep_id,
           CAST(n_copies AS BIGINT) AS n_copies, member_ids
    FROM (VALUES
        {values}
    ) t(dhash, keep_id, n_copies, member_ids)
    """


@register(
    "media_image_dhash",
    oracle=_dhash_oracle(),
    category="llm multimodal",
    doc="Perceptual image dedup via 64-bit dHash: every PNG is "
    "decoded in Arrow batches, reduced to an integer-exact 9×8 "
    "luma grid, and hashed on horizontal luma edges; grouping on "
    "the hash clusters visually-identical images across different "
    "resolutions and byte encodings (the fixture plants 2× "
    "NN-upscaled clones, which collide with their base by the "
    "floor-composition identity). The dedup shuffle carries 8-byte "
    "hashes, never pixels — at 100 TB of images the grouping "
    "stage moves gigabytes, not the corpus. The oracle recomputes "
    "every expected hash from the pixel formula in pure Python, "
    "independent of the PNG codec and the numpy path.",
)
def media_image_dhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import image_dhash

    rows = [(i, bytearray(png)) for i, png in _dhash_fixture()]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    return (
        image_dhash(media)
        .groupBy("dhash")
        .agg(
            F.min("media_id").cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("media_id"))
            ).alias("member_ids"),
        )
    )


def _audio_silence_fixture() -> list[tuple[int, bytes, int, int, int]]:
    """10 mono WAVs with PLANTED leading/trailing silence; returns
    (id, wav, n, lead, trail) with the plant parameters."""
    out = []
    for i in range(10):
        rate = 8000
        n = 400 + 80 * i
        lead = 40 + 10 * i
        trail = 20 + 5 * i

        def amp(j: int, i: int = i, n: int = n, lead: int = lead,
                trail: int = trail) -> int:
            if j < lead or j >= n - trail:
                return 0
            # guaranteed non-silent body: magnitude >= 100
            return 100 + ((j * 31 + i * 7) % 1500)

        out.append((i, wav_encode(n, rate, amp), n, lead, trail))
    return out


def _audio_silence_oracle() -> str:
    """Analytic oracle: expected values computed from the PLANT
    parameters (not from decoding) — independent of the codec path."""
    rows = []
    for i, _wav, n, lead, trail in _audio_silence_fixture():
        ratio = (lead + trail) / n
        rows.append(
            f"({i}, {n}, {lead + trail}, {ratio!r}, "
            f"{lead * 1000 // 8000}, {trail * 1000 // 8000})"
        )
    values = ",\n        ".join(rows)
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_silent AS BIGINT) AS n_silent,
           CAST(silence_ratio AS DOUBLE) AS silence_ratio,
           CAST(leading_silence_ms AS BIGINT) AS leading_silence_ms,
           CAST(trailing_silence_ms AS BIGINT) AS trailing_silence_ms
    FROM (VALUES
        {values}
    ) t(media_id, n_frames, n_silent, silence_ratio,
        leading_silence_ms, trailing_silence_ms)
    """


@register(
    "media_audio_silence",
    oracle=_audio_silence_oracle(),
    category="llm multimodal",
    doc="Silence analysis over real PCM samples (Arrow batches): "
    "silent-frame ratio + leading/trailing silence durations — the "
    "trim/filter pass audio pipelines run before chunking. WAVs "
    "carry PLANTED silence spans, and the oracle derives expected "
    "values from the plant parameters alone, so a green row "
    "certifies encode → decode → frame analysis end-to-end against "
    "ground truth the codec never touched.",
)
def media_audio_silence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import extract_audio_silence

    rows = [(i, bytearray(wav)) for i, wav, _n, _l, _t in
            _audio_silence_fixture()]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    return extract_audio_silence(media)


def _image_histogram_oracle() -> str:
    """Expected histograms computed straight from the gradient pixel
    FORMULA (never decoded) — fully independent of the codec path."""
    rows = []
    for i, _png, w, h in _image_fixture():
        bins = {f"{c}{b}": 0 for c in "rgb" for b in range(4)}
        for y in range(h):
            for x in range(w):
                r, g, b = (x * 7 + i) % 256, (y * 11 + i) % 256, (x + y + i) % 256
                bins[f"r{r // 64}"] += 1
                bins[f"g{g // 64}"] += 1
                bins[f"b{b // 64}"] += 1
        vals = ", ".join(
            str(bins[f"{c}{b}"]) for c in "rgb" for b in range(4)
        )
        rows.append(f"({i}, {vals})")
    cols = ", ".join(f"{c}{b}" for c in "rgb" for b in range(4))
    casts = ",\n           ".join(
        f"CAST({c}{b} AS BIGINT) AS {c}{b}" for c in "rgb" for b in range(4)
    )
    values = ",\n        ".join(rows)
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           {casts}
    FROM (VALUES
        {values}
    ) t(media_id, {cols})
    """


@register(
    "media_image_histogram",
    oracle=_image_histogram_oracle(),
    category="llm multimodal",
    doc="Per-channel 4-bin intensity histograms over REAL decoded "
    "pixels (64-wide bins, numpy bincount per Arrow batch) — the "
    "distribution fingerprint curation uses to drop washed-out or "
    "black frames. The oracle computes expected counts from the "
    "gradient pixel FORMULA, never from the decoder, so a green row "
    "certifies encode → decode → binning against independent ground "
    "truth.",
)
def media_image_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import extract_image_histograms

    rows = [(i, bytearray(png)) for i, png, _w, _h in _image_fixture()]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    return extract_image_histograms(media)


@register(
    "media_scene_cuts",
    oracle="""
    WITH v AS (
        SELECT doc_id AS media_id,
               CAST(strlen(text) % 120 + 8 AS INTEGER) AS n_frames
        FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
        SELECT media_id, n_frames,
               unnest(range(0, n_frames)) AS idx
        FROM v
    ),
    lum AS (
        SELECT media_id, n_frames, idx,
               ('0x' || substr(
                   md5(media_id || ':' || idx), 1, 4
               ))::BIGINT % 256 AS y
        FROM frames
    ),
    diffs AS (
        SELECT media_id, n_frames, idx,
               abs(y - LAG(y) OVER (
                   PARTITION BY media_id ORDER BY idx
               )) AS d
        FROM lum
    )
    SELECT media_id,
           MAX(n_frames) AS n_frames,
           CAST(COUNT(*) FILTER (d >= 96) AS BIGINT) AS n_cuts,
           CAST(MIN(CASE WHEN d >= 96 THEN idx END) AS BIGINT)
             AS first_cut
    FROM diffs
    GROUP BY media_id
    """,
    category="llm multimodal",
    doc="Scene-cut detection over sampled video frames: per-frame "
    "luminance (deterministic md5-derived stand-in for the decoded "
    "frame statistic — the real decoder is the stubbed codec path, "
    "per the container's no-media-libs constraint), consecutive-"
    "frame delta via a lag window PARTITIONED BY media id, cut where "
    "the delta clears the threshold. The Spark-side plumbing is the "
    "real thing: frame explosion bounded by frame count, per-video "
    "window (one shuffle on media_id, frames-sized partitions), "
    "grouped cut summary — swap the luminance expr for the decoder "
    "UDF and the plan is production scene segmentation.",
)
def media_scene_cuts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    v = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"),
        (F.length("text") % 120 + 8).cast("int").alias("n_frames"),
    )
    frames = v.select(
        "media_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias(
            "idx"
        ),
    )
    lum = frames.withColumn(
        "y",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("media_id").cast("string"),
                        F.lit(":"),
                        F.col("idx").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 256,
    )
    w = Window.partitionBy("media_id").orderBy("idx")
    diffs = lum.withColumn(
        "d", F.abs(F.col("y") - F.lag("y").over(w))
    )
    return diffs.groupBy("media_id").agg(
        F.max("n_frames").alias("n_frames"),
        F.count(F.when(F.col("d") >= 96, F.lit(1)))
        .cast("bigint")
        .alias("n_cuts"),
        F.min(F.when(F.col("d") >= 96, F.col("idx")))
        .cast("bigint")
        .alias("first_cut"),
    )


def _neardup_fixture() -> list[tuple[int, bytes]]:
    """12 sawtooth-patterned base PNGs + a NEAR-duplicate variant of
    every even-indexed one: the variant re-encodes the same image
    with ONE sampled grid pixel's red channel shifted, so its 64-bit
    dHash differs from the base's by at most 2 bits (only the two
    horizontal gradients touching grid point (4, 3) can flip) —
    inside the hamming<=3 near-dup threshold — while unrelated bases
    differ by ~half their bits. Odd-indexed bases have no variant
    (negative cases: the query must NOT pair them)."""
    out = []
    for i in range(12):
        w, h = 24 + i, 16 + (i % 7)
        px4, py3 = (4 * w) // 9, (3 * h) // 8

        def px(x: int, y: int, i: int = i) -> tuple[int, int, int]:
            return (
                (x * 73 + y * 29 + i * 11) % 256,
                (x * 151 + i * 7) % 256,
                (y * 97 + x * 13 + i * 3) % 256,
            )

        out.append((i, png_encode(w, h, px)))
        if i % 2 == 0:

            def pxv(
                x: int, y: int, px=px, px4: int = px4, py3: int = py3
            ) -> tuple[int, int, int]:
                r, g, b = px(x, y)
                if (x, y) == (px4, py3):
                    r = (r + 128) % 256
                return (r, g, b)

            out.append((200 + i, png_encode(w, h, pxv)))
    return out


def _neardup_expected_hashes() -> dict[int, int]:
    """dHash per near-dup fixture id from the pixel FORMULA (pure
    Python, codec-independent)."""
    hashes: dict[int, int] = {}
    for i in range(12):
        w, h = 24 + i, 16 + (i % 7)
        px4, py3 = (4 * w) // 9, (3 * h) // 8
        for mid, perturb in ((i, False),) + (
            ((200 + i, True),) if i % 2 == 0 else ()
        ):
            xs = [(x * w) // 9 for x in range(9)]
            ys = [(y * h) // 8 for y in range(8)]
            val = 0
            for y in ys:
                row = []
                for x in xs:
                    r = (x * 73 + y * 29 + i * 11) % 256
                    g = (x * 151 + i * 7) % 256
                    b = (y * 97 + x * 13 + i * 3) % 256
                    if perturb and (x, y) == (px4, py3):
                        r = (r + 128) % 256
                    row.append((299 * r + 587 * g + 114 * b) // 1000)
                for j in range(8):
                    val = (val << 1) | (1 if row[j] > row[j + 1] else 0)
            hashes[mid] = val
    return hashes


def _neardup_oracle() -> str:
    """Expected near-dup pairs via the SAME band+verify contract run
    in pure Python over the formula-derived hashes."""
    hashes = _neardup_expected_hashes()
    ids = sorted(hashes)
    pairs = []
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ha, hb = hashes[a], hashes[b]
            # candidates: share at least one 16-bit band
            shares = any(
                ((ha >> (16 * k)) & 0xFFFF) == ((hb >> (16 * k)) & 0xFFFF)
                for k in range(4)
            )
            ham = bin(ha ^ hb).count("1")
            if shares and ham <= 3:
                pairs.append(f"({a}, {b}, {ham})")
    values = ",\n        ".join(sorted(pairs))
    return f"""
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(hamming AS BIGINT) AS hamming
    FROM (VALUES
        {values}
    ) t(id_a, id_b, hamming)
    """


@register(
    "media_image_neardup",
    oracle=_neardup_oracle(),
    category="llm multimodal",
    doc="Perceptual image NEAR-dedup: 64-bit dHash per PNG (Arrow "
    "batches), 4x16-bit band bucketing for candidates (pigeonhole: "
    "any pair within hamming 3 shares at least one exact band), "
    "then exact hamming distance as pure built-in expressions "
    "(conv/xor/bit_count per 16-bit chunk) with a <=3 cut — the "
    "scaled-image/recompression dedup exact hashing misses. The "
    "fixture plants one-grid-pixel-perturbed variants (<=2 bits "
    "flipped by construction) beside untouched negatives; the "
    "oracle replays band+verify in pure Python over formula-derived "
    "hashes, independent of the codec and the join path. Scale "
    "shape: the banded equi-join moves 8-byte hashes, never pixels "
    "or an all-pairs product; band width is the recall/candidate "
    "knob exactly as in MinHash-LSH.",
)
def media_image_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import image_dhash

    rows = [(i, bytearray(png)) for i, png in _neardup_fixture()]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    hashed = image_dhash(media)
    # 4x16-bit bands straight off the hex string (4 hex chars each)
    bands = hashed.select(
        "media_id",
        "dhash",
        F.posexplode(
            F.array(
                *[F.substring("dhash", 1 + 4 * k, 4) for k in range(4)]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    ham = sum(
        F.bit_count(
            F.conv(F.substring("ha", 1 + 4 * k, 4), 16, 10).cast("long")
            .bitwiseXOR(
                F.conv(F.substring("hb", 1 + 4 * k, 4), 16, 10).cast("long")
            )
        )
        for k in range(4)
    )
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


def _audio_loudness_oracle() -> str:
    """Analytic oracle: peak/RMS/dBFS recomputed from the PLANT
    amplitude formula in pure Python — the exact integer sum of
    squares feeds the identical sqrt/log10 the executors run, so the
    expected doubles are bit-equal without ever touching the codec."""
    import math

    rows = []
    for i, _wav, n, lead, trail in _audio_silence_fixture():
        amps = []
        for j in range(n):
            if j < lead or j >= n - trail:
                amps.append(0)
            else:
                amps.append(100 + ((j * 31 + i * 7) % 1500))
        ssq = sum(a * a for a in amps)
        peak = max(amps)
        rms = math.sqrt(ssq / n)
        dbfs = round(20.0 * math.log10(rms / 32768.0), 6)
        rows.append(f"({i}, {n}, {peak}, {round(rms, 6)!r}, {dbfs!r})")
    values = ",\n        ".join(rows)
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(peak_amp AS BIGINT) AS peak_amp,
           CAST(rms AS DOUBLE) AS rms,
           CAST(dbfs AS DOUBLE) AS dbfs
    FROM (VALUES
        {values}
    ) t(media_id, n_frames, peak_amp, rms, dbfs)
    """


@register(
    "media_audio_rms_loudness",
    oracle=_audio_loudness_oracle(),
    category="llm multimodal",
    doc="Loudness profiling over real PCM samples (Arrow batches): "
    "peak amplitude, RMS level, and dBFS vs int16 full scale — the "
    "normalization / too-quiet-clip gate audio pipelines apply "
    "before chunking. The squared-sample sum is exact integer "
    "arithmetic (order-free at any partitioning); the oracle "
    "recomputes peak/RMS/dBFS analytically from the planted "
    "amplitude formula, never decoding a byte, so a green row "
    "certifies encode → decode → loudness math against codec-"
    "independent ground truth.",
)
def media_audio_rms_loudness_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import extract_audio_loudness

    rows = [(i, bytearray(wav)) for i, wav, _n, _l, _t in
            _audio_silence_fixture()]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    return extract_audio_loudness(media)


def _media_curation_expected() -> list[tuple]:
    """The full curation pipeline recomputed in pure Python from the
    fixture pixel FORMULAS (no codec, no numpy): profile → quality
    gate → per-hash survivor. Returns survivor rows."""
    profiles = []
    for i in range(20):
        specs = [(i, 1)] + ([(100 + i, 2)] if i % 4 == 0 else [])
        for mid, factor in specs:
            w, h = (24 + i) * factor, (16 + (i % 7)) * factor
            total = 0
            for y in range(h):
                for x in range(w):
                    sx, sy = x // factor, y // factor
                    r = (sx * 73 + sy * 29 + i * 11) % 256
                    g = (sx * 151 + i * 7) % 256
                    b = (sy * 97 + sx * 13 + i * 3) % 256
                    total += (299 * r + 587 * g + 114 * b) // 1000
            profiles.append(
                {
                    "media_id": mid,
                    "width": w,
                    "height": h,
                    "n_pixels": w * h,
                    "mean_luma": round(total / (w * h), 6),
                    "dhash": _dhash_expected()[mid],
                }
            )
    gated = [p for p in profiles if p["n_pixels"] >= 500]
    by_hash: dict[str, list[dict]] = {}
    for p in gated:
        by_hash.setdefault(p["dhash"], []).append(p)
    rows = []
    for hx, members in by_hash.items():
        keep = min(members, key=lambda p: p["media_id"])
        rows.append(
            (
                keep["media_id"],
                hx,
                keep["width"],
                keep["height"],
                keep["mean_luma"],
                len(members),
            )
        )
    rows.sort()
    return rows


def _media_curation_oracle() -> str:
    values = ",\n        ".join(
        f"({mid}, '{hx}', {w}, {h}, {luma!r}, {n})"
        for mid, hx, w, h, luma, n in _media_curation_expected()
    )
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id, dhash,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(mean_luma AS DOUBLE) AS mean_luma,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM (VALUES
        {values}
    ) t(media_id, dhash, width, height, mean_luma, n_copies)
    """


@register(
    "media_curation_pipeline",
    oracle=_media_curation_oracle(),
    category="llm multimodal (composite pipeline)",
    doc="The image half of a training-data curation run as ONE "
    "Catalyst plan: decode-once profiling (dimensions + exact-"
    "integer mean luma + perceptual dHash in a single Arrow pass — "
    "payloads are never decoded twice), a quality gate (tiny "
    "images dropped BEFORE any shuffle, so rejected pixels never "
    "move), then perceptual near-dup resolution grouping on the "
    "8-byte hash with lowest-id survivorship. The gate composes "
    "with dedup the way real corpora need: a gated-out base image "
    "can lose its group's survivorship to its upscaled clone. The "
    "oracle replays profile → gate → survivor from the fixture "
    "pixel formulas in pure Python, independent of codec, numpy, "
    "and Spark — green means the whole composite, not one stage. "
    "At 100 TB the only exchange carries (8-byte hash, scalar "
    "profile) rows for gate-passing images; pixels stay in the "
    "scan stage.",
)
def media_curation_pipeline_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import decode_image_profile

    rows = [(i, bytearray(png)) for i, png in _dhash_fixture()]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    profile = decode_image_profile(media)
    gated = profile.filter(F.col("n_pixels") >= 500)
    survivors = (
        gated.groupBy("dhash")
        .agg(
            F.min_by(
                F.struct("media_id", "width", "height", "mean_luma"),
                F.col("media_id"),
            ).alias("keep"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
        .select(
            F.col("keep.media_id").alias("media_id"),
            "dhash",
            F.col("keep.width").alias("width"),
            F.col("keep.height").alias("height"),
            F.col("keep.mean_luma").alias("mean_luma"),
            "n_copies",
        )
        .orderBy("media_id")
    )
    return survivors


def _audio_curation_expected() -> list[tuple]:
    """Profile → gate → chunk plan replayed from the PLANT parameters
    in pure Python (never decoding): survivors pass the silence and
    loudness gates; chunks = ceil(frames / 160)."""
    import math

    rows = []
    for i, _wav, n, lead, trail in _audio_silence_fixture():
        amps = []
        for j in range(n):
            if j < lead or j >= n - trail:
                amps.append(0)
            else:
                amps.append(100 + ((j * 31 + i * 7) % 1500))
        ratio = (lead + trail) / n
        ssq = sum(a * a for a in amps)
        rms = math.sqrt(ssq / n)
        dbfs = round(20.0 * math.log10(rms / 32768.0), 6)
        if ratio <= 0.25 and dbfs > -40.0:
            rows.append(
                (i, n, round(ratio, 6), dbfs, -(-n // 160))
            )
    rows.sort()
    return rows


def _audio_curation_oracle() -> str:
    values = ",\n        ".join(
        f"({mid}, {n}, {ratio!r}, {dbfs!r}, {chunks})"
        for mid, n, ratio, dbfs, chunks in _audio_curation_expected()
    )
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(silence_ratio AS DOUBLE) AS silence_ratio,
           CAST(dbfs AS DOUBLE) AS dbfs,
           CAST(n_chunks AS BIGINT) AS n_chunks
    FROM (VALUES
        {values}
    ) t(media_id, n_frames, silence_ratio, dbfs, n_chunks)
    """


@register(
    "media_audio_curation_pipeline",
    oracle=_audio_curation_oracle(),
    category="llm multimodal (composite pipeline)",
    doc="The audio half of a training-data curation run as ONE "
    "Catalyst plan (companion to media_curation_pipeline's image "
    "half): a single Arrow decode pass profiles every clip (frames, "
    "silent-frame ratio, peak/RMS/dBFS — integer-exact "
    "accumulations), dead-air and too-quiet clips gate out BEFORE "
    "any downstream work (silence_ratio > 0.25 or dBFS <= -40 "
    "train nothing), and survivors get their 160-frame chunk plan. "
    "The oracle replays profile → gate → chunk from the planted "
    "amplitude formulas in pure Python — codec-independent ground "
    "truth for the whole composite. Payload bytes never leave the "
    "decode stage; everything downstream is scalar rows.",
)
def media_audio_curation_pipeline_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from aws_lakehouse_spark.llm.multimodal import decode_audio_profile

    rows = [(i, bytearray(wav)) for i, wav, _n, _l, _t in
            _audio_silence_fixture()]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    profile = decode_audio_profile(media)
    gated = profile.filter(
        (F.col("silence_ratio") <= 0.25) & (F.col("dbfs") > -40.0)
    )
    return (
        gated.select(
            "media_id",
            "n_frames",
            "silence_ratio",
            "dbfs",
            F.ceil(F.col("n_frames") / F.lit(160))
            .cast("bigint")
            .alias("n_chunks"),
        )
        .orderBy("media_id")
    )
