"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct alongside (modality, size, dims). The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signatures,
partition sizing — is real and tested. The codec step is real for
PNG and 16-bit-PCM WAV (pure-stdlib decoders in ``llm.codecs``:
header parse + zlib inflate + filter undo / RIFF frame read —
features come from actual pixel/sample bytes); PIL is used
opportunistically when importable for other image formats; payloads
in no decodable format fall back to ``decode_stub``, a clearly-
marked deterministic fake that keeps downstream shapes real.

Scale notes: binary payloads ride the scan; metadata-only queries
prune the payload column at the parquet reader (columnar), so
"list all 4k videos" never reads a byte of pixel data. Feature
extraction is ``mapInPandas`` over Arrow record batches —
per-partition vectorized, bounded memory via
``maxRecordsPerBatch``.

Corrupt-payload contract (every extractor below): a payload the
codec layer rejects — truncated bytes, wrong container magic,
zlib/chunk corruption, NULL cell, or an unsupported layout such as
a stereo clip in a mono pipeline — yields a row of NULL feature
values via :func:`_null_on_corrupt`, never an executor exception.
A 100 TB corpus WILL contain corrupt objects; one of them must
cost one NULL row, not a four-retry stage abort that kills the
job. Healthy payloads are byte-identical to the strict path, so
every oracle still verifies the real decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("content", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("size_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("size_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
    ]
)


def attach_media_columns(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from a text fixture: payload = utf-8 bytes
    of the text (deterministic), metadata derived from the id.

    In production this is the ingest step that pairs object-store
    payload reads with catalog metadata.
    """
    mid = F.col(id_col)
    return df.select(
        mid.alias("media_id"),
        F.when(mid % 3 == 0, "image")
        .when(mid % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        ((mid % 8) * 160 + 320).cast("int").alias("meta_width"),
        ((mid % 8) * 90 + 180).cast("int").alias("meta_height"),
        F.octet_length(F.col(text_col)).cast("bigint").alias("size_bytes"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB codec for payloads in no decodable format (e.g. the
    text-backed demo fixtures). This deterministic fake keeps every
    downstream shape real: it 'decodes' the payload into summary
    features. Real formats never reach it — see ``decode_image`` /
    ``decode_audio``."""
    return {
        "first_byte": payload[0] if payload else -1,
        "byte_sum_mod": sum(payload) % 997 if payload else -1,
    }


IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_pixel", DoubleType()),
    ]
)

AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("framerate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("peak_amplitude", IntegerType()),
    ]
)


def _null_on_corrupt(fn):
    """The corrupt-payload contract for Arrow-batched extractors:
    a payload the codec layer rejects (``ValueError`` — truncated
    bytes, wrong container magic, zlib/chunk corruption, or an
    unsupported layout like a stereo clip in a mono pipeline)
    decodes to ``None`` instead of raising out of the executor
    task. At 100 TB one corrupt object in a billion must cost one
    NULL feature row — never a stage abort after four task retries
    that takes the whole job with it. Healthy payloads are passed
    through untouched, so every oracle fixture's output is
    bit-identical. Only ``ValueError`` (the codec contract,
    ``llm.codecs``) is absorbed; programming errors still surface."""

    def safe(payload):
        if payload is None:  # NULL binary cell: nothing to decode
            return None
        try:
            return fn(payload)
        except ValueError:
            return None

    return safe


def _col(feats: pd.Series, key: str) -> pd.Series:
    """Column ``key`` from a series of decoded dicts; rows whose
    decode failed (None) yield NULL."""
    return feats.map(lambda d, k=key: None if d is None else d[k])


def decode_image(payload: bytes) -> dict:
    """REAL image decode. PNG → pure-stdlib decoder (header + zlib
    inflate + filter undo; features from actual pixel bytes). Other
    formats → PIL when importable. Raises on undecodable input."""
    from aws_lakehouse_spark.llm.codecs import png_decode

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decode(payload)
    try:  # pragma: no cover - PIL absent in this container
        import numpy as np
        from PIL import Image

        img = Image.open(__import__("io").BytesIO(payload))
        arr = np.asarray(img)
        return {
            "width": img.width,
            "height": img.height,
            "channels": arr.shape[2] if arr.ndim == 3 else 1,
            "mean_pixel": float(arr.mean()),
        }
    except ImportError:
        raise ValueError("payload is not PNG and PIL is unavailable")
    except Exception as e:  # pragma: no cover - PIL absent here
        # normalize PIL's UnidentifiedImageError/OSError zoo to the
        # codec contract so _null_on_corrupt sees one exception type
        raise ValueError(f"undecodable image payload: {e}") from e


def decode_audio(payload: bytes) -> dict:
    """REAL audio decode for RIFF/WAV via ``llm.codecs.wav_decode``."""
    from aws_lakehouse_spark.llm.codecs import wav_decode

    if payload[:4] != b"RIFF":
        raise ValueError("payload is not RIFF/WAV")
    return wav_decode(payload)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode over the binary column:
    each batch's payloads run through the PNG decoder; output rows
    carry actual width/height/channel counts and the mean of the
    decoded pixel samples."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_null_on_corrupt(decode_image))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": _col(feats, "width"),
                    "height": _col(feats, "height"),
                    "channels": _col(feats, "channels"),
                    "mean_pixel": _col(feats, "mean_pixel"),
                }
            )

    return media.mapInPandas(_extract, IMAGE_DECODE_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV decode: header fields + peak amplitude
    computed from the actual PCM samples."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_null_on_corrupt(decode_audio))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_channels": _col(feats, "n_channels"),
                    "framerate": _col(feats, "framerate"),
                    "n_frames": _col(feats, "n_frames"),
                    "duration_ms": _col(feats, "duration_ms"),
                    "peak_amplitude": _col(feats, "peak_amplitude"),
                }
            )

    return media.mapInPandas(_extract, AUDIO_DECODE_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    the stub decoder runs vectorized per batch. Output schema is
    fixed (FEATURE_SCHEMA) so Catalyst can plan downstream pruning.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["content"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "size_bytes": pdf["size_bytes"],
                    "first_byte": decoded.map(lambda d: d["first_byte"]),
                    "byte_sum_mod": decoded.map(lambda d: d["byte_sum_mod"]),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: derive the frame
    index list (metadata-driven, no decode) that a real sampler would
    extract. Pure expressions → runs JVM-side; the decode of each
    sampled frame would be a second ``mapInPandas`` like
    ``extract_features``."""
    n_frames = (F.col("size_bytes") % 120 + 8).cast("int")
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        n_frames.alias("n_frames"),
        F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)).alias(
            "sampled_frames"
        ),
    )


def audio_chunk_plan(
    media: DataFrame, chunk_samples: int = 80_000, hop_samples: int = 40_000
) -> DataFrame:
    """Audio segmentation plumbing: derive overlapped chunk-start
    offsets (50% hop by default) for each audio payload —
    metadata-driven, no decode, pure JVM expressions. A real
    pipeline feeds each (start, start+chunk) range to the codec in
    a follow-up ``mapInPandas`` exactly like ``extract_features``.
    The fake sample count (bytes × 4) stands in for the codec's
    header read, keeping every downstream shape real."""
    n_samples = (F.col("size_bytes") * 4).cast("bigint")
    return media.filter(F.col("modality") == "audio").select(
        "media_id",
        n_samples.alias("n_samples"),
        F.sequence(
            F.lit(0).cast("bigint"),
            n_samples - 1,
            F.lit(hop_samples).cast("bigint"),
        ).alias("chunk_starts"),
        F.lit(chunk_samples).cast("bigint").alias("chunk_len"),
    )


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Image resize plumbing: aspect-preserving target dimensions to
    fit ``max_side`` — metadata-only math, no decode (the actual
    pixel resample is a mapInPandas stage like ``extract_features``
    with the codec swapped in). Upscaling is suppressed (scale
    capped at 1.0) — training pipelines shrink, never inflate."""
    w = F.col("meta_width").cast("double")
    h = F.col("meta_height").cast("double")
    scale = F.least(F.lit(1.0), max_side / F.greatest(w, h))
    return media.filter(F.col("modality") == "image").select(
        "media_id",
        F.col("meta_width").alias("src_width"),
        F.col("meta_height").alias("src_height"),
        F.round(scale, 6).alias("scale"),
        F.round(w * scale).cast("int").alias("out_width"),
        F.round(h * scale).cast("int").alias("out_height"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_size_bytes", LongType()),
        StructField("out_mean_pixel", DoubleType()),
    ]
)


def _resize_one(payload: bytes, max_side: int) -> dict:
    """REAL nearest-neighbor resize: decode pixels, resample with
    integer source indices ``src = (out_idx * src_dim) // out_dim``
    (exact arithmetic — oracle-reproducible), re-encode as PNG, then
    re-decode the emitted payload so the reported features come from
    the bytes a downstream consumer would actually read."""
    import numpy as np

    from aws_lakehouse_spark.llm.codecs import (
        png_decode,
        png_decode_pixels,
        png_encode_bytes,
    )

    d = png_decode_pixels(payload)
    w, h, c = d["width"], d["height"], d["channels"]
    scale = min(1.0, float(max_side) / max(w, h))
    out_w = int(w * scale + 0.5)
    out_h = int(h * scale + 0.5)
    arr = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, c)
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    resized = arr[np.ix_(ys, xs)]
    out = png_encode_bytes(out_w, out_h, c, resized.tobytes())
    check = png_decode(out)
    return {
        "src_width": w,
        "src_height": h,
        "out_width": check["width"],
        "out_height": check["height"],
        "out_size_bytes": len(out),
        "out_mean_pixel": check["mean_pixel"],
    }


def resize_images(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Arrow-batched REAL image resize over the binary column: the
    executable half of ``resize_plan`` — per batch, each PNG payload
    is decoded, nearest-neighbor-resampled to fit ``max_side``
    (upscaling suppressed), re-encoded, and re-decoded for the
    reported output features."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(
                _null_on_corrupt(lambda b: _resize_one(b, max_side))
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    **{
                        k: _col(feats, k)
                        for k in (
                            "src_width",
                            "src_height",
                            "out_width",
                            "out_height",
                            "out_size_bytes",
                            "out_mean_pixel",
                        )
                    },
                }
            )

    return media.mapInPandas(_resize, RESIZE_SCHEMA)


def _decode_luma(payload: bytes):
    """Decode a PNG once to its integer luma plane
    (``(299r + 587g + 114b) // 1000`` — exact arithmetic, no float).
    Shared by the hash path and the profile path so a payload is
    never decoded twice."""
    import numpy as np

    from aws_lakehouse_spark.llm.codecs import png_decode_pixels

    d = png_decode_pixels(payload)
    w, h, c = d["width"], d["height"], d["channels"]
    arr = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, c)
    if c >= 3:
        a = arr.astype(np.int64)
        return (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    return arr[:, :, 0].astype(np.int64)


def _dhash_from_luma(luma, grid_w: int = 8, grid_h: int = 8) -> str:
    """64-bit difference hash of a decoded luma plane, 16 hex chars:
    nearest-neighbor downsample to a ``(grid_w+1) × grid_h`` grid
    with ``src = (out * src_dim) // out_dim`` indices, then a bit per
    cell: left luma > right neighbor. Integer-exact throughout, so
    the hash is platform-reproducible and invariant under exact k×
    NN upscaling (``floor(floor(k·x·w / 9) / k) == floor(x·w / 9)``)
    — a resized copy collides with its original by construction."""
    import numpy as np

    h, w = luma.shape
    xs = (np.arange(grid_w + 1) * w) // (grid_w + 1)
    ys = (np.arange(grid_h) * h) // grid_h
    g = luma[np.ix_(ys, xs)]
    bits = (g[:, :grid_w] > g[:, 1:]).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return format(val, "016x")


def _dhash_one(payload: bytes, grid_w: int = 8, grid_h: int = 8) -> str:
    """64-bit dHash of one PNG payload: decode → luma → grid hash
    (see :func:`_decode_luma` / :func:`_dhash_from_luma`)."""
    return _dhash_from_luma(_decode_luma(payload), grid_w, grid_h)


def image_dhash(media: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing: (media_id, dhash) per image.

    The hash is 8 bytes per image regardless of resolution — the
    shuffle that groups duplicates moves hashes, never pixels."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pdf["content"].map(
                        _null_on_corrupt(lambda b: _dhash_one(bytes(b)))
                    ),
                }
            )

    return media.mapInPandas(
        _hash,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("dhash", StringType()),
            ]
        ),
    )


AUDIO_SILENCE_SCHEMA = (
    "media_id bigint, n_frames bigint, n_silent bigint, "
    "silence_ratio double, leading_silence_ms bigint, "
    "trailing_silence_ms bigint"
)


def extract_audio_silence(
    media: DataFrame, threshold: int = 50
) -> DataFrame:
    """Silence analysis over mono 16-bit WAV payloads (Arrow
    batches): per clip, the silent-frame ratio plus leading and
    trailing silence durations — the trim/filter pass an audio
    training pipeline runs before chunking (leading/trailing dead
    air carries no signal; mostly-silent clips are dropped).

    A frame is silent when ``|amplitude| < threshold``; durations
    use integer ``frames * 1000 // rate`` (exact cross-engine
    arithmetic, same convention as ``duration_ms``). Decoding goes
    through :func:`codecs.wav_samples`, so corrupt payloads raise
    ``ValueError`` (the codec contract) instead of leaking
    ``wave.Error``/``struct.error`` from executor tasks; stereo or
    non-16-bit clips are rejected rather than silently producing
    wrong frame counts.
    """
    from aws_lakehouse_spark.llm.codecs import wav_samples

    def analyze(payload: bytes) -> dict:
        rate, n_channels, _n_frames, samples = wav_samples(payload)
        if n_channels != 1:
            raise ValueError(
                f"extract_audio_silence requires mono WAV, got "
                f"{n_channels} channels"
            )
        silent = [abs(s) < threshold for s in samples]
        n_silent = sum(silent)
        lead = 0
        for flag in silent:
            if not flag:
                break
            lead += 1
        trail = 0
        for flag in reversed(silent):
            if not flag:
                break
            trail += 1
        if n_silent == len(silent):
            trail = 0  # fully-silent clip: report everything as lead
            lead = len(silent)
        return {
            "n_frames": len(silent),
            "n_silent": n_silent,
            "silence_ratio": n_silent / max(len(silent), 1),
            "leading_silence_ms": lead * 1000 // rate,
            "trailing_silence_ms": trail * 1000 // rate,
        }

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_null_on_corrupt(analyze))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": _col(feats, "n_frames"),
                    "n_silent": _col(feats, "n_silent"),
                    "silence_ratio": _col(feats, "silence_ratio"),
                    "leading_silence_ms": _col(feats, "leading_silence_ms"),
                    "trailing_silence_ms": _col(feats, "trailing_silence_ms"),
                }
            )

    return media.mapInPandas(_extract, AUDIO_SILENCE_SCHEMA)


IMAGE_HISTOGRAM_SCHEMA = (
    "media_id bigint, "
    + ", ".join(
        f"{ch}{b} bigint" for ch in ("r", "g", "b") for b in range(4)
    )
)


def extract_image_histograms(media: DataFrame) -> DataFrame:
    """Per-channel 4-bin intensity histograms over real decoded
    pixels (bins of width 64) — the distribution fingerprint image
    curation uses to drop washed-out/black frames and to stratify
    augmentation. Pure-numpy binning per Arrow batch."""
    import numpy as np

    from aws_lakehouse_spark.llm.codecs import png_decode_pixels

    def hist(payload: bytes) -> list[int]:
        d = png_decode_pixels(bytes(payload))
        arr = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(
            -1, d["channels"]
        )
        out: list[int] = []
        for ch in range(3):
            col = arr[:, ch] if ch < d["channels"] else arr[:, 0]
            out.extend(np.bincount(col // 64, minlength=4)[:4].tolist())
        return out

    cols = [f"{ch}{b}" for ch in ("r", "g", "b") for b in range(4)]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs = pdf["content"].map(_null_on_corrupt(hist))
            data = {"media_id": pdf["media_id"]}
            for idx, c in enumerate(cols):
                data[c] = hs.map(
                    lambda v, idx=idx: None if v is None else v[idx]
                )
            yield pd.DataFrame(data)

    return media.mapInPandas(_extract, IMAGE_HISTOGRAM_SCHEMA)


AUDIO_LOUDNESS_SCHEMA = (
    "media_id bigint, n_frames bigint, peak_amp bigint, "
    "rms double, dbfs double"
)


def extract_audio_loudness(media: DataFrame) -> DataFrame:
    """Loudness profile over mono 16-bit WAV payloads (Arrow
    batches): per clip, the peak absolute amplitude, RMS level, and
    dBFS relative to int16 full scale — the normalization /
    too-quiet-clip filter an audio training pipeline runs before
    feature extraction (clips near the noise floor train nothing;
    clipped peaks flag corrupted captures).

    The sum of squared samples is EXACT integer arithmetic (int16²
    sums never overflow Python ints), so ``rms = sqrt(ssq / n)`` and
    ``dbfs = 20·log10(rms / 32768)`` start from identical integers
    on any partitioning — bit-stable, batch-order-free. Decoding
    goes through :func:`codecs.wav_samples` (mono/16-bit enforced,
    ``ValueError`` on malformed payloads). A fully-silent clip has
    no finite dBFS; it reports the -120.0 floor.
    """
    import math

    from aws_lakehouse_spark.llm.codecs import wav_samples

    def analyze(payload: bytes) -> dict:
        _rate, n_channels, _n, samples = wav_samples(payload)
        if n_channels != 1:
            raise ValueError(
                f"extract_audio_loudness requires mono WAV, got "
                f"{n_channels} channels"
            )
        n = len(samples)
        ssq = sum(s * s for s in samples)
        peak = max((abs(s) for s in samples), default=0)
        rms = math.sqrt(ssq / n) if n else 0.0
        dbfs = (
            round(20.0 * math.log10(rms / 32768.0), 6)
            if rms > 0.0
            else -120.0
        )
        return {
            "n_frames": n,
            "peak_amp": peak,
            "rms": round(rms, 6),
            "dbfs": dbfs,
        }

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_null_on_corrupt(analyze))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": _col(feats, "n_frames"),
                    "peak_amp": _col(feats, "peak_amp"),
                    "rms": _col(feats, "rms"),
                    "dbfs": _col(feats, "dbfs"),
                }
            )

    return media.mapInPandas(_extract, AUDIO_LOUDNESS_SCHEMA)


IMAGE_PROFILE_SCHEMA = (
    "media_id bigint, width int, height int, n_pixels bigint, "
    "mean_luma double, dhash string"
)


def decode_image_profile(media: DataFrame) -> DataFrame:
    """ONE decode pass per image producing everything the curation
    pipeline downstream needs: dimensions, pixel count, mean integer
    luma, and the 64-bit perceptual dHash — so the composite
    quality-gate → near-dup → survivor flow never decodes a payload
    twice. Luma accumulates as an exact integer sum before the one
    division (order-free, bit-stable); both the mean and the hash
    derive from the SAME decoded luma plane
    (:func:`_decode_luma` → :func:`_dhash_from_luma`)."""

    def profile(payload: bytes) -> dict:
        luma = _decode_luma(bytes(payload))
        h, w = luma.shape
        n = w * h
        return {
            "width": w,
            "height": h,
            "n_pixels": n,
            "mean_luma": round(int(luma.sum()) / n, 6),
            "dhash": _dhash_from_luma(luma),
        }

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_null_on_corrupt(profile))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": _col(feats, "width"),
                    "height": _col(feats, "height"),
                    "n_pixels": _col(feats, "n_pixels"),
                    "mean_luma": _col(feats, "mean_luma"),
                    "dhash": _col(feats, "dhash"),
                }
            )

    return media.mapInPandas(_extract, IMAGE_PROFILE_SCHEMA)


AUDIO_PROFILE_SCHEMA = (
    "media_id bigint, n_frames bigint, silence_ratio double, "
    "peak_amp bigint, rms double, dbfs double"
)


def decode_audio_profile(media: DataFrame) -> DataFrame:
    """ONE decode pass per clip producing everything the audio
    curation pipeline needs downstream — frame count, silent-frame
    ratio, peak, RMS, dBFS — so the quality-gate → chunk-plan flow
    never decodes a payload twice (the audio analogue of
    :func:`decode_image_profile`). Integer-exact accumulations
    (silent count, squared-sample sum) before the one division, so
    results are batch-order-free; mono/16-bit enforced through
    :func:`codecs.wav_samples` (``ValueError`` on malformed input).
    """
    import math

    from aws_lakehouse_spark.llm.codecs import wav_samples

    def profile(payload: bytes, threshold: int = 50) -> dict:
        _rate, n_channels, _n, samples = wav_samples(payload)
        if n_channels != 1:
            raise ValueError(
                f"decode_audio_profile requires mono WAV, got "
                f"{n_channels} channels"
            )
        n = len(samples)
        n_silent = sum(1 for s in samples if abs(s) < threshold)
        ssq = sum(s * s for s in samples)
        peak = max((abs(s) for s in samples), default=0)
        rms = math.sqrt(ssq / n) if n else 0.0
        dbfs = (
            round(20.0 * math.log10(rms / 32768.0), 6)
            if rms > 0.0
            else -120.0
        )
        return {
            "n_frames": n,
            # rounded HERE (Python banker's rounding) so the analytic
            # oracle — which rounds the same way — matches exactly;
            # F.round's HALF_UP differs at half-ulp ratios
            "silence_ratio": round(n_silent / max(n, 1), 6),
            "peak_amp": peak,
            "rms": round(rms, 6),
            "dbfs": dbfs,
        }

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_null_on_corrupt(profile))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": _col(feats, "n_frames"),
                    "silence_ratio": _col(feats, "silence_ratio"),
                    "peak_amp": _col(feats, "peak_amp"),
                    "rms": _col(feats, "rms"),
                    "dbfs": _col(feats, "dbfs"),
                }
            )

    return media.mapInPandas(_extract, AUDIO_PROFILE_SCHEMA)
