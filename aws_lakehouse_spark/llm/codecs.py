"""Pure-stdlib media codecs: real PNG and WAV decode, no external libs.

The container has no PIL/librosa/ffmpeg, but PNG (zlib + per-scanline
filters, RFC 2083) and WAV (RIFF chunks, stdlib ``wave``) are fully
decodable with the standard library — so the engine's media feature
extraction does REAL decoding, not a stub: parse the header, inflate
the pixel data, undo scanline filters, and compute features from the
actual samples. A deployment with PIL installed transparently takes
the PIL path for formats beyond PNG (see ``llm.multimodal``).

Encoders exist so tests and oracle-checked queries can build
deterministic fixtures without binary test assets in the repo.

Supported PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB),
6 (RGBA), non-interlaced — what encoders produce by default.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, pixel_fn) -> bytes:
    """Minimal RGB PNG encoder (filter 0 rows, one IDAT).

    ``pixel_fn(x, y) -> (r, g, b)`` supplies each pixel — callers
    build solid colors or gradients deterministically.
    """
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            raw += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode_pixels(data: bytes) -> dict:
    """Real PNG decode to raw samples: header parse + zlib inflate +
    filter undo. Returns ``{"width", "height", "channels",
    "bit_depth", "pixels"}`` with ``pixels`` the defiltered
    row-major sample bytes (``height * width * channels`` long) —
    the input to real pixel transforms (resize, crop, normalize).
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    # corrupt payloads surface as struct/zlib errors mid-parse; the
    # decoder's contract (it runs inside executor tasks) is ValueError
    # for ANY malformed input, never a leaked third-party exception
    try:
        while pos < len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                width, height, bit_depth, color_type, _, _, interlace = (
                    struct.unpack(">IIBBBBB", body)
                )
                if bit_depth != 8 or color_type not in _CHANNELS or interlace:
                    raise ValueError(
                        f"unsupported PNG: depth={bit_depth} "
                        f"color={color_type} interlace={interlace}"
                    )
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
    except struct.error as e:
        raise ValueError(f"corrupt PNG chunk structure: {e}") from e
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG pixel stream: {e}") from e
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    prev = bytearray(stride)
    pixels = bytearray()
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        pixels += line
        prev = line
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": bit_depth,
        "pixels": bytes(pixels),
    }


def png_decode(data: bytes) -> dict:
    """Real PNG decode to summary features (see
    :func:`png_decode_pixels` for the raw samples). ``pixel_sum`` /
    ``mean_pixel`` are over every decoded sample — i.e. computed from
    the actual pixel bytes, which fails loudly on corrupt payloads
    (unlike a metadata-only peek)."""
    d = png_decode_pixels(data)
    total = sum(d["pixels"])
    n_samples = d["width"] * d["height"] * d["channels"]
    return {
        "width": d["width"],
        "height": d["height"],
        "channels": d["channels"],
        "bit_depth": d["bit_depth"],
        "pixel_sum": total,
        "n_samples": n_samples,
        "mean_pixel": total / n_samples if n_samples else 0.0,
    }


def png_encode_bytes(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Encode raw row-major samples back to PNG (filter-0 rows, one
    IDAT); channels 1/3/4 map to gray/RGB/RGBA. The inverse of
    :func:`png_decode_pixels` — resize/crop stages re-emit storable
    payloads through this."""
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer length mismatch")
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def wav_encode(
    n_frames: int, framerate: int, amplitude_fn, n_channels: int = 1
) -> bytes:
    """Minimal 16-bit PCM WAV encoder; ``amplitude_fn(i) -> int``
    (±32767) supplies sample i for every channel."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        frames = bytearray()
        for i in range(n_frames):
            s = struct.pack("<h", max(-32767, min(32767, amplitude_fn(i))))
            frames += s * n_channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def wav_samples(data: bytes) -> tuple[int, int, int, tuple]:
    """Validated 16-bit PCM sample extraction shared by every WAV
    consumer: returns ``(framerate, n_channels, n_frames, samples)``.
    Corrupt payloads raise ``ValueError`` (never ``wave.Error`` /
    ``struct.error`` from inside an executor task), non-16-bit widths
    are rejected, and an odd trailing byte from a truncated data
    chunk is dropped rather than surfacing ``struct.error``."""
    try:
        with wave.open(io.BytesIO(bytes(data)), "rb") as w:
            n_channels = w.getnchannels()
            framerate = w.getframerate()
            n_frames = w.getnframes()
            sampwidth = w.getsampwidth()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"corrupt WAV payload: {e}") from e
    if sampwidth != 2:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    frames = frames[: (len(frames) // 2) * 2]
    samples = struct.unpack(f"<{len(frames) // 2}h", frames)
    return framerate, n_channels, n_frames, samples


def wav_decode(data: bytes) -> dict:
    """Real WAV decode via the stdlib RIFF parser: header fields plus
    features computed from the actual samples (peak and mean absolute
    amplitude), so corrupt frames fail loudly."""
    framerate, n_channels, n_frames, samples = wav_samples(data)
    n = len(samples)
    return {
        "n_channels": n_channels,
        "framerate": framerate,
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1000) // framerate if framerate else 0,
        "peak_amplitude": max((abs(s) for s in samples), default=0),
        "mean_abs_amplitude": (sum(abs(s) for s in samples) / n) if n else 0.0,
    }
