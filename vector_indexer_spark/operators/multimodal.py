"""Multimodal (binary-column) plumbing for the training-data pipeline.

Treats image/audio/video payloads as opaque ``BINARY`` columns with
typed metadata, processed in Arrow batches via ``mapInPandas``.
``decoder="real"`` is a genuine pure-Python decoder stack: PNG IHDR /
JPEG SOF / GIF logical-screen width+height for images (plus a FULL
PNG pixel codec below), WAV RIFF duration + PCM samples for audio,
AVI container demux (avih metadata + movi frame chunks) for video,
and deterministic byte-histogram features — no PIL/librosa/ffmpeg
needed. The only out-of-scope piece is pixel decode of patent-era
video codecs (H.264 etc.); MJPEG/PNG-in-AVI frames decode with the
image codecs here. ``decoder="fake"`` keeps the fully-synthetic
blake2b path for plumbing tests on arbitrary payloads.

At 100 TB: binary payloads dominate row size, so the operators
repartition by byte volume ahead of feature extraction
(``spark.sql.files.maxPartitionBytes`` governs the scan; media tables
should be written with row-group sizes tuned to a few payloads per
group) and never collect content to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video|text
        T.StructField("content", T.BinaryType(), False),
        T.StructField("source", T.StringType(), True),
    ]
)

FEATURE_DIM = 8


def text_as_media(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media-shaped table from a text table (UTF-8 payloads) —
    the test stand-in for a real binary ingest."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("synthetic").alias("source"),
    )


def _fake_decode(content: bytes, modality: str) -> dict:
    """Deterministic stand-in decode: metadata + features derived from
    the bytes via blake2b. Same input bytes → same output, everywhere."""
    h = hashlib.blake2b(content, digest_size=16).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return {
        "byte_len": len(content),
        "width": 16 + h[0] % 64 if modality == "image" else None,
        "height": 16 + h[1] % 64 if modality == "image" else None,
        "duration_ms": (len(content) * 125) if modality in ("audio", "video") else None,
        "features": rng.standard_normal(FEATURE_DIM).astype(np.float32),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png(b: bytes) -> tuple[int, int, int]:
    """Width/height/channels from the mandatory first IHDR chunk —
    big-endian u32 pair at bytes 16/20, color type at 25."""
    if len(b) < 29 or b[12:16] != b"IHDR":
        raise ValueError("malformed PNG: missing IHDR")
    w = int.from_bytes(b[16:20], "big")
    h = int.from_bytes(b[20:24], "big")
    channels = _PNG_CHANNELS.get(b[25])
    if channels is None or w <= 0 or h <= 0:
        raise ValueError("malformed PNG: bad IHDR fields")
    return w, h, channels


def _parse_jpeg(b: bytes) -> tuple[int, int, int]:
    """Scan JFIF segment markers for a start-of-frame (SOF0-SOF3):
    its payload carries height/width as big-endian u16 and the
    component (channel) count."""
    i = 2  # past SOI
    while i + 9 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("malformed JPEG: lost marker sync")
        marker = b[i + 1]
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xC3:  # SOF0..SOF3 (baseline/progressive)
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return w, h, b[i + 9]
        i += 2 + seg_len
    raise ValueError("malformed JPEG: no SOF marker")


def _parse_gif(b: bytes) -> tuple[int, int, int]:
    """Logical-screen width/height: little-endian u16 at bytes 6/8."""
    if len(b) < 10:
        raise ValueError("malformed GIF: truncated header")
    return (
        int.from_bytes(b[6:8], "little"),
        int.from_bytes(b[8:10], "little"),
        3,
    )


def _parse_wav_duration_ms(b: bytes) -> int:
    """RIFF/WAVE chunk walk: byte rate from ``fmt ``, payload size
    from ``data`` → duration in ms."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("malformed WAV: not RIFF/WAVE")
    byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        csize = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 16 + 4 <= len(b):
            byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = csize
        i += 8 + csize + (csize % 2)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        raise ValueError("malformed WAV: missing fmt /data chunk")
    return data_size * 1000 // byte_rate


def _byte_histogram_features(content: bytes) -> np.ndarray:
    """L1-normalized ``FEATURE_DIM``-bin histogram over the payload's
    byte values (binned by the top 3 bits) — a real, deterministic,
    content-derived feature vector needing no media library; a learned
    embedding slots into the same ARRAY<FLOAT> contract."""
    if not content:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    counts = np.bincount(arr >> 5, minlength=FEATURE_DIM).astype(np.float64)
    return (counts / counts.sum()).astype(np.float32)


def _real_decode(content: bytes, modality: str) -> dict:
    """Pure-Python header decode — no PIL/librosa/ffmpeg needed.

    Images: true width/height (+channel count folded into features[7]
    is NOT done — channels validate the parse only) from PNG IHDR /
    JPEG SOF / GIF logical screen. Audio: true duration from the WAV
    RIFF header. Video: genuine container demux needs ffmpeg — that
    single modality remains the documented plug-in point. Features are
    a real byte-histogram (deterministic, content-derived).
    """
    width = height = duration_ms = None
    if modality == "image":
        if content[:8] == _PNG_SIG:
            width, height, _ = _parse_png(content)
        elif content[:2] == b"\xff\xd8":
            width, height, _ = _parse_jpeg(content)
        elif content[:6] in (b"GIF87a", b"GIF89a"):
            width, height, _ = _parse_gif(content)
        else:
            raise ValueError("unsupported image format (PNG/JPEG/GIF)")
    elif modality == "audio":
        duration_ms = _parse_wav_duration_ms(content)
    elif modality == "video":
        meta = parse_avi(content)
        width, height = meta["width"], meta["height"]
        duration_ms = meta["duration_ms"]
    return {
        "byte_len": len(content),
        "width": width,
        "height": height,
        "duration_ms": duration_ms,
        "features": _byte_histogram_features(content),
    }


def extract_features(
    df: DataFrame, *, decoder: str = "fake", batch_limit_mb: int = 64
) -> DataFrame:
    """Decode + feature-extract a media table in Arrow batches.

    Returns ``(media_id, modality, byte_len, width, height,
    duration_ms, features ARRAY<FLOAT>)``. The decode function sees one
    payload at a time inside a batched loop — the shape a vectorized
    decoder (e.g. batched image resize) slots into.
    """
    decode = {"fake": _fake_decode, "real": _real_decode}[decoder]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                "media_id": [], "modality": [], "byte_len": [], "width": [],
                "height": [], "duration_ms": [], "features": [],
            }
            for mid, mod, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                d = decode(bytes(content), mod)
                out["media_id"].append(mid)
                out["modality"].append(mod)
                out["byte_len"].append(d["byte_len"])
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["duration_ms"].append(d["duration_ms"])
                out["features"].append(d["features"])
            yield pd.DataFrame(out)

    return df.select("media_id", "modality", "content").mapInPandas(
        _extract,
        "media_id long, modality string, byte_len long, width int,"
        " height int, duration_ms long, features array<float>",
    )


def sample_frames(
    df: DataFrame, *, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Deterministic frame sampling stand-in: one "frame" per
    ``every_n_bytes`` of payload, capped (the video-pipeline shape:
    explode payloads into per-frame rows for downstream batch decode)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {"media_id": [], "frame_idx": [], "frame_offset": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = min(max(len(bytes(content)) // every_n_bytes, 1), max_frames)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(i * every_n_bytes)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(
        _frames, "media_id long, frame_idx int, frame_offset long"
    )


# ---------------------------------------------------------------------------
# Full PNG codec (pure Python: struct + zlib, both stdlib) + resize.
# The header parsers above answer "what is this"; these decode actual
# pixels so resize/feature ops run on real image data with no PIL.
# Supports the non-interlaced 8-bit-depth gray/RGB/gray+alpha/RGBA
# subset (color types 0/2/4/6) — the shapes a synthetic training
# corpus emits; palette/16-bit/interlaced raise with a clear message.
# ---------------------------------------------------------------------------


def _iter_png_chunks(b: bytes):
    i = 8
    while i + 8 <= len(b):
        size = int.from_bytes(b[i : i + 4], "big")
        cid = b[i + 4 : i + 8]
        yield cid, b[i + 8 : i + 8 + size]
        if cid == b"IEND":
            return
        i += 12 + size  # len + id + data + crc


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes → ``(h, w, channels)`` uint8 array (8-bit,
    non-interlaced, color types 0/2/4/6). Scanline unfiltering
    implements the five spec filters (None/Sub/Up/Average/Paeth,
    PNG spec §9); CRCs are not verified (zlib integrity catches
    payload corruption)."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    w = h = channels = None
    idat = []
    for cid, data in _iter_png_chunks(b):
        if cid == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, _, _, interlace = data[8:13]
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = _PNG_CHANNELS.get(color_type)
            if color_type == 3 or channels is None:
                raise ValueError(
                    f"unsupported PNG color type {color_type}"
                )
        elif cid == b"IDAT":
            idat.append(data)
    if w is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    import zlib  # noqa: PLC0415

    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("malformed PNG: wrong decompressed size")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        up = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up
            rec = (line + up) & 0xFF
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256
            rec = (
                np.cumsum(line.reshape(w, bpp), axis=0) & 0xFF
            ).reshape(-1)
        elif ftype in (3, 4):  # left+up dependent: sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                bb = up[x]
                c = up[x - bpp] if x >= bpp else 0
                if ftype == 3:
                    pred = (a + bb) >> 1
                else:
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else bb if pb <= pc else c
                    )
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """``(h, w, channels)`` uint8 array → PNG bytes (filter 0, one
    IDAT, correct CRCs — readable by any standards decoder)."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + cid
            + data
            + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_array(
    arr: np.ndarray, width: int, height: int, *, method: str = "bilinear"
) -> np.ndarray:
    """Vectorized NumPy resample of an ``(h, w, c)`` uint8 image —
    ``"nearest"`` (pixel-center mapping) or ``"bilinear"``
    (align_corners=False convention, the default of every major
    vision library)."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")
    h, w = arr.shape[:2]
    if method == "nearest":
        xs = np.minimum(
            ((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1
        )
        ys = np.minimum(
            ((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1
        )
        return arr[np.ix_(ys, xs)]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    fx = (np.arange(width) + 0.5) * w / width - 0.5
    fy = (np.arange(height) + 0.5) * h / height - 0.5
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    a = arr[np.ix_(y0, x0)].astype(np.float64)
    bq = arr[np.ix_(y0, x1)].astype(np.float64)
    c = arr[np.ix_(y1, x0)].astype(np.float64)
    d = arr[np.ix_(y1, x1)].astype(np.float64)
    top = a * (1 - wx) + bq * wx
    bot = c * (1 - wx) + d * wx
    return np.clip(
        np.floor(top * (1 - wy) + bot * wy + 0.5), 0, 255
    ).astype(np.uint8)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    *,
    method: str = "bilinear",
    reencode: bool = True,
) -> DataFrame:
    """Batch image resize over a media table's PNG payloads: decode →
    NumPy resample → (optionally) re-encode, all inside ``mapInPandas``
    Arrow batches — the standard vision-preprocessing stage of a
    multimodal training pipeline, with the per-image work embarrassingly
    parallel across partitions.

    Returns ``(media_id, width, height, channels, content)``; with
    ``reencode=False`` content carries raw ``height*width*channels``
    pixel bytes (row-major) for a downstream tensorizer instead of a
    PNG. Non-PNG payloads raise — filter the frame to
    ``modality = 'image'`` PNGs first (a training pipeline normalizes
    formats upstream)."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"media_id": [], "width": [], "height": [],
                   "channels": [], "content": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = resize_array(
                    decode_png(bytes(content)), width, height, method=method
                )
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["channels"].append(arr.shape[2])
                out["content"].append(
                    encode_png(arr) if reencode else arr.tobytes()
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        _resize,
        "media_id long, width int, height int, channels int, content binary",
    )


# ---------------------------------------------------------------------------
# WAV PCM codec + audio features — audio's twin of the PNG codec above:
# 16-bit PCM is raw samples behind a RIFF header, so a real decoder
# needs only struct math. Features are integer-exact so the whole
# decode path can be oracled in pure SQL (media_audio_features).
# ---------------------------------------------------------------------------


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ``((n_frames, channels) int16 array, sample_rate)``.
    PCM format 1, 16-bit only (the training-corpus normal form);
    compressed/float WAVs raise."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("malformed WAV: not RIFF/WAVE")
    fmt = rate = channels = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        csize = int.from_bytes(b[i + 4 : i + 8], "little")
        body = b[i + 8 : i + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format {fmt}, {bits}-bit"
                    " (16-bit PCM only)"
                )
        elif cid == b"data":
            data = body
        i += 8 + csize + (csize % 2)
    if rate is None or data is None or not channels:
        raise ValueError("malformed WAV: missing fmt /data chunk")
    samples = np.frombuffer(
        data[: (len(data) // (2 * channels)) * 2 * channels], dtype="<i2"
    ).reshape(-1, channels)
    return samples, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """``(n, channels)`` int16 array → canonical 16-bit PCM WAV."""
    import struct  # noqa: PLC0415

    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(df: DataFrame) -> DataFrame:
    """Real audio feature extraction over WAV payloads: decode PCM,
    emit integer-exact per-clip statistics (sums/peaks/zero crossings
    stay in int64 — deterministic on every platform, and SQL-oracleable;
    derive RMS etc. downstream as ``sqrt(sum_sq / n_samples)``).

    Returns ``(media_id, sample_rate, channels, n_frames, duration_ms,
    sum_abs, sum_sq, peak_abs, zero_crossings)``; zero crossings count
    strict sign flips (+/−) along each channel, summed over channels,
    with zero samples carrying the previous sign (the standard ZCR
    convention that ignores silence plateaus)."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {
                "media_id": [], "sample_rate": [], "channels": [],
                "n_frames": [], "duration_ms": [], "sum_abs": [],
                "sum_sq": [], "peak_abs": [], "zero_crossings": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                s, rate = decode_wav(bytes(content))
                s64 = s.astype(np.int64)
                sgn = np.sign(s64)
                # carry previous sign across zeros, per channel
                flips = 0
                for ch in range(s.shape[1]):
                    col = sgn[:, ch]
                    nz = col[col != 0]
                    flips += int((nz[1:] != nz[:-1]).sum()) if nz.size else 0
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["channels"].append(s.shape[1])
                rows["n_frames"].append(s.shape[0])
                rows["duration_ms"].append(s.shape[0] * 1000 // rate)
                rows["sum_abs"].append(int(np.abs(s64).sum()))
                rows["sum_sq"].append(int((s64 * s64).sum()))
                rows["peak_abs"].append(int(np.abs(s64).max(initial=0)))
                rows["zero_crossings"].append(flips)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(
        _feats,
        "media_id long, sample_rate int, channels int, n_frames long,"
        " duration_ms long, sum_abs long, sum_sq long, peak_abs long,"
        " zero_crossings long",
    )


# ---------------------------------------------------------------------------
# AVI container demux — video's RIFF sibling of the WAV codec: pure
# struct math walks LIST('hdrl' avih …) for metadata and LIST('movi')
# for the per-frame chunks. Codec-agnostic: frame payloads come back
# as raw bytes (MJPEG corpora → _parse_jpeg / a future JPEG pixel
# decoder; our synthetic fixtures carry PNG frames → decode_png works
# on them directly). This removes the last decode stub — only frame
# PIXEL decode of patent-era codecs (H.264 etc.) stays out of scope.
# ---------------------------------------------------------------------------


def _iter_riff_chunks(b: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        cid = b[i : i + 4]
        csize = int.from_bytes(b[i + 4 : i + 8], "little")
        yield cid, i + 8, min(i + 8 + csize, end)
        i += 8 + csize + (csize % 2)  # word-aligned


def parse_avi(b: bytes) -> dict:
    """AVI bytes → ``{width, height, n_frames, usec_per_frame,
    duration_ms, frames: [bytes, ...]}``. Walks the RIFF tree for the
    mandatory ``avih`` header and every ``##dc``/``##db`` video frame
    chunk inside ``LIST('movi')`` (OpenDML index chunks are skipped —
    sequential demux needs none)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("malformed AVI: not RIFF/AVI ")
    meta = {}
    frames = []

    def walk(start, end, depth=0):
        if depth > 16:  # spec nesting is ~3; crafted input stays bounded
            raise ValueError("malformed AVI: LIST nesting too deep")
        for cid, ds, de in _iter_riff_chunks(b, start, end):
            if cid == b"LIST":
                walk(ds + 4, de, depth + 1)  # skip the 4-byte list type
            elif cid == b"avih" and de - ds >= 40:
                meta["usec_per_frame"] = int.from_bytes(b[ds : ds + 4], "little")
                meta["n_frames_hdr"] = int.from_bytes(
                    b[ds + 16 : ds + 20], "little"
                )
                meta["width"] = int.from_bytes(b[ds + 32 : ds + 36], "little")
                meta["height"] = int.from_bytes(b[ds + 36 : ds + 40], "little")
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append(b[ds:de])

    walk(12, len(b))
    if "usec_per_frame" not in meta:
        raise ValueError("malformed AVI: missing avih header")
    n = len(frames)
    return {
        "width": meta["width"],
        "height": meta["height"],
        "n_frames": n,
        "usec_per_frame": meta["usec_per_frame"],
        "duration_ms": n * meta["usec_per_frame"] // 1000,
        "frames": frames,
    }


def encode_avi(
    frames: list, usec_per_frame: int, width: int, height: int
) -> bytes:
    """Minimal standards-shaped AVI writer: RIFF('AVI ' LIST('hdrl'
    avih) LIST('movi' 00dc…)). Frame payloads are written verbatim —
    pair with :func:`encode_png` for fully-synthetic decodable video."""
    import struct  # noqa: PLC0415

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_video_frames(df: DataFrame) -> DataFrame:
    """Explode AVI payloads into per-frame rows ``(media_id,
    frame_idx, byte_len, frame)`` — the real-container counterpart of
    :func:`sample_frames`, feeding a downstream frame decoder (e.g.
    ``decode_png`` for synthetic PNG-in-AVI corpora, a JPEG pixel
    decoder for MJPEG)."""

    def _demux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {"media_id": [], "frame_idx": [], "byte_len": [],
                    "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for i, fr in enumerate(parse_avi(bytes(content))["frames"]):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["byte_len"].append(len(fr))
                    rows["frame"].append(fr)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(
        _demux,
        "media_id long, frame_idx int, byte_len long, frame binary",
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing + image near-duplicate detection.
#
# The image twin of text SimHash (dedup.py:simhash): a 56-bit average-
# hash (aHash) per image, then a banded-Hamming self-join for pairs.
# This is the standard first-pass image dedup of a multimodal training
# pipeline (CLIP-style corpora dedupe on a perceptual hash before any
# embedding model runs).  Integer-exact by construction so the whole
# decode -> hash -> pair pipeline is oracle-checkable in pure SQL.
# ---------------------------------------------------------------------------

AHASH_W = 8
AHASH_H = 7  # 8x7 = 56 bits: fits a signed 64-bit long in both engines


def ahash_array(arr: np.ndarray) -> int:
    """56-bit average-hash of an ``(h, w, c)`` uint8 image, integer-
    exact: luminance is the per-pixel channel *sum* (monotone in any
    fixed-weight gray conversion, no float rounding); bit ``y*8 + x``
    is set iff ``56 * lum > total`` (strict, fraction-free form of
    ``lum > mean``)."""
    small = resize_array(arr, AHASH_W, AHASH_H, method="nearest")
    lum = small.astype(np.int64).sum(axis=2)  # (7, 8)
    total = int(lum.sum())
    bits = (lum * (AHASH_W * AHASH_H) > total).astype(np.int64)
    idx = np.arange(AHASH_H * AHASH_W, dtype=np.int64).reshape(
        AHASH_H, AHASH_W
    )
    return int((bits << idx).sum())


def image_ahash(df: DataFrame) -> DataFrame:
    """``(media_id, ahash)`` over a PNG media table — decode +
    downsample + threshold inside ``mapInPandas`` Arrow batches;
    per-image work is embarrassingly parallel, output is 8 bytes/row
    regardless of image size (the scan never re-reads pixels
    downstream)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": [
                        ahash_array(decode_png(bytes(c)))
                        for c in pdf["content"]
                    ],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        _hash, "media_id long, ahash long"
    )


def image_near_dups(
    hashes: DataFrame,
    *,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """Near-duplicate image pairs ``(id_a, id_b, hamming)`` from an
    :func:`image_ahash` table.

    Candidate generation is banded (the SimHash trick): the 56-bit
    hash splits into ``bands`` equal bit-bands; only images sharing at
    least one exact band are compared.  By pigeonhole this is EXACT
    whenever ``max_hamming < bands`` — any pair within the threshold
    must agree on some band — so the default (3, 4) returns precisely
    the all-pairs answer without the all-pairs join.  At 10^9 images
    the band join shuffles 4 rows/image on 14-bit-band keys and the
    verify step is ``bit_count(xor)`` codegen on the candidate set
    only.  ``max_bucket_size`` caps degenerate bands (e.g. the all-
    black-thumbnail bucket) exactly as
    :func:`~vector_indexer_spark.operators.dedup.lsh_candidate_pairs`
    does — the documented recall trade inside pathological buckets.
    """
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    nbits = AHASH_W * AHASH_H
    if bands <= 0 or nbits % bands:
        raise ValueError(f"bands must divide {nbits}")
    width = nbits // bands
    mask = (1 << width) - 1
    banded = hashes.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("ahash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("media_id", "ahash", "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        if max_bucket_size <= 0:
            raise ValueError("max_bucket_size must be positive")
        wb = Window.partitionBy("band", "bucket")
        banded = banded.withColumn(
            "__bn", F.count("*").over(wb)
        ).filter(F.col("__bn") <= max_bucket_size).drop("__bn")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
