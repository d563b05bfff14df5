"""Multimodal (binary-column) plumbing for the training-data pipeline.

Treats image/audio/video payloads as opaque ``BINARY`` columns with
typed metadata, processed in Arrow batches via ``mapInPandas`` — the
schema, partitioning, UDF signatures, and batch shapes are real and
tested; the actual media *decode* is STUBBED (this container ships no
image/audio libraries): ``decoder="real"`` raises
``NotImplementedError`` at the exact call site where PIL/librosa/ffmpeg
would plug in, and ``decoder="fake"`` derives deterministic
pseudo-features from the bytes so the distributed plumbing is
end-to-end verifiable.

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
from pyspark.sql import DataFrame
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


def _real_decode(content: bytes, modality: str) -> dict:
    raise NotImplementedError(
        "real media decode requires PIL/librosa/ffmpeg, which are not "
        "available in this environment; plug the decoder in here and "
        "keep the surrounding mapInPandas plumbing unchanged"
    )


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
