"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video in a 100 TB training-data pipeline:
payloads are **opaque `binary` columns** with a typed metadata struct;
decode/feature work runs as Arrow-batched `mapInPandas` stages so bytes
stream through the JVM→Python boundary in columnar batches (never one row
at a time), and the *pipeline* (schema, partitioning, batch shape,
checkpointable stages) is identical whether the inner decode is a real
codec or not.

The container has no image/audio codecs, so:
- **real, tested here**: byte-level feature extraction (size, entropy,
  byte-histogram, magic-number sniffing, rolling-hash content id) — these
  are the dedup/quality features a curation pipeline actually computes
  before any decode;
- **stubbed, plumbing real**: `decode_image` / `resample_audio` /
  `sample_frames` raise ``NotImplementedError`` unless the optional codec
  libraries import (gated), with a deterministic fake available for tests
  (``fake=True``) that produces correctly-shaped arrays from metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"OggS": "ogg",
    b"\x1aE\xdf\xa3": "matroska",
}


def sniff_kind(payload: bytes) -> str:
    for magic, kind in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return kind
    return "unknown"


def byte_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-payload byte statistics (mapInPandas, numpy-vectorized): size,
    shannon entropy, 16-bin byte histogram, sniffed container, 64-bit
    rolling content hash. These are real computations used for exact dedup
    and corrupt-sample filtering before decode."""
    out_schema = (
        "media_id long, size long, entropy double, sniffed string, "
        "content_hash long, hist array<double>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                # a NULL payload is a corrupt-sample row, not a stage
                # killer: same features as the empty payload
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                if len(b) == 0:
                    rows.append((int(mid), 0, 0.0, "unknown", 0, [0.0] * 16))
                    continue
                counts = np.bincount(b >> 4, minlength=16).astype(np.float64)
                p = counts / counts.sum()
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                # content id: md5 (C-speed) truncated to int64 — the exact-
                # dedup key for raw payloads
                import hashlib

                h = int.from_bytes(hashlib.md5(bytes(payload)).digest()[:8], "big", signed=True)
                rows.append(
                    (int(mid), int(len(b)), entropy, sniff_kind(bytes(payload[:8])), h, p.tolist())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "size", "entropy", "sniffed", "content_hash", "hist"]
            )

    return df.mapInPandas(gen, out_schema)


try:  # gated optional codecs — absent in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """payload → decoded pixel features (mean/std per channel, resized
    8×8 luma thumbnail for perceptual dedup). Requires a codec library;
    with ``fake=True`` produces deterministic correctly-shaped output from
    metadata so the downstream pipeline (schema, joins, dedup on
    thumbnails) is testable without codecs."""
    out_schema = "media_id long, mean double, std double, thumb array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if fake:
                    rng = np.random.Generator(np.random.Philox(key=[int(mid), 97]))
                    w = (meta or {}).get("width") or 8
                    h = (meta or {}).get("height") or 8
                    img = rng.integers(0, 256, size=(max(h, 1), max(w, 1))).astype(np.float64)
                elif _HAS_PIL:
                    import io

                    img = np.asarray(Image.open(io.BytesIO(bytes(payload))).convert("L"), dtype=np.float64)
                else:
                    raise NotImplementedError(
                        "image decode requires an image codec library (not in this container); "
                        "use fake=True for pipeline testing"
                    )
                ys = np.array_split(img, 8, axis=0)
                thumb = [float(np.mean(c)) for y in ys for c in np.array_split(y, 8, axis=1)]
                rows.append((int(mid), float(img.mean()), float(img.std()), thumb))
            yield pd.DataFrame(rows, columns=["media_id", "mean", "std", "thumb"])

    return df.mapInPandas(gen, out_schema)


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """video payload → sampled frame references (media_id, frame_idx).
    The sampling plan (explode of frame indices from metadata) is real
    Spark; actual frame extraction is codec-gated."""
    if not fake:
        raise NotImplementedError(
            "frame extraction requires a video codec library (not in this container); "
            "use fake=True for pipeline testing"
        )
    return (
        df.select("media_id", F.col("meta.n_frames").alias("n_frames"))
        .where(F.col("n_frames").isNotNull() & (F.col("n_frames") > 0))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )
