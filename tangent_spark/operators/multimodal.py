"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partition-size
control, UDF signatures) is real and tested; the actual media decoding
is stubbed — the sandbox image has no PIL/ffmpeg/torchaudio, so the
decode step is a deterministic fake derived from the bytes, clearly
marked, and the real path raises NotImplementedError behind an
import-try. Swapping in a real decoder changes ONE function.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, media binary, media_type string"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "features array<float>, decoder string"
)

FRAME_SAMPLE_SCHEMA = (
    "doc_id long, frame_idx int, ts_ms long, features array<float>"
)

try:  # pragma: no cover - not present in this image
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_decode(payload: bytes, n_features: int = 16):
    """Deterministic stand-in for image decode: pseudo-dimensions and a
    feature vector derived from a blake2b stream over the bytes. Keeps
    the full pipeline (batching, schema, downstream ANN) testable."""
    data = payload or b""
    hdr = hashlib.blake2b(data, digest_size=8, person=b"dims").digest()
    w_, h_ = struct.unpack("<II", hdr)
    buf = b""
    counter = 0
    while len(buf) < 4 * n_features:
        buf += hashlib.blake2b(
            data + bytes([counter]), digest_size=64, person=b"feat"
        ).digest()
        counter += 1
    feats = np.frombuffer(buf[: 4 * n_features], dtype=np.uint32).astype(np.float32)
    feats = (feats % 1000) / 1000.0
    return 64 + w_ % 960, 64 + h_ % 960, 3, feats


def decode_images(media: DataFrame, n_features: int = 16, use_real_decoder: bool = False) -> DataFrame:
    """media(doc_id, media: binary) -> per-image metadata + features.
    Arrow batches stream through mapInPandas; binary payloads never
    land on the driver."""
    if use_real_decoder and not _HAVE_PIL:
        raise NotImplementedError(
            "real image decoding needs PIL, which is not in this image; "
            "run with use_real_decoder=False for the deterministic stub"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                if use_real_decoder:  # pragma: no cover
                    raise NotImplementedError("real decoder not wired yet")
                w, h, c, feats = _fake_decode(bytes(payload or b""), n_features)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": w,
                        "height": h,
                        "channels": c,
                        "features": feats.tolist(),
                        "decoder": "stub-blake2b",
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "features", "decoder"],
            )

    return media.select("doc_id", "media").mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame sampling stub: emits max_frames deterministic rows
    per video with monotone timestamps — the row-explosion shape (1
    input row -> N output rows through mapInPandas) that a real
    ffmpeg-backed sampler produces."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                n = 1 + (len(payload or b"") % max_frames)
                for i in range(n):
                    _, _, _, feats = _fake_decode(bytes(payload or b"") + bytes([i]))
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "features": feats.tolist(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "ts_ms", "features"])

    return media.select("doc_id", "media").mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)


def synthetic_media(pages: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic binary media column from pages (stand-in
    for a real WARC payload column)."""
    return pages.select(
        "doc_id",
        F.lit(kind).alias("kind"),
        F.col("html").alias("media"),
        F.lit(f"{kind}/stub").alias("media_type"),
    )
