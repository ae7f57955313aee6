"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded and featurized inside Arrow-batched UDFs.

The decoder is REAL for self-contained uncompressed formats — binary
PPM (P6) and 24-bit uncompressed BMP are parsed with numpy only, so the
whole path (bytes -> pixels -> resize -> features) runs genuinely in
this sandbox and is tested pixel-exactly. Compressed formats (JPEG/PNG/
video) need codec libraries absent from this image; those fall back to
a clearly-marked deterministic stub (or raise under strict=True), and a
real codec drops into `_decode_image` without touching any Spark
plumbing. Payload bytes never land on the driver — decoding streams
through mapInPandas partition by partition.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional, Tuple

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


# --- real decoders (numpy-only formats) --------------------------------------

def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8. Full header grammar:
    whitespace-separated width/height/maxval with '#' comments."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    n = w * h * 3
    pix = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return pix.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (H, W, 3) uint8 RGB.
    Rows are stored bottom-up, BGR, padded to 4-byte boundaries."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index mapping — exact, no codec)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, n_features: int = 16) -> np.ndarray:
    """Deterministic feature vector in [0,1]: per-channel mean+std (6)
    then a g x g grayscale grid of means filling the rest."""
    f = np.zeros(n_features, dtype=np.float32)
    pix = img.astype(np.float32) / 255.0
    stats = np.concatenate([pix.mean(axis=(0, 1)), pix.std(axis=(0, 1))])
    k = min(6, n_features)
    f[:k] = stats[:k]
    rest = n_features - 6
    if rest > 0:
        g = max(1, int(np.ceil(np.sqrt(rest))))
        gray = resize_nearest(pix.mean(axis=2, keepdims=True), g, g)[:, :, 0]
        f[6 : 6 + rest] = gray.reshape(-1)[:rest]
    return f


def _decode_image(data: bytes) -> Optional[Tuple[np.ndarray, str]]:
    """Magic-byte dispatch to a REAL decoder; None if the format needs a
    codec library this image doesn't have."""
    if data[:2] == b"P6":
        return decode_ppm(data), "ppm-numpy"
    if data[:2] == b"BM":
        return decode_bmp(data), "bmp-numpy"
    return None


# --- stub for codec formats ----------------------------------------------------

def _fake_decode(payload: bytes, n_features: int = 16):
    """Deterministic stand-in for codec formats (JPEG/PNG/video):
    pseudo-dimensions and a feature vector from a blake2b stream over
    the bytes. Keeps the pipeline testable where no codec exists."""
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


# --- Spark operators -------------------------------------------------------------

def decode_images(
    media: DataFrame, n_features: int = 16, strict: bool = False
) -> DataFrame:
    """media(doc_id, media: binary) -> per-image metadata + features.
    PPM/BMP payloads decode for real; codec formats use the stub unless
    strict=True (then they raise). Arrow batches stream through
    mapInPandas; binary payloads never land on the driver."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(payload or b"")
                real = _decode_image(data) if data else None
                if real is not None:
                    img, codec = real
                    h, w, c = img.shape
                    feats = image_features(img, n_features)
                elif strict:
                    raise NotImplementedError(
                        "payload needs a codec library not present in this image"
                    )
                else:
                    w, h, c, feats = _fake_decode(data, n_features)
                    codec = "stub-blake2b"
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(w),
                        "height": int(h),
                        "channels": int(c),
                        "features": feats.tolist(),
                        "decoder": codec,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "features", "decoder"],
            )

    return media.select("doc_id", "media").mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame sampling: emits up to max_frames rows per video with
    monotone timestamps — the row-explosion shape (1 input row -> N
    output rows through mapInPandas) a real ffmpeg-backed sampler
    produces. Frame pixel decode itself is stubbed (no ffmpeg here)."""

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


def make_test_image(doc_id: int, w: int = 32, h: int = 24) -> np.ndarray:
    """Deterministic RGB pattern per doc (gradients + doc-keyed phase)."""
    xs = np.arange(w, dtype=np.float32)[None, :]
    ys = np.arange(h, dtype=np.float32)[:, None]
    phase = (doc_id * 37) % 251
    r = (xs * 255 / max(w - 1, 1)) + 0 * ys
    g = (ys * 255 / max(h - 1, 1)) + 0 * xs
    b = (xs + ys + phase) % 256
    return np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)), b], axis=2
    ).astype(np.uint8)


def synthetic_media(pages: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic REAL media per doc: an actual P6 PPM image whose
    pixels derive from doc_id (stand-in for a WARC payload column).
    Generated inside the executor UDF — never materialized driver-side."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "doc_id": int(doc_id),
                    "kind": kind,
                    "media": encode_ppm(make_test_image(int(doc_id))),
                    "media_type": "image/x-portable-pixmap",
                }
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "media", "media_type"])

    return pages.select("doc_id").mapInPandas(kernel, schema=MEDIA_SCHEMA)
