"""Multimodal (image/audio/video) column plumbing.

Treats media payloads as opaque ``binary`` columns with typed metadata,
exactly like the engine treats ``html``. The Spark-side machinery — schema,
Arrow batch shape, mapInPandas signatures, partition behavior — is real and
tested; the codec calls themselves are STUBBED (the sandbox ships no
image/audio libraries): ``decode_stub=True`` derives deterministic fake
metadata/features from the payload bytes, and ``decode_stub=False`` raises
``NotImplementedError`` at the exact call site where PIL/ffmpeg would slot
in. At 100 TB this stage is the same shape as extract_text: embarrassingly
parallel payload map at scan parallelism, metadata-only columns flowing on.

Reference analog: the prep_* readers that sniff format + extract typed
metadata from opaque processor payloads (reference: src/mintpy/prep_aria.py,
utils/readfile.py:559-2110 format sniffers).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, "
    "sample_rate int, duration_ms bigint"
)

# (offset, magic) -> media type; checked in declaration order, longest
# match semantics preserved by listing more specific patterns first.
_MAGIC: list[tuple[int, bytes, str]] = [
    (0, b"\x89PNG\r\n\x1a\n", "image/png"),
    (0, b"\xff\xd8\xff", "image/jpeg"),
    (0, b"GIF87a", "image/gif"),
    (0, b"GIF89a", "image/gif"),
    (0, b"BM", "image/bmp"),
    (0, b"RIFF", "audio/wav"),  # refined to webp below via bytes 8..12
    (0, b"\x1aE\xdf\xa3", "video/webm"),
    (4, b"ftyp", "video/mp4"),
    (0, b"ID3", "audio/mpeg"),
    (0, b"\xff\xfb", "audio/mpeg"),
    (0, b"OggS", "audio/ogg"),
    (0, b"fLaC", "audio/flac"),
    (0, b"\x1f\x8b", "application/gzip"),
    (0, b"PK\x03\x04", "application/zip"),
    (0, b"%PDF", "application/pdf"),
]


def sniff_media_type(payload: bytes) -> str:
    """Magic-byte format sniffing — the readfile.py-style format dispatch
    (reference utils/readfile.py:559-2110 dispatches on leading bytes /
    extensions; here the container formats a crawl actually carries).
    Supports offset patterns (MP4's ftyp at byte 4) and the RIFF family
    split (WAV vs WebP share the RIFF preamble, differ at bytes 8..12)."""
    if payload is None:
        return "unknown"
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"WEBP":
            return "image/webp"
        if payload[8:12] == b"AVI ":
            return "video/avi"
    for off, magic, mtype in _MAGIC:
        if payload[off : off + len(magic)] == magic:
            return mtype
    return "application/octet-stream"


def _stub_meta(payload: bytes) -> tuple[str, int, int, int, int, int]:
    """Deterministic fake decode: metadata derived from a payload digest.
    Stands in for PIL.Image.open / ffprobe; same row shape, same types."""
    h = hashlib.sha1(payload).digest()
    mtype = sniff_media_type(payload)
    width = 16 + h[0] * 8
    height = 16 + h[1] * 8
    n_frames = 1 + h[2] % 64
    sample_rate = 8000 + (h[3] % 5) * 8000
    duration_ms = int.from_bytes(h[4:6], "big")
    return mtype, width, height, n_frames, sample_rate, duration_ms


def decode_media(
    df: DataFrame, payload_col: str = "payload", decode_stub: bool = True
) -> DataFrame:
    """payload binary -> typed media metadata columns (Arrow-batched).

    With ``decode_stub=False`` this is where a real decoder goes; it raises
    NotImplementedError so no caller can mistake stub output for real decode.
    """
    passthrough = [c for c in df.columns if c != payload_col]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != payload_col]
        + [MEDIA_META_SCHEMA]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not available in sandbox"
                )
            # NULL payloads yield a null-metadata row instead of killing the
            # task (one bad record cannot kill a scan — extract_text's rule)
            metas = [
                _stub_meta(bytes(p)) if p is not None
                else ("unknown", None, None, None, None, None)
                for p in pdf[payload_col]
            ]
            out = pdf[passthrough].copy()
            cols = list(zip(*metas)) if metas else [[]] * 6
            for name, vals, dtype in zip(
                ["media_type", "width", "height", "n_frames", "sample_rate", "duration_ms"],
                cols,
                ["object", "Int32", "Int32", "Int32", "Int32", "Int64"],
            ):
                out[name] = pd.Series(vals, index=pdf.index, dtype=dtype)
            yield out

    return df.mapInPandas(run, schema)


def extract_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 16,
    decode_stub: bool = True,
) -> DataFrame:
    """payload -> float feature vector (array<float>), deterministic stub.

    Real path would run a vision/audio encoder per Arrow batch (the batch
    IS the inference micro-batch); the stub hashes bytes into a unit vector
    so downstream similarity ops are exercised with stable values.
    """
    passthrough = [c for c in df.columns if c != payload_col]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != payload_col]
        + [f"features array<float>"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real feature extraction not available")
            feats = []
            for p in pdf[payload_col]:
                if p is None:  # null payload -> null feature row, not a crash
                    feats.append(None)
                    continue
                d = hashlib.sha256(bytes(p)).digest()
                v = np.frombuffer(d[: dim * 2], dtype=np.uint16).astype(np.float32)
                v = v / np.linalg.norm(v)
                feats.append(v.tolist())
            out = pdf[passthrough].copy()
            out["features"] = pd.Series(feats, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(run, schema)


def frame_sample_plan(n_frames_col: str, every_k: int = 8):
    """Frame-sampling as a JVM-side expression: indexes [0, k, 2k, ...)
    bounded by n_frames (the decode of selected frames happens in the
    decoder stage; planning which frames stays in Catalyst)."""
    from pyspark.sql import functions as F

    return F.sequence(
        F.lit(0),
        F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
        F.lit(every_k),
    )
