"""Multimodal columns — opaque binary payloads with typed metadata.

Design for image/audio/video at 100 TB: media travel as ``binary`` columns
next to typed metadata (mime, width/height, duration, codec). Decode /
feature-extract / resize / frame-sample run as **Arrow-batched mapInPandas
operators** so the heavy bytes cross the JVM↔Python boundary once per batch,
never per row, and the pipeline controls batch size via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (bytes-per-batch is the
real memory knob at scale — keep batches ≪ executor heap).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are stubbed: ``backend="fake"`` produces deterministic
hash-derived outputs (real plumbing, fake pixels — schema, partitioning,
batch shapes and UDF signatures are all exercised by tests);
``backend="real"`` raises NotImplementedError where the library call goes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, mime STRING, width INT, height INT, "
    "duration_ms BIGINT, payload BINARY"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id BIGINT, kind STRING, feat_dim INT, features ARRAY<FLOAT>, decode_ok BOOLEAN"
)

FRAME_SAMPLE_SCHEMA = "media_id BIGINT, frame_idx INT, frame_sha256 STRING"


def synthesize_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded digest bytes)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")
    )
    payload = F.to_binary(
        F.concat(*[F.md5(F.concat(F.lit(f"media:{seed}:{i}:"), F.col("id").cast("string"))) for i in range(8)]),
        F.lit("hex"),
    )
    return spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        (F.col("id") % 640 + 32).cast("int").alias("width"),
        (F.col("id") % 480 + 32).cast("int").alias("height"),
        (F.col("id") * 40 % 60000).alias("duration_ms"),
        payload.alias("payload"),
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding from payload bytes (the stub kernel).

    Oracle-friendly by construction: the digest is sha256 of the payload's
    lowercase HEX (a varchar both engines hash identically), and each value
    is k/2^24 with k a 3-byte big-endian slice of the repeated digest — k has
    at most 24 significant bits, so k/2^24 is exactly representable in
    float32 and the exact integer k is recoverable as value*2^24 in any
    engine (no float-stringification hazard in the correctness gate).
    """
    h = hashlib.sha256(bytes(payload).hex().encode()).digest()
    rep = (h * (dim * 3 // len(h) + 1))[: dim * 3]
    arr = np.frombuffer(rep, dtype=np.uint8).reshape(dim, 3).astype(np.uint32)
    k = arr[:, 0] * 65536 + arr[:, 1] * 256 + arr[:, 2]
    return (k.astype(np.float64) / 2**24).astype(np.float32)


def extract_image_features(
    media: DataFrame, feat_dim: int = 64, backend: str = "fake"
) -> DataFrame:
    """decode → feature-extract as one mapInPandas pass over image rows.

    Real backend would decode ``payload`` with PIL and run a vision encoder;
    the Arrow plumbing (batch iterator, schema, column pruning of the binary
    payload after use) is identical either way.
    """
    if backend not in ("fake", "real"):
        raise ValueError(backend)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                raise NotImplementedError(
                    "image decode requires PIL/torchvision (not in this container); "
                    "use backend='fake' for plumbing tests"
                )
            feats = [
                _fake_features(p, feat_dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": feat_dim,
                    "features": feats,
                    "decode_ok": [f is not None for f in feats],
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload"
    ).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, backend: str = "fake") -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    Real backend seeks with ffmpeg; the fake one emits the deterministic
    digest of (payload, frame index) so downstream joins/aggregations are
    fully exercised.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                raise NotImplementedError("video decode requires ffmpeg (not in this container)")
            ids, idxs, shas = [], [], []
            for mid, dur, payload in zip(pdf["media_id"], pdf["duration_ms"], pdf["payload"]):
                n = max(int(dur) // every_ms, 1)
                phex = bytes(payload).hex()
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    # digest of "payloadhex:idx" — varchar-only input, so the
                    # DuckDB oracle regenerates the identical digests
                    shas.append(hashlib.sha256(f"{phex}:{i}".encode()).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_sha256": shas})

    return media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms", "payload"
    ).mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, backend: str = "fake") -> DataFrame:
    """Resize kernel: binary in → binary out, metadata updated in place."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                raise NotImplementedError("image resize requires PIL (not in this container)")
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            # digest of "payloadhex:WxH" — varchar-only input, so the DuckDB
            # oracle regenerates the resized payload bytes exactly
            out["payload"] = [
                hashlib.sha256(
                    f"{bytes(p).hex()}:{width}x{height}".encode()
                ).digest()
                for p in pdf["payload"]
            ]
            yield out

    img = media.filter(F.col("kind") == "image")
    return img.mapInPandas(kernel, img.schema)
