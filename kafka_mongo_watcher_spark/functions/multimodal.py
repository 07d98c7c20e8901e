"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with a typed metadata struct —
the Spark-side schema, partitioning, and Arrow batch shape are real and
tested; the actual codec work is STUBBED (this container has no image/audio
libraries) behind `_decode_bytes_stub`, which derives deterministic fake
dimensions/samples from the payload bytes. Swap the stub for PIL/ffmpeg
calls on a real cluster; every signature stays the same.

All operators are `mapInPandas` iterators: one Arrow batch in, one out, so
decode cost amortizes across the batch and memory stays bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, n_channels int, "
    "duration_ms int, codec string"
)

_DECODE_IS_STUB = True  # flip when real codecs are wired in


def _decode_bytes_stub(payload: bytes) -> dict:
    """STUB decode: deterministic pseudo-metadata from the payload bytes.

    A real implementation would parse the container header (PIL.Image.open /
    soundfile / pyav). The fake is a pure function of the bytes so tests are
    reproducible and the full Spark plumbing (schema, batching, null
    handling) is exercised for real.
    """
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload: real decoder would raise codec error")
    h = hashlib.sha256(payload).digest()
    return {
        "media_type": ["image", "audio", "video"][h[0] % 3],
        "width": 64 + h[1] * 8,
        "height": 64 + h[2] * 8,
        "n_channels": 1 + h[3] % 4,
        "duration_ms": int.from_bytes(h[4:7], "big") % 600_000,
        "codec": ["raw", "jpegish", "wavish", "h264ish"][h[7] % 4],
    }


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary payload → typed metadata struct (mapInPandas, Arrow-batched).

    Null/empty payloads yield a null struct instead of failing the batch —
    the reference's decode-error tolerance
    (/root/reference/internal/mongo/replay_producer.go:71-74)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", meta struct<{MEDIA_META_DDL}>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for p in pdf[payload_col]:
                try:
                    metas.append(_decode_bytes_stub(p))
                except (NotImplementedError, TypeError):
                    metas.append(None)
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def extract_features(df: DataFrame, payload_col: str = "payload", dim: int = 16) -> DataFrame:
    """binary → fixed-dim float feature vector (stubbed embedding model).

    Vectorized inside the Arrow batch via numpy; output column `features`
    array<float>. Deterministic: bytes → sha256 → unit-normalized floats."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", features array<float>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf[payload_col]:
                if p is None or len(p) == 0:
                    feats.append(None)
                    continue
                raw = hashlib.sha256(p).digest() + hashlib.sha256(b"1" + p).digest()
                v = np.frombuffer(raw[: dim * 4], dtype=np.uint32).astype(np.float64)
                v = (v / 2**32) - 0.5
                v /= np.linalg.norm(v) or 1.0
                feats.append(v.astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, payload_col: str = "payload", n_frames: int = 4) -> DataFrame:
    """video binary → n_frames evenly-spaced frame payloads (stub: byte
    slices standing in for decoded frames). Output `frames` array<binary>."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", frames array<binary>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for p in pdf[payload_col]:
                if p is None or len(p) < n_frames:
                    frames.append(None)
                    continue
                step = len(p) // n_frames
                frames.append([bytes(p[i * step : i * step + step]) for i in range(n_frames)])
            pdf = pdf.copy()
            pdf["frames"] = frames
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def synthetic_media(spark, n_rows: int, *, seed: int = 11) -> DataFrame:
    """Deterministic binary-column fixture: payload = repeated sha512 bytes
    keyed by row id (distributed, no driver data)."""
    return (
        spark.range(0, n_rows, 1, max(4, n_rows // 100_000))
        .select(
            F.col("id").alias("media_id"),
            F.repeat(
                F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 512),
                (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(20)) + 1).cast("int"),
            ).cast("binary").alias("payload"),
        )
    )
