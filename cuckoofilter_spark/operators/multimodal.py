"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns
with a metadata struct; decode/feature-extraction runs as Arrow-
batched ``mapInPandas`` so each Python worker sees whole byte batches
(the pattern that scales — per-row Python UDFs on multi-MB blobs do
not). The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode step is stubbed: ``decoder='fake'`` is a
deterministic byte-statistics decoder used by tests; ``decoder='real'``
raises ``NotImplementedError`` at the exact point a codec would be
called. Schema, batching, partitioning, and UDF signatures are real.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media binary, "
    "meta struct<kind:string, width:int, height:int, sample_rate:int>"
)
FEATURE_SCHEMA = (
    "media_id long, n_bytes long, head_crc long, byte_mean_milli long, "
    "feature array<float>"
)


def attach_fake_media(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Deterministic pseudo-media for tests: the utf-8 bytes of the
    text column standing in for an encoded image."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text), "utf-8").alias("media"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.length(text).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(0).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_decode(blob: bytes, n_feat: int) -> np.ndarray:
    """Deterministic stand-in for image decode + embed: fixed-seed
    projection of byte histogram to n_feat dims."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    rng = np.random.Generator(np.random.PCG64(1234))
    proj = rng.standard_normal((256, n_feat))
    return (hist @ proj).astype(np.float32)


def extract_features(
    df: DataFrame, *, decoder: str = "fake", n_feat: int = 16,
) -> DataFrame:
    """Batched decode/feature-extract over media blobs.

    Feature columns are computed from raw bytes (crc/mean) plus the
    decoder output vector. ``decoder='real'`` marks where PIL/ffmpeg
    would plug in."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media codecs (PIL/ffmpeg) are not available in "
                    "this environment; use decoder='fake'"
                )
            blobs = pdf["media"]
            n = len(pdf)
            n_bytes = np.empty(n, dtype=np.int64)
            crc = np.empty(n, dtype=np.int64)
            mean_m = np.empty(n, dtype=np.int64)
            feats = []
            for i, b in enumerate(blobs):
                b = bytes(b)
                n_bytes[i] = len(b)
                crc[i] = zlib.crc32(b[:64])
                arr = np.frombuffer(b, dtype=np.uint8)
                mean_m[i] = int(round(float(arr.mean()) * 1000)) if len(arr) else 0
                feats.append(_fake_decode(b, n_feat))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": n_bytes,
                    "head_crc": crc,
                    "byte_mean_milli": mean_m,
                    "feature": feats,
                }
            )

    return df.select("media_id", "media").mapInPandas(run, FEATURE_SCHEMA)
