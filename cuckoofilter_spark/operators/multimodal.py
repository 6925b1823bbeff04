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


RESIZED_SCHEMA = (
    "media_id long, media binary, "
    "meta struct<kind:string, width:int, height:int, sample_rate:int>"
)


def resize_media(
    df: DataFrame, *, width: int, height: int = 1, decoder: str = "fake",
) -> DataFrame:
    """Batched resize over media blobs (``mapInPandas``).

    ``decoder='fake'`` treats the blob as a 1×N byte image and
    resamples it to ``width*height`` bytes by nearest-neighbor index
    sampling — deterministic, codec-free, but exercises the real
    plumbing (Arrow batches of binary in AND out, metadata struct
    rewrite). ``decoder='real'`` raises at the exact point
    PIL.Image.resize would run."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    out_n = int(width) * int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media codecs (PIL/ffmpeg) are not available in "
                    "this environment; use decoder='fake'"
                )
            out = []
            for b in pdf["media"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    out.append(b"\x00" * out_n)
                    continue
                idx = (
                    np.arange(out_n, dtype=np.int64) * len(arr) // out_n
                )
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media": out,
                    "meta": [
                        {"kind": "image/fake-resized", "width": int(width),
                         "height": int(height), "sample_rate": 0}
                    ] * len(pdf),
                }
            )

    return df.select("media_id", "media").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame binary, frame_bytes long"


def sample_frames(
    df: DataFrame, *, frame_bytes: int = 256, stride: int = 1,
    decoder: str = "fake",
) -> DataFrame:
    """Frame sampling: one input blob → many frame rows
    (``mapInPandas`` yielding a fanned-out batch — the 1:N shape real
    video frame extraction has).

    ``decoder='fake'`` treats the blob as a concatenation of
    ``frame_bytes``-sized frames (last partial frame kept) and emits
    every ``stride``-th; ``decoder='real'`` raises where ffmpeg/
    pyav frame iteration would run."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    fb = int(frame_bytes)
    st = max(1, int(stride))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media codecs (ffmpeg/pyav) are not available in "
                    "this environment; use decoder='fake'"
                )
            ids, idxs, frames, sizes = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["media"]):
                b = bytes(b)
                n_frames = (len(b) + fb - 1) // fb
                for j in range(0, n_frames, st):
                    chunk = b[j * fb:(j + 1) * fb]
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(chunk)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "media_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "frame": frames,
                    "frame_bytes": np.asarray(sizes, dtype=np.int64),
                }
            )

    return df.select("media_id", "media").mapInPandas(run, FRAME_SCHEMA)
