"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns
with a metadata struct; decode/feature-extraction runs as Arrow-
batched ``mapInPandas`` so each Python worker sees whole byte batches
(the pattern that scales — per-row Python UDFs on multi-MB blobs do
not). Decoders are pluggable: ``decoder='fake'`` is a deterministic
byte-statistics decoder used by tests (codec-free, always available);
``decoder='real'`` is LIVE code gated on the optional codec library
(PIL for images, PyAV for frames) — on a codec-equipped host it
decodes for real, in this container it raises ``NotImplementedError``
at the exact call point, naming the missing package. Schema,
batching, partitioning, and UDF signatures are identical either way.
"""

from __future__ import annotations

import importlib.util

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require_codec(module: str, purpose: str):
    """Executor-side optional-dependency gate: returns the imported
    module (dotted names allowed), or raises NotImplementedError naming
    the missing codec (the check runs where the UDF runs — workers,
    not the driver)."""
    top = module.split(".", 1)[0]
    if importlib.util.find_spec(top) is None:
        raise NotImplementedError(
            f"decoder='real' needs the optional '{top}' package for "
            f"{purpose}; it is not installed in this environment — "
            f"install it or use decoder='fake'"
        )
    import importlib as _il

    return _il.import_module(module)

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
    decoder output vector. ``decoder='real'`` decodes with PIL
    (grayscale, resized to n_feat pixels, normalized to [0,1]) when
    PIL is installed; raises NotImplementedError naming it when not."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def _real_decode(blob: bytes, pil_image) -> np.ndarray:
        import io

        img = pil_image.open(io.BytesIO(blob)).convert("L")
        img = img.resize((n_feat, 1))
        px = np.asarray(img, dtype=np.float32).reshape(-1)[:n_feat]
        return px / np.float32(255.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        pil_image = None
        if decoder == "real":
            pil_image = _require_codec("PIL.Image", "image decode")

        for pdf in batches:
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
                if decoder == "real":
                    feats.append(_real_decode(b, pil_image))
                else:
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
    rewrite). ``decoder='real'`` runs PIL.Image.resize and re-encodes
    as PNG when PIL is installed; raises NotImplementedError naming it
    when not."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    out_n = int(width) * int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil_image = None
        if decoder == "real":
            pil_image = _require_codec("PIL.Image", "image resize")

        for pdf in batches:
            out = []
            metas = []
            for b in pdf["media"]:
                b = bytes(b)
                if decoder == "real":
                    import io

                    img = pil_image.open(io.BytesIO(b)).resize(
                        (int(width), int(height))
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out.append(buf.getvalue())
                    metas.append(
                        {"kind": "image/png", "width": int(width),
                         "height": int(height), "sample_rate": 0}
                    )
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                if len(arr) == 0:
                    out.append(b"\x00" * out_n)
                else:
                    idx = (
                        np.arange(out_n, dtype=np.int64) * len(arr) // out_n
                    )
                    out.append(arr[idx].tobytes())
                metas.append(
                    {"kind": "image/fake-resized", "width": int(width),
                     "height": int(height), "sample_rate": 0}
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media": out,
                    "meta": metas,
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
    every ``stride``-th; ``decoder='real'`` iterates container frames
    with PyAV (every ``stride``-th frame re-encoded to raw RGB bytes)
    when the ``av`` package is installed; raises NotImplementedError
    naming it when not."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    fb = int(frame_bytes)
    st = max(1, int(stride))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        av_mod = None
        if decoder == "real":
            av_mod = _require_codec("av", "video frame iteration")

        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["media"]):
                b = bytes(b)
                if decoder == "real":
                    import io

                    with av_mod.open(io.BytesIO(b)) as container:
                        for j, frame in enumerate(
                            container.decode(video=0)
                        ):
                            if j % st:
                                continue
                            raw = frame.to_ndarray(
                                format="rgb24"
                            ).tobytes()
                            ids.append(mid)
                            idxs.append(j)
                            frames.append(raw)
                            sizes.append(len(raw))
                    continue
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
