"""Count-min sketch — 2-D numpy counter matrix, merge = elementwise add.

Cormode & Muthukrishnan 2005. Guarantees: point estimate >= true count,
and <= true count + eps*N with probability >= 1-delta, where
width = ceil(e/eps), depth = ceil(ln(1/delta)). Spark's SQL
``count_min_sketch`` is the built-in analog / oracle.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from cuckoofilter_spark.core.hashing import mix64

_MAGIC = b"CMS1"


class CountMinSketch:
    KIND = "cms"

    def __init__(self, eps: float = 0.0005, delta: float = 0.01, seed: int = 2014):
        self.eps = float(eps)
        self.delta = float(delta)
        self.width = int(math.ceil(math.e / eps))
        self.depth = int(math.ceil(math.log(1.0 / delta)))
        self.seed = int(seed)
        self.counts = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        cols = np.empty((self.depth, len(keys)), dtype=np.int64)
        for d in range(self.depth):
            cols[d] = (mix64(keys, self.seed * 31 + d) % np.uint64(self.width)).astype(np.int64)
        return cols

    def add_many(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(keys) == 0:
            return
        cols = self._cols(keys)
        # bincount, not np.add.at (round 8): the per-element ufunc
        # scatter runs ~0.6M updates/s; bincount is one C pass per row
        # (identical sums — float64 weight accumulation is exact below
        # 2^53, far beyond any per-cell count here)
        if counts is None:
            for d in range(self.depth):
                self.counts[d] += np.bincount(
                    cols[d], minlength=self.width
                )
            self.total += len(keys)
        else:
            w = np.asarray(counts, dtype=np.float64)
            for d in range(self.depth):
                self.counts[d] += np.bincount(
                    cols[d], weights=w, minlength=self.width
                ).astype(np.int64)
            self.total += int(counts.sum())

    def query_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(keys)
        est = self.counts[0][cols[0]]
        for d in range(1, self.depth):
            np.minimum(est, self.counts[d][cols[d]], out=est)
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth, other.seed) != (self.width, self.depth, self.seed):
            raise ValueError("merge requires identical geometry and seed")
        self.counts += other.counts
        self.total += other.total
        return self

    def to_bytes(self) -> bytes:
        header = struct.pack(
            "<4sBxxxIIQQdd", _MAGIC, 1, self.depth, self.width,
            self.total, self.seed, self.eps, self.delta,
        )
        return header + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        hs = struct.calcsize("<4sBxxxIIQQdd")
        magic, ver, depth, width, total, seed, eps, delta = struct.unpack(
            "<4sBxxxIIQQdd", blob[:hs]
        )
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad cms blob")
        obj = cls.__new__(cls)
        obj.eps, obj.delta, obj.width, obj.depth = eps, delta, width, depth
        obj.seed, obj.total = seed, total
        obj.counts = np.frombuffer(blob[hs:], dtype=np.int64).reshape(depth, width).copy()
        return obj
