"""HyperLogLog — dense numpy registers, mergeable by elementwise max.

Standard Flajolet et al. 2007 estimator with the small-range linear
counting correction. Not in the reference repo (it is a design target
of the north rule); Spark's ``approx_count_distinct`` /
``hll_sketch_agg`` serve as cross-validation oracles, not the
implementation. Relative error ≈ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import struct

import numpy as np

from cuckoofilter_spark.core.hashing import clz64, mix64

_MAGIC = b"HLL1"


class HyperLogLog:
    KIND = "hll"

    def __init__(self, p: int = 14, seed: int = 2014):
        if not 4 <= p <= 18:
            raise ValueError("p out of range")
        self.p = int(p)
        self.m = 1 << self.p
        self.seed = int(seed)
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.m == 16:
            self.alpha = 0.673
        elif self.m == 32:
            self.alpha = 0.697
        elif self.m == 64:
            self.alpha = 0.709
        else:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        hv = mix64(np.ascontiguousarray(keys, dtype=np.uint64), self.seed)
        idx = (hv >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = leading zeros of the remaining (64-p) bits, + 1
        rest = hv << np.uint64(self.p)  # wraps: low bits shifted up
        rank = np.minimum(clz64(rest) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p or other.seed != self.seed:
            raise ValueError("merge requires identical p and seed")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        raw = self.alpha * self.m * self.m / np.sum(np.exp2(-regs))
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * self.m and zeros:
            return self.m * np.log(self.m / zeros)  # linear counting
        return float(raw)

    def to_bytes(self) -> bytes:
        header = struct.pack("<4sBBxxQ", _MAGIC, 1, self.p, self.seed)
        return header + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        hs = struct.calcsize("<4sBBxxQ")
        magic, ver, p, seed = struct.unpack("<4sBBxxQ", blob[:hs])
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad hll blob")
        obj = cls(p=p, seed=seed)
        obj.registers = np.frombuffer(blob[hs:], dtype=np.uint8).copy()
        return obj
