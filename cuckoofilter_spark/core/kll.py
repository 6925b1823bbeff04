"""KLL quantile sketch — compactor levels in numpy, seeded coin flips.

Karnin, Lang & Liberty 2016 (simplified fixed-capacity variant, like
the Apache DataSketches default): level i holds items of weight 2^i;
when a level overflows it is sorted and every other item (random
parity, seeded) is promoted. Rank error ~ O(1/k). Mergeable by
level-wise concatenation + re-compaction. ``percentile_approx`` is
the Spark-side oracle.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"KLL1"


class KLL:
    KIND = "kll"

    def __init__(self, k: int = 200, seed: int = 2014):
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.Generator(np.random.PCG64(seed))

    def _cap(self, level: int, num_levels: int) -> int:
        # geometric decay toward older levels, floor of 8
        c = int(np.ceil(self.k * (2.0 / 3.0) ** (num_levels - 1 - level)))
        return max(8, c)

    def add_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()

    def add_weighted(self, values: np.ndarray, weights: np.ndarray) -> None:
        """Insert ``values[i]`` with multiplicity ``weights[i]`` by
        binary weight decomposition (the DataSketches weighted-update
        scheme): a weight w lands one copy at each level i where bit i
        of w is set — level i items carry weight 2^i by construction,
        so the weighted rank contribution is exact at insert time and
        subsequent compactions apply the normal KLL guarantee."""
        v = np.asarray(values, dtype=np.float64)
        w = np.asarray(weights, dtype=np.int64)
        keep = ~np.isnan(v) & (w > 0)
        v, w = v[keep], w[keep]
        if len(v) == 0:
            return
        self.n += int(w.sum())
        for i in range(int(w.max()).bit_length()):
            sel = (w >> i) & 1 == 1
            if sel.any():
                while len(self.levels) <= i:
                    self.levels.append(np.zeros(0, dtype=np.float64))
                self.levels[i] = np.concatenate([self.levels[i], v[sel]])
        self._compact()

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            cap = self._cap(i, len(self.levels))
            lv = self.levels[i]
            if len(lv) > cap:
                lv = np.sort(lv, kind="stable")
                off = int(self._rng.integers(0, 2))
                promoted = lv[off::2]
                self.levels[i] = np.zeros(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.zeros(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def _weighted(self):
        vals = np.concatenate(self.levels) if self.levels else np.zeros(0)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, dtype=np.int64) for i, lv in enumerate(self.levels)]
        ) if self.levels else np.zeros(0, dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        vals, wts = self._weighted()
        if len(vals) == 0:
            return float("nan")
        cum = np.cumsum(wts)
        target = min(max(q, 0.0), 1.0) * cum[-1]
        j = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(j, len(vals) - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, value: float) -> float:
        """Approximate normalized rank of ``value``."""
        vals, wts = self._weighted()
        if len(vals) == 0:
            return float("nan")
        mask = vals <= value
        return float(wts[mask].sum() / wts.sum())

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("merge requires identical k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compact()
        return self

    def to_bytes(self) -> bytes:
        header = struct.pack(
            "<4sBxxxIIQQ", _MAGIC, 1, self.k, len(self.levels), self.n, self.seed
        )
        parts = [header]
        for lv in self.levels:
            parts.append(struct.pack("<Q", len(lv)))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        hs = struct.calcsize("<4sBxxxIIQQ")
        magic, ver, k, nlev, n, seed = struct.unpack("<4sBxxxIIQQ", blob[:hs])
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad kll blob")
        obj = cls(k=k, seed=seed)
        obj.n = n
        obj.levels = []
        off = hs
        for _ in range(nlev):
            (ln,) = struct.unpack("<Q", blob[off : off + 8])
            off += 8
            obj.levels.append(np.frombuffer(blob[off : off + 8 * ln], dtype=np.float64).copy())
            off += 8 * ln
        return obj
