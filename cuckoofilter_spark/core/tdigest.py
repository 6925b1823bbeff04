"""t-digest — merging variant (Dunning & Ertl 2019), numpy centroids.

Mergeable quantile sketch for double-valued columns. Not in the
reference repo (north-rule design target); Spark's
``percentile_approx`` (GK-based) is the cross-validation oracle.
Deterministic: compression is a pure function of the sorted input, no
randomness.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TDG1"


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)


class TDigest:
    KIND = "tdigest"

    def __init__(self, delta: float = 200.0, seed: int = 2014):
        self.delta = float(delta)
        self.seed = int(seed)  # unused (deterministic), kept for API symmetry
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._wbuf: list[np.ndarray | None] = []
        self._buf_n = 0
        self.count = 0.0
        self.min = np.inf
        self.max = -np.inf

    def add_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.count += len(v)
        self._buf.append(v)
        self._wbuf.append(None)  # unit weights, materialized at compress
        self._buf_n += len(v)
        if self._buf_n > 10 * self.delta:
            self._compress()

    def add_weighted(self, values: np.ndarray, weights: np.ndarray) -> None:
        """Insert ``values[i]`` with multiplicity ``weights[i]`` — the
        pre-aggregated form a JVM ``groupBy(value).count()`` produces.
        Because ``_compress`` collapses exact ties before the merge
        pass, a weighted insert of (v, c) is state-identical to a
        single-batch unit insert of c copies of v."""
        v = np.asarray(values, dtype=np.float64)
        w = np.asarray(weights, dtype=np.float64)
        keep = ~np.isnan(v) & (w > 0)
        v, w = v[keep], w[keep]
        if len(v) == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.count += float(w.sum())
        self._buf.append(v)
        self._wbuf.append(w)
        self._buf_n += len(v)
        if self._buf_n > 10 * self.delta:
            self._compress()

    def _compress(self, force: bool = False) -> None:
        # The early-out is only valid when ``means`` is already sorted
        # (true on the add path, NOT after a merge concatenation).
        if not force and self._buf_n == 0 and len(self.means) <= self.delta:
            return
        vals = np.concatenate([self.means] + self._buf) if self._buf else self.means
        wts = np.concatenate(
            [self.weights] + [
                np.ones(len(b)) if w is None else w
                for b, w in zip(self._buf, self._wbuf)
            ]
        ) if self._buf else self.weights
        self._buf, self._wbuf, self._buf_n = [], [], 0
        if len(vals) == 0:
            return
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        # Collapse exact ties before the greedy pass: the weighted mean
        # of equal values is the value itself, so this is lossless —
        # and it makes the state a pure function of the weighted value
        # MULTISET (unit and weighted inserts agree), while turning
        # discrete domains (cardinality ≲ delta) into an exact
        # fixed-point histogram.
        if len(vals) > 1:
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(vals) != 0) + 1]
            )
            if len(starts) < len(vals):
                wts = np.add.reduceat(wts, starts)
                vals = vals[starts]
        total = wts.sum()
        # single merge pass under the k1 scale function
        out_m, out_w = [], []
        cur_m, cur_w = vals[0], wts[0]
        w_so_far = 0.0
        for i in range(1, len(vals)):
            q0 = w_so_far / total
            q2 = (w_so_far + cur_w + wts[i]) / total
            if _k1(np.array([q2]), self.delta)[0] - _k1(np.array([q0]), self.delta)[0] <= 1.0:
                cur_m += (vals[i] - cur_m) * wts[i] / (cur_w + wts[i])
                cur_w += wts[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = vals[i], wts[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        q = min(max(q, 0.0), 1.0)
        target = q * self.count
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.min + (self.means[0] - self.min) * max(target, 0) / max(cum[0], 1e-12)) \
                if np.isfinite(self.min) else float(self.means[0])
        if target >= cum[-1]:
            span = self.count - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 0.0
            return float(self.means[-1] + (self.max - self.means[-1]) * min(frac, 1.0))
        j = int(np.searchsorted(cum, target))
        frac = (target - cum[j - 1]) / (cum[j] - cum[j - 1])
        return float(self.means[j - 1] + (self.means[j] - self.means[j - 1]) * frac)

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("merge requires identical delta")
        other._compress()
        if len(other.means):
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
        self.count += other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        # concatenation interleaves two sorted runs — force the sort+
        # merge pass even when the centroid count is under delta
        self._compress(force=True)
        return self

    def to_bytes(self) -> bytes:
        self._compress()
        header = struct.pack(
            "<4sBxxxdQdddd", _MAGIC, 1, self.delta, len(self.means),
            self.count, self.min, self.max, float(self.seed),
        )
        return header + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        hs = struct.calcsize("<4sBxxxdQdddd")
        magic, ver, delta, n, count, mn, mx, seed = struct.unpack("<4sBxxxdQdddd", blob[:hs])
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad tdigest blob")
        obj = cls(delta=delta, seed=int(seed))
        body = np.frombuffer(blob[hs:], dtype=np.float64)
        obj.means = body[:n].copy()
        obj.weights = body[n : 2 * n].copy()
        obj.count, obj.min, obj.max = count, mn, mx
        return obj
