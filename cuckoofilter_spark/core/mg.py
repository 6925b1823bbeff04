"""Misra-Gries heavy-hitters summary — sorted numpy key/count arrays.

Misra & Gries 1982; mergeable batch form per Agarwal, Cormode et al.
2012 ("Mergeable Summaries"): a summary of at most ``k`` counters
where every stored count UNDER-estimates the true frequency by at
most ``err`` (the cumulative decrement), and every key whose true
count exceeds ``err`` is guaranteed PRESENT. The one-sided complement
of count-min (which over-estimates): CMS answers "at most how often",
MG answers "which keys are frequent, and at least how often".

Batch insert and merge are the same operation: union-add the sorted
(key, count) arrays, and if more than ``k`` counters survive,
subtract the (k+1)-th largest count from all and drop the non-
positive ones — one ``np.partition`` + vectorized arithmetic, no
per-item loop. ``err`` accumulates every subtraction, preserving the
invariants across arbitrary merge trees (the property the
distributed partial+final build relies on):

    true(key) - err <= query(key) <= true(key)
    true(key) >  err  =>  key is stored

Guarantee strength: a fresh summary gives err <= N/(k+1); a tree
merge of partial summaries adds their errors, still bounded by
N_total/(k+1) because decrements count disjoint stream mass.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"MGS1"


class MisraGries:
    KIND = "mg"

    def __init__(self, k: int = 1024, seed: int = 2014):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = int(k)
        self.seed = int(seed)  # unused (deterministic); API symmetry
        self.keys = np.zeros(0, dtype=np.uint64)     # sorted ascending
        self.counts = np.zeros(0, dtype=np.int64)    # aligned with keys
        self.total = 0        # stream mass seen (for eps*N statements)
        self.err = 0          # cumulative decrement: max undercount

    # ------------------------------------------------------------ insert
    def add_many(self, keys: np.ndarray,
                 counts: np.ndarray | None = None) -> None:
        n = len(keys)
        if n == 0:
            return
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if counts is None:
            u, c = np.unique(keys, return_counts=True)
            c = c.astype(np.int64)
        else:
            c = np.ascontiguousarray(counts, dtype=np.int64)
            keep = c > 0
            keys, c = keys[keep], c[keep]
            if len(keys) == 0:
                return
            order = np.argsort(keys, kind="stable")
            u, c = keys[order], c[order]
            # collapse duplicate keys within the batch
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(u) != 0) + 1]
            ) if len(u) > 1 else np.array([0])
            if len(starts) < len(u):
                c = np.add.reduceat(c, starts)
                u = u[starts]
        self.total += int(c.sum())
        self._union_add(u, c)

    def add_weighted(self, keys: np.ndarray, weights: np.ndarray) -> None:
        self.add_many(keys, np.asarray(weights))

    def _union_add(self, u: np.ndarray, c: np.ndarray) -> None:
        """Merge a SORTED distinct (key, count) batch into the summary,
        then shrink to k counters by the Misra-Gries decrement."""
        if len(self.keys):
            allk = np.concatenate([self.keys, u])
            allc = np.concatenate([self.counts, c])
            order = np.argsort(allk, kind="stable")
            allk, allc = allk[order], allc[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(allk) != 0) + 1]
            )
            if len(starts) < len(allk):
                allc = np.add.reduceat(allc, starts)
                allk = allk[starts]
        else:
            allk, allc = u, c
        if len(allk) > self.k:
            # (k+1)-th largest count = the decrement that leaves at
            # most k positive counters
            dec = int(np.partition(allc, len(allc) - self.k - 1)[
                len(allc) - self.k - 1
            ])
            allc = allc - dec
            keep = allc > 0
            allk, allc = allk[keep], allc[keep]
            self.err += dec
        self.keys, self.counts = allk, allc

    # ------------------------------------------------------------- query
    def query_many(self, keys: np.ndarray) -> np.ndarray:
        """Stored count per key (0 if absent): a LOWER bound on the
        true frequency; true <= stored + err."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if len(self.keys) == 0 or len(keys) == 0:
            return np.zeros(len(keys), dtype=np.int64)
        pos = np.searchsorted(self.keys, keys)
        pos = np.minimum(pos, len(self.keys) - 1)
        hit = self.keys[pos] == keys
        out = np.where(hit, self.counts[pos], 0)
        return out.astype(np.int64)

    def heavy_hitters(self, threshold: int) -> tuple[np.ndarray, np.ndarray]:
        """(keys, lower-bound counts) of every stored key whose TRUE
        count could reach ``threshold`` (stored + err >= threshold) —
        a superset of the true hitters whenever threshold > err
        (presence guarantee), to be exact-verified downstream."""
        m = self.counts + self.err >= int(threshold)
        return self.keys[m], self.counts[m]

    # ------------------------------------------------------------- merge
    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError("merge requires identical k")
        self.total += other.total
        self.err += other.err
        if len(other.keys):
            self._union_add(other.keys, other.counts)
        return self

    # --------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        header = struct.pack(
            "<4sBxxxIQQQQ", _MAGIC, 1, self.k, len(self.keys),
            self.total, self.err, self.seed,
        )
        return header + self.keys.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        hs = struct.calcsize("<4sBxxxIQQQQ")
        if len(blob) < hs:
            raise ValueError("bad mg blob: short header")
        magic, ver, k, n, total, err, seed = struct.unpack(
            "<4sBxxxIQQQQ", blob[:hs]
        )
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad mg blob")
        obj = cls(k=k, seed=int(seed))
        body = blob[hs:]
        if len(body) != 16 * n:
            raise ValueError("bad mg blob length")
        obj.keys = np.frombuffer(body[: 8 * n], dtype=np.uint64).copy()
        obj.counts = np.frombuffer(body[8 * n:], dtype=np.int64).copy()
        # direct elementwise uint64 comparison — np.diff wraps mod
        # 2^64, so a valid adjacent-key gap >= 2^63 would look
        # negative after an int64 cast and falsely reject the blob
        if n > 1 and not bool(np.all(obj.keys[1:] > obj.keys[:-1])):
            raise ValueError("bad mg blob: keys not strictly sorted")
        obj.total, obj.err = int(total), int(err)
        return obj
