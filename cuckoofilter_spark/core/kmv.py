"""KMV (k-minimum-values / bottom-k, theta-sketch family) distinct
sketch — mergeable, and the companion that does SET ALGEBRA properly.

Not in the reference repo (north-rule companion tier, same status as
HLL/CMS — SURVEY.md §2.10/§2.11). Where HLL can only estimate an
intersection by inclusion–exclusion (error scales with |A∪B|, so
small overlaps drown, `operators/approx.py approx_overlap`), KMV
keeps an actual uniform sample of the hashed key space: the k
smallest 64-bit hash values. Any set expression is then evaluated ON
THE SAMPLES below the common threshold θ and scaled by 1/θ — the
error scales with the RESULT's size (Beyer et al., SIGMOD'07;
Dasgupta et al.'s theta sketches generalize the same idea).

Estimator: with v_(k) the k-th smallest of n>k distinct hashes,
E[v_(k)/2^64] ≈ k/(n+1) ⇒ n̂ = (k-1)/θ with θ = v_(k)/2^64 (the
unbiased form drops one). Below k values the sketch is EXACT (it
holds every distinct hash seen). RSE ≈ 1/sqrt(k-2).

Merge = union of value arrays, keep the k smallest — associative and
commutative, same monoid contract as the other companions.
"""

from __future__ import annotations

import struct

import numpy as np

from cuckoofilter_spark.core.hashing import mix64

_MAGIC = b"KMV1"
_SPACE = float(1 << 64)


class KMVSketch:
    KIND = "kmv"

    def __init__(self, k: int = 1024, seed: int = 2014):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        # sorted ascending, distinct hashed values, len <= k
        self.values = np.empty(0, dtype=np.uint64)

    # ------------------------------------------------------------ build
    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        hv = mix64(np.ascontiguousarray(keys, dtype=np.uint64), self.seed)
        if len(self.values):
            hv = np.concatenate([self.values, hv])
        self.values = np.unique(hv)[: self.k]  # unique() sorts

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        if other.k != self.k or other.seed != self.seed:
            raise ValueError("merge requires identical k and seed")
        self.values = np.unique(
            np.concatenate([self.values, other.values])
        )[: self.k]
        return self

    # -------------------------------------------------------- estimates
    def _theta(self) -> float:
        """Inclusion threshold: fraction of hash space this sketch's
        sample covers (1.0 while not yet full ⇒ exact mode)."""
        if len(self.values) < self.k:
            return 1.0
        return float(self.values[self.k - 1]) / _SPACE

    def estimate(self) -> float:
        n = len(self.values)
        if n < self.k:
            return float(n)
        return (self.k - 1) / self._theta()

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<4sIQI", _MAGIC, self.k, self.seed, len(self.values)
        )
        return head + self.values.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KMVSketch":
        blob = bytes(blob)
        head = struct.calcsize("<4sIQI")
        if len(blob) < head:
            raise ValueError("KMV blob shorter than header")
        magic, k, seed, n = struct.unpack_from("<4sIQI", blob, 0)
        if magic != _MAGIC:
            raise ValueError(f"bad KMV magic {magic!r}")
        off = struct.calcsize("<4sIQI")
        if len(blob) != off + 8 * n or n > k:
            raise ValueError("KMV blob length/count mismatch")
        sk = cls(k=k, seed=seed)
        sk.values = np.frombuffer(blob, dtype=np.uint64, count=n,
                                  offset=off).copy()
        # elementwise compare, NOT np.diff: uint64 diff wraps mod 2^64,
        # so a decreasing pair yields a huge positive delta and an
        # unsorted blob would slip through to corrupt _theta()
        if n and np.any(sk.values[1:] <= sk.values[:-1]):
            raise ValueError("KMV blob values not strictly increasing")
        return sk


def kmv_set_estimates(a: KMVSketch, b: KMVSketch) -> dict:
    """Distinct / union / intersection / jaccard estimates from two
    KMV sketches with the same (k, seed).

    All sets are evaluated on the samples below the COMMON threshold
    θ = min(θ_a, θ_b) — each is a uniform θ-sample of its key set, so
    |expr(samples)|/θ estimates |expr(sets)|; jaccard is the ratio of
    the sample counts directly (the θ cancels), which is how the
    relative error stays ~1/sqrt(k) even for small overlaps."""
    if a.k != b.k or a.seed != b.seed:
        raise ValueError("set estimates require identical k and seed")
    theta = min(a._theta(), b._theta())
    if theta >= 1.0:
        sa, sb = a.values, b.values
    else:
        lim = np.uint64(min(int(theta * _SPACE), (1 << 64) - 1))
        sa = a.values[a.values < lim]
        sb = b.values[b.values < lim]
    n_inter = len(np.intersect1d(sa, sb, assume_unique=True))
    n_union = len(sa) + len(sb) - n_inter
    return {
        "n_a": float(a.estimate()),
        "n_b": float(b.estimate()),
        "n_union": n_union / theta,
        "n_intersection": n_inter / theta,
        "jaccard": (n_inter / n_union) if n_union else 0.0,
    }
