"""Vectorized hash kernels (numpy, batch-first).

Re-expresses the hash family the reference filter actually uses —
``TwoIndependentMultiplyShift`` (reference ``src/hashutil.h:49-67``):
``h(key) = (add + multiply * key) >> 64`` where ``add``/``multiply``
are 128-bit constants. The reference draws them from
``std::random_device`` (non-reproducible, ``src/hashutil.h:53-62``);
we derive them from an explicit seed so distributed builds are
deterministic and shard filters share one hash family (a precondition
for merging).

All functions are batch-vectorized over ``numpy`` ``uint64`` arrays.
128-bit arithmetic is decomposed into 32-bit limbs so that plain
wrapping ``uint64`` multiplies suffice.
"""

from __future__ import annotations

import numpy as np

_MASK32 = np.uint64(0xFFFFFFFF)
_MURMUR_C = np.uint32(0x5BD1E995)  # MurmurHash2 constant reused by AltIndex
                                   # (reference src/cuckoofilter.h:77-78)

# Older numpy raises on uint64 <op> python-int in some paths; keep u64 consts.
_U32 = np.uint64(32)


def _umulhi64(a: np.ndarray, b: np.uint64) -> np.ndarray:
    """High 64 bits of the 64x64->128 product, vectorized.

    Standard 32-bit limb decomposition; every multiply wraps mod 2^64
    which numpy uint64 arithmetic does natively.
    """
    a_lo = a & _MASK32
    a_hi = a >> _U32
    b_lo = b & _MASK32
    b_hi = b >> _U32

    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi

    # carry out of the low word
    cross = (ll >> _U32) + (lh & _MASK32) + (hl & _MASK32)
    return hh + (lh >> _U32) + (hl >> _U32) + (cross >> _U32)


class MultiplyShift:
    """Two-independent multiply-shift over 128-bit state, seeded.

    ``hash(key) = high64(add128 + mul128 * key)`` — same formula as the
    reference's default hash family; seeds are explicit for
    reproducibility across executors.
    """

    __slots__ = ("mul_lo", "mul_hi", "add_lo", "add_hi", "seed")

    def __init__(self, seed: int):
        self.seed = int(seed)
        rng = np.random.Generator(np.random.PCG64(seed))
        draws = rng.integers(0, 2**64, size=4, dtype=np.uint64)
        # force multiplier odd (standard multiply-shift hygiene)
        self.mul_lo = np.uint64(draws[0] | np.uint64(1))
        self.mul_hi = np.uint64(draws[1])
        self.add_lo = np.uint64(draws[2])
        self.add_hi = np.uint64(draws[3])

    def hash64(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        prod_hi = _umulhi64(keys, self.mul_lo) + keys * self.mul_hi
        prod_lo = keys * self.mul_lo
        lo = prod_lo + self.add_lo
        carry = (lo < prod_lo).astype(np.uint64)
        return prod_hi + self.add_hi + carry


def index_hash(hv: np.ndarray, num_buckets: int) -> np.ndarray:
    """Bucket index from the upper 32 hash bits (reference
    ``src/cuckoofilter.h:66-71``): power-of-two table -> AND mask."""
    return (hv >> _U32) & np.uint64(num_buckets - 1)


def tag_hash(hv: np.ndarray, bits_per_item: int) -> np.ndarray:
    """Fingerprint from the low ``f`` bits; 0 is reserved for empty so
    0 bumps to 1 (reference ``src/cuckoofilter.h:59-64``)."""
    tag = (hv & np.uint64((1 << bits_per_item) - 1)).astype(np.uint32)
    tag += (tag == 0).astype(np.uint32)
    return tag


def alt_index(index: np.ndarray, tag: np.ndarray, num_buckets: int) -> np.ndarray:
    """Partial-key alternate bucket: ``i ^ (tag * 0x5bd1e995)`` in
    wrapping uint32, masked to the table (reference
    ``src/cuckoofilter.h:73-79``). Self-inverse: alt(alt(i,t),t) == i.
    """
    ix = index.astype(np.uint32)
    t = tag.astype(np.uint32) * _MURMUR_C
    return ((ix ^ t) & np.uint32(num_buckets - 1)).astype(np.uint64)


def upperpower2(x: int) -> int:
    """Next power of two >= x (reference ``src/bitsutil.h:21-31``)."""
    if x <= 1:
        return 1
    return 1 << (int(x) - 1).bit_length()


def clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64, vectorized and exact (binary
    search over bit spans — no float log2 rounding hazards)."""
    x = x.astype(np.uint64, copy=True)
    n = np.full(x.shape, 64, dtype=np.int64)
    shift = 32
    total = np.zeros(x.shape, dtype=np.int64)
    while shift:
        s = np.uint64(shift)
        high = x >> s
        has = high != 0
        x = np.where(has, high, x)
        total = total + np.where(has, shift, 0)
        shift >>= 1
    # total = floor(log2(x)) for x != 0 (position of highest set bit)
    return np.where(x == 0, n, 63 - total).astype(np.int64)


def mix64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Cheap strong 64-bit mixer (splitmix64 finalizer) — used for
    companion sketches where full 2-independence is not required."""
    z = np.ascontiguousarray(keys, dtype=np.uint64) + np.uint64(
        (0x9E3779B97F4A7C15 * (seed * 2 + 1)) & 0xFFFFFFFFFFFFFFFF
    )
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_bytes_to_u64(values, seed: int = 0) -> np.ndarray:
    """Reduce arbitrary python/bytes/str values to uint64 via FNV-1a
    then splitmix — driver-side convenience only (hot paths hash int64
    columns vectorized)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if isinstance(v, str):
            v = v.encode("utf-8")
        elif not isinstance(v, (bytes, bytearray)):
            v = str(v).encode("utf-8")
        h = 0xCBF29CE484222325
        for b in v:
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return mix64(out, seed)


class SimpleTabulation:
    """Tabulation hashing over the 8 bytes of a uint64 key — XOR of
    eight 256-entry random tables (reference ``src/hashutil.h:70-90``).
    3-independent; vectorized as a byte-gather + XOR reduction."""

    __slots__ = ("tables", "seed")

    def __init__(self, seed: int):
        self.seed = int(seed)
        rng = np.random.Generator(np.random.PCG64(seed ^ 0x7AB7AB))
        self.tables = rng.integers(0, 2**64, size=(8, 256), dtype=np.uint64)

    def hash64(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=np.uint64)
        for byte in range(8):
            idx = ((keys >> np.uint64(8 * byte)) & np.uint64(0xFF)).astype(
                np.int64
            )
            out ^= self.tables[byte][idx]
        return out


# Pluggable hash family — the role of the reference's ``HashFamily``
# template parameter (src/cuckoofilter.h:32-35). The reference ships
# tabulation hashing because multiply-shift has known pathological key
# sets (benchmarks/random.h:16-20). Family ids are serialized in the
# filter blob header so merges can refuse cross-family unions.
HASH_FAMILIES = {
    "multiply_shift": MultiplyShift,
    "tabulation": SimpleTabulation,
}
FAMILY_IDS = {"multiply_shift": 0, "tabulation": 1}
FAMILY_NAMES = {v: k for k, v in FAMILY_IDS.items()}
