"""Property cross-check of the vectorized hash kernels against
independent scalar mirrors written directly from the published
algorithms (Jenkins lookup3, Hsieh SuperFastHash, MurmurHash2) in
plain-int arithmetic with explicit masks — catching any numpy
wrap/carry divergence the 6 fixed parity vectors might miss."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cuckoofilter_spark.core.hashing import (
    bob_hash2_u64, murmur2_u64, superfast_hash_u64,
)

M32 = 0xFFFFFFFF


def _rot(x, k):
    return ((x << k) | (x >> (32 - k))) & M32


def _scalar_bob2(key, s1, s2):
    k0 = key & M32
    k1 = (key >> 32) & M32
    init = (0xDEADBEEF + 8 + s1) & M32
    a = (k0 + init) & M32
    b = (k1 + init) & M32
    c = (init + s2) & M32
    c ^= b; c = (c - _rot(b, 14)) & M32
    a ^= c; a = (a - _rot(c, 11)) & M32
    b ^= a; b = (b - _rot(a, 25)) & M32
    c ^= b; c = (c - _rot(b, 16)) & M32
    a ^= c; a = (a - _rot(c, 4)) & M32
    b ^= a; b = (b - _rot(a, 14)) & M32
    c ^= b; c = (c - _rot(b, 24)) & M32
    return c, b


def _scalar_sfh(key):
    w = [(key >> (16 * i)) & 0xFFFF for i in range(4)]
    h = 8
    for lo, hi in ((w[0], w[1]), (w[2], w[3])):
        h = (h + lo) & M32
        tmp = ((hi << 11) ^ h) & M32
        h = ((h << 16) ^ tmp) & M32
        h = (h + (h >> 11)) & M32
    h ^= (h << 3) & M32
    h = (h + (h >> 5)) & M32
    h ^= (h << 4) & M32
    h = (h + (h >> 17)) & M32
    h ^= (h << 25) & M32
    h = (h + (h >> 6)) & M32
    return h


def _scalar_murmur2(key, seed):
    m = 0x5BD1E995
    h = (seed ^ 8) & M32
    for k in (key & M32, (key >> 32) & M32):
        k = (k * m) & M32
        k ^= k >> 24
        k = (k * m) & M32
        h = (h * m) & M32
        h ^= k
    h ^= h >> 13
    h = (h * m) & M32
    h ^= h >> 15
    return h


@settings(max_examples=300, deadline=None)
@given(
    keys=st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=40),
    s1=st.integers(0, M32),
    s2=st.integers(0, M32),
)
def test_bob2_matches_scalar_mirror(keys, s1, s2):
    arr = np.array(keys, dtype=np.uint64)
    c, b = bob_hash2_u64(arr, s1, s2)
    for i, k in enumerate(keys):
        sc, sb = _scalar_bob2(k, s1, s2)
        assert int(c[i]) == sc and int(b[i]) == sb


@settings(max_examples=300, deadline=None)
@given(keys=st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=40))
def test_sfh_matches_scalar_mirror(keys):
    arr = np.array(keys, dtype=np.uint64)
    got = superfast_hash_u64(arr)
    for i, k in enumerate(keys):
        assert int(got[i]) == _scalar_sfh(k)


@settings(max_examples=300, deadline=None)
@given(
    keys=st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=40),
    seed=st.integers(0, M32),
)
def test_murmur2_matches_scalar_mirror(keys, seed):
    arr = np.array(keys, dtype=np.uint64)
    got = murmur2_u64(arr, seed)
    for i, k in enumerate(keys):
        assert int(got[i]) == _scalar_murmur2(k, seed)
