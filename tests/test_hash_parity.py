"""Bit-exact parity of the numpy hash kernels vs the compiled
reference ``HashUtil`` (src/hashutil.cc).

Vectors were produced by compiling the reference out-of-tree and
hashing the 8 little-endian bytes of each uint64 key:
1-index BobHash(seed=0), 2-index BobHash(idx1=12345, idx2=67890),
SuperFastHash, NullHash(shiftbytes=4), MurmurHash(seed=314159).
"""

import numpy as np
import pytest

from cuckoofilter_spark.core.hashing import (
    BobHash, NullHash, SuperFastHash, bob_hash2_u64, bob_hash_u64,
    murmur2_u64, null_hash_u64, superfast_hash_u64,
)

# key, bob1(seed 0), bob2 idx1', bob2 idx2', sfh, null4, murmur(314159)
VECTORS = [
    (0x0000000000000000, 1489077439, 891705799, 1793997073,
     2791953481, 0, 859450806),
    (0x0000000000000001, 1430463807, 1356503389, 309160404,
     3344215587, 16777216, 2078846607),
    (0x00000000DEADBEEF, 3421966279, 2746737806, 2381590398,
     4165299000, 4005407966, 1506368976),
    (0x0123456789ABCDEF, 1302856372, 4093743715, 3375716210,
     3828254222, 4006390409, 1844804387),
    (0xFFFFFFFFFFFFFFFF, 1382321797, 2347847915, 3833959490,
     423441626, 4278124287, 4091234412),
    (0x9E3779B97F4A7C15, 2463662817, 1280841661, 2767810160,
     2639716291, 360467071, 1898270195),
]

KEYS = np.array([v[0] for v in VECTORS], dtype=np.uint64)


def test_bob_hash_1index_parity():
    got = bob_hash_u64(KEYS, seed=0)
    want = np.array([v[1] for v in VECTORS], dtype=np.uint32)
    assert (got == want).all(), (got, want)


def test_bob_hash_2index_parity():
    c, b = bob_hash2_u64(KEYS, 12345, 67890)
    want_c = np.array([v[2] for v in VECTORS], dtype=np.uint32)
    want_b = np.array([v[3] for v in VECTORS], dtype=np.uint32)
    assert (c == want_c).all(), (c, want_c)
    assert (b == want_b).all(), (b, want_b)


def test_superfast_hash_parity():
    got = superfast_hash_u64(KEYS)
    want = np.array([v[4] for v in VECTORS], dtype=np.uint32)
    assert (got == want).all(), (got, want)


def test_null_hash_parity():
    got = null_hash_u64(KEYS, shiftbytes=4)
    want = np.array([v[5] for v in VECTORS], dtype=np.uint32)
    assert (got == want).all(), (got, want)
    # reference returns 0 when fewer than 4 bytes remain
    assert (null_hash_u64(KEYS, shiftbytes=5) == 0).all()


def test_murmur2_parity():
    got = murmur2_u64(KEYS, seed=314159)
    want = np.array([v[6] for v in VECTORS], dtype=np.uint32)
    assert (got == want).all(), (got, want)


@pytest.mark.parametrize("family", ["bob", "superfast", "null", "md5", "sha1"])
def test_new_families_filter_roundtrip(family):
    """Each family plugs into the filter ctor: zero false negatives,
    sane FPR, and blob round-trip preserves the family byte."""
    from cuckoofilter_spark.core.cuckoo import CuckooFilter
    from cuckoofilter_spark.core.registry import sketch_from_bytes
    from cuckoofilter_spark.sources.keys import disjoint_key_sets

    add, probe = disjoint_key_sets(50_000, 50_000, seed=13)
    f = CuckooFilter(60_000, 12, seed=13, hash_family=family)
    f.add_many(add)
    assert f.contains_many(add).all(), "false negative"
    fpr = float(f.contains_many(probe).mean())
    assert fpr < 0.01, fpr  # f=12 bound ~= 2*4/2^12 = 0.2%

    m = sketch_from_bytes(f.to_bytes())
    assert m.hash_family == family
    assert m.contains_many(add).all()

    # cross-family merge must be refused
    g = CuckooFilter(60_000, 12, seed=13, hash_family="multiply_shift")
    with pytest.raises(ValueError):
        m.merge(g)


def test_md5_sha1_digest_parity():
    """Batch MD5/SHA-1 of the 8 LE key bytes are bit-exact vs hashlib
    over random keys (the reference's EVP wrapper semantics,
    src/hashutil.h:39-41, on the filter's fixed-width item type)."""
    import hashlib

    from cuckoofilter_spark.core.hashing import (
        md5_digest_u64, md5_hash64, sha1_digest_u64, sha1_hash64,
    )

    rng = np.random.default_rng(77)
    keys = rng.integers(0, 2**64, 500, dtype=np.uint64)
    md = md5_digest_u64(keys)
    sh = sha1_digest_u64(keys)
    h64m = md5_hash64(keys)
    h64s = sha1_hash64(keys)
    for i, k in enumerate(keys):
        b = int(k).to_bytes(8, "little")
        want_md = hashlib.md5(b).digest()
        want_sh = hashlib.sha1(b).digest()
        assert md[i].tobytes() == want_md, i
        assert sh[i].tobytes() == want_sh, i
        assert int(h64m[i]) == int.from_bytes(want_md[:8], "little")
        assert int(h64s[i]) == int.from_bytes(want_sh[:8], "little")


def test_seeded_families_differ_by_seed():
    for family in ("bob", "superfast", "md5", "sha1"):
        from cuckoofilter_spark.core.hashing import HASH_FAMILIES

        h1 = HASH_FAMILIES[family](1).hash64(KEYS)
        h2 = HASH_FAMILIES[family](2).hash64(KEYS)
        assert (h1 != h2).any(), family
