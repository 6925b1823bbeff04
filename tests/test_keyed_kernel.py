"""Keyed-kernel mode (round 7, ADVICE fix): seeds >= 2**32 derive the
polynomial init AND multiplier (and the giant-span blake2b key) from
the seed, so shingle-hash collisions are no longer adversarially
constructible from public constants. Default (< 2**32) seeds must stay
bit-identical to the round-6 kernel — the SQL oracles and every
recorded contract hash depend on it."""

from __future__ import annotations

import numpy as np
import pytest

from cuckoofilter_spark.operators.dedup import (
    _POLY_C,
    _kernel_key,
    _shingle_hashes,
    gram_string_hashes,
    near_dup_pairs_minhash,
    random_kernel_seed,
)

TEXT = "the quick brown fox jumps over"


def test_default_seed_bit_compat_round6():
    # snapshot taken from the round-6 kernel before the keyed-mode change
    assert [int(x) for x in _shingle_hashes(TEXT, 3, 2014)] == [
        2268934579748095599,
        4220491395490501614,
        4537434593628044499,
        13662639224492304539,
    ]
    assert [
        int(x)
        for x in gram_string_hashes(["the quick brown", "quick brown fox"], 2014)
    ] == [13662639224492304539, 4220491395490501614]


def test_kernel_key_modes():
    init, mult, salt = _kernel_key(2014)
    assert int(init) == 2014 and mult == _POLY_C
    assert salt == (2014).to_bytes(8, "little")
    s = random_kernel_seed()
    assert s >= 2**32
    init_k, mult_k, salt_k = _kernel_key(s)
    assert mult_k != _POLY_C and int(mult_k) % 2 == 1
    assert _kernel_key(s) == (init_k, mult_k, salt_k)  # deterministic
    # distinct seeds give distinct keys
    assert _kernel_key(random_kernel_seed())[1] != mult_k


def test_keyed_mode_changes_hashes_and_stays_consistent():
    s1, s2 = random_kernel_seed(), random_kernel_seed()
    h1 = _shingle_hashes(TEXT, 3, s1)
    assert np.array_equal(h1, _shingle_hashes(TEXT, 3, s1))
    assert not np.array_equal(np.sort(h1), np.sort(_shingle_hashes(TEXT, 3, s2)))
    assert not np.array_equal(np.sort(h1), np.sort(_shingle_hashes(TEXT, 3, 2014)))
    # cross-entry-point agreement (decontam build/probe contract):
    # joined gram strings hash identically to the sliding-window path
    grams = [
        "the quick brown",
        "quick brown fox",
        "brown fox jumps",
        "fox jumps over",
    ]
    g = gram_string_hashes(grams, s1)
    assert {int(x) for x in g} == {int(x) for x in h1}


def test_keyed_mode_giant_span_path():
    s = random_kernel_seed()
    t = "x" * 5000 + " middle words here " + "y" * 5000
    a, b = _shingle_hashes(t, 2, s), _shingle_hashes(t, 2, s)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, _shingle_hashes(t, 2, 2014))


def test_equal_length_collision_structure_is_keyed():
    # with a public multiplier, equal-length word collisions cancel the
    # seed: h(w1) - h(w2) is seed-independent. Keyed mode must break the
    # known-multiplier construction: craft two words colliding under
    # _POLY_C and check they do NOT collide under a keyed multiplier.
    # bytes: [a, b] vs [a+1, b-C] have equal polynomial value iff
    # (a*C + b) == ((a+1)*C + b - C) — always. Use printable deltas.
    c = int(_POLY_C)
    w1 = bytes([65, 90]).decode()  # 'AZ'
    # second word: poly = (65+1)*C + (90 - C) mod 2^64 — not byte-valued,
    # so emulate at the word-hash level instead: verify the DIFFERENCE
    # of two equal-length spans' pre-mix accumulators is seed-free only
    # in legacy mode.
    def pre_mix(word: str, seed: int) -> int:
        init, mult, _ = _kernel_key(seed)
        acc = int(init)
        for byte in word.encode():
            acc = (acc * int(mult) + byte) % 2**64
        return acc

    d_legacy_1 = (pre_mix("AZ", 1) - pre_mix("BY", 1)) % 2**64
    d_legacy_2 = (pre_mix("AZ", 999) - pre_mix("BY", 999)) % 2**64
    assert d_legacy_1 == d_legacy_2  # the attack surface being closed
    s1, s2 = random_kernel_seed(), random_kernel_seed()
    d_k1 = (pre_mix("AZ", s1) - pre_mix("BY", s1)) % 2**64
    d_k2 = (pre_mix("AZ", s2) - pre_mix("BY", s2)) % 2**64
    assert d_k1 != d_k2  # multiplier is keyed — difference is seed-bound
    assert w1  # silence lint


@pytest.mark.slow
def test_near_dup_pipeline_keyed_seed(spark):
    # end-to-end: a keyed seed finds the same planted near-dups (exact
    # verification is seed-invariant up to negligible hash collisions)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs_minhash(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    }
    keyed = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs_minhash(
            docs, "doc_id", "text", threshold=0.8, seed=random_kernel_seed()
        ).collect()
    }
    assert keyed == base
