"""Property/randomized tests (SURVEY.md §5.2): random operation
interleavings vs a Python-set oracle, merge-order invariance over
random partitions, merge_many/pairwise equivalence, and the 1M-key
example/test.cc reproduction."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cuckoofilter_spark.core.cuckoo import CuckooFilter, Status
from cuckoofilter_spark.core.hashing import SimpleTabulation


@settings(max_examples=25, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["add", "delete", "contain"]),
            st.integers(min_value=0, max_value=400),
        ),
        min_size=1,
        max_size=300,
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_interleavings_vs_set_oracle(ops, seed):
    """Zero false negatives under any add/delete/contain interleaving.

    Oracle is a multiset of successfully-added keys; deletes are only
    issued for keys the oracle holds (the reference documents delete
    of absent keys as undefined — README.md:21)."""
    sk = CuckooFilter(2048, 12, seed=seed)
    from collections import Counter

    oracle: Counter = Counter()
    for op, key in ops:
        k = np.array([key], dtype=np.uint64)
        if op == "add":
            if sk.add_many(k)[0] == int(Status.Ok):
                oracle[key] += 1
        elif op == "delete":
            if oracle[key] > 0:
                assert sk.delete_many(k)[0] == int(Status.Ok)
                oracle[key] -= 1
        else:
            present = bool(sk.contains_many(k)[0])
            if oracle[key] > 0:
                assert present, f"false negative for {key}"
    # final sweep: every oracle-resident key must hit
    live = [k for k, c in oracle.items() if c > 0]
    if live:
        assert sk.contains_many(np.array(live, dtype=np.uint64)).all()


@settings(max_examples=10, deadline=None)
@given(
    n_shards=st.integers(min_value=2, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_merge_order_invariance_random_partitions(n_shards, seed):
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.integers(0, 2**63, 6000, dtype=np.int64)).view(
        np.uint64
    )
    assign = rng.integers(0, n_shards, size=len(keys))
    shards = []
    for s in range(n_shards):
        f = CuckooFilter(12000, 12, seed=31)
        f.add_many(keys[assign == s])
        shards.append(f.to_bytes())

    def fold(order):
        acc = CuckooFilter.from_bytes(shards[order[0]])
        for i in order[1:]:
            acc.merge(CuckooFilter.from_bytes(shards[i]), dedup=True)
        return acc

    probes = np.concatenate(
        [keys, rng.integers(0, 2**63, 4000, dtype=np.int64).view(np.uint64)]
    )
    orders = [rng.permutation(n_shards) for _ in range(3)]
    answers = [fold(list(o)).contains_many(probes) for o in orders]
    for a in answers[1:]:
        assert (a == answers[0]).all(), "merge order changed membership"
    assert answers[0][: len(keys)].all(), "false negative after merge"


def test_merge_many_equals_pairwise():
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 2**63, 50_000, dtype=np.int64)).view(
        np.uint64
    )
    parts = np.array_split(keys, 7)

    def mk():
        out = []
        for p in parts:
            f = CuckooFilter(100_000, 12, seed=5)
            f.add_many(p)
            out.append(f)
        return out

    a = CuckooFilter.merge_many(mk(), dedup=True)
    fs = mk()
    b = fs[0]
    for f in fs[1:]:
        b.merge(f, dedup=True)
    probes = np.concatenate(
        [keys, rng.integers(0, 2**63, 50_000, dtype=np.int64).view(np.uint64)]
    )
    assert (a.contains_many(probes) == b.contains_many(probes)).all()
    assert a.contains_many(keys).all()


@pytest.mark.slow
def test_example_test_cc_repro_1m():
    """example/test.cc at full size: 1M sequential keys into a
    CuckooFilter<size_t,12>; zero false negatives over all inserted;
    FPR on [n, 2n) around 0.1-0.2%% (reference prints ~0.14%%)."""
    n = 1_000_000
    sk = CuckooFilter(n, 12, seed=2014)
    keys = np.arange(n, dtype=np.uint64)
    st_codes = sk.add_many(keys)
    inserted = keys[st_codes == int(Status.Ok)]
    assert len(inserted) >= n * 0.99
    assert sk.contains_many(inserted).all(), "false negative"
    absent = np.arange(n, 2 * n, dtype=np.uint64)
    fpr = sk.contains_many(absent).mean()
    assert fpr <= 8 / 4096, f"fpr {fpr:.4%} above the 2b/2^f bound"


def test_simple_tabulation_family():
    h1 = SimpleTabulation(7)
    h2 = SimpleTabulation(7)
    h3 = SimpleTabulation(8)
    keys = np.random.default_rng(0).integers(0, 2**63, 10_000,
                                             dtype=np.int64).view(np.uint64)
    a, b, c = h1.hash64(keys), h2.hash64(keys), h3.hash64(keys)
    assert (a == b).all(), "not deterministic per seed"
    assert (a != c).mean() > 0.99, "seed insensitivity"
    # byte-level avalanche sanity: flipping one input byte changes hash
    flipped = keys ^ np.uint64(0xFF00)
    assert (h1.hash64(flipped) != a).mean() > 0.99


@settings(max_examples=8, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["add", "delete", "contain"]),
            st.integers(min_value=0, max_value=400),
        ),
        min_size=1,
        max_size=200,
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    family=st.sampled_from(["tabulation", "bob", "superfast"]),
)
def test_interleavings_all_hash_families(ops, seed, family):
    """The interleaving no-false-negative property must hold under
    EVERY pluggable hash family, not just the default multiply-shift
    (same oracle discipline as test_interleavings_vs_set_oracle)."""
    from collections import Counter

    sk = CuckooFilter(2048, 12, seed=seed, hash_family=family)
    oracle: Counter = Counter()
    for op, key in ops:
        k = np.array([key], dtype=np.uint64)
        if op == "add":
            if sk.add_many(k)[0] == int(Status.Ok):
                oracle[key] += 1
        elif op == "delete":
            if oracle[key] > 0:
                assert sk.delete_many(k)[0] == int(Status.Ok)
                oracle[key] -= 1
        else:
            if oracle[key] > 0:
                assert bool(sk.contains_many(k)[0]), (family, key)
    live = [k for k, c in oracle.items() if c > 0]
    if live:
        assert sk.contains_many(np.array(live, dtype=np.uint64)).all()
