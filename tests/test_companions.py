"""Companion sketches (Bloom / HLL / CMS / t-digest / KLL): error
bounds vs exact oracles, mergeability (commutative-monoid property),
serialization round trips."""

import numpy as np
import pytest

from cuckoofilter_spark.core.bloom import BlockedBloomFilter
from cuckoofilter_spark.core.cms import CountMinSketch
from cuckoofilter_spark.core.hll import HyperLogLog
from cuckoofilter_spark.core.kll import KLL
from cuckoofilter_spark.core.registry import sketch_from_bytes
from cuckoofilter_spark.core.tdigest import TDigest


def _keys(n, seed=42):
    rng = np.random.Generator(np.random.PCG64(seed))
    return np.unique(rng.integers(0, 2**64, size=n, dtype=np.uint64))


# -------------------------------------------------------------------- bloom
def test_bloom_no_false_negatives_and_fpr():
    keys = _keys(100_000)
    bf = BlockedBloomFilter.for_capacity(len(keys), seed=5)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()
    absent = np.setdiff1d(_keys(200_000, seed=9), keys)
    fpr = bf.contains_many(absent).mean()
    # reference SimdBlock8 published eps ~0.5% at 12.2 bits/item
    # (BASELINE.md); allow generous slack at our sizing
    assert fpr < 0.05, fpr


def test_bloom_merge_is_union():
    a_keys, b_keys = _keys(20_000, 1), _keys(20_000, 2)
    a = BlockedBloomFilter(14, seed=3)
    b = BlockedBloomFilter(14, seed=3)
    a.add_many(a_keys)
    b.add_many(b_keys)
    a.merge(b)
    assert a.contains_many(np.concatenate([a_keys, b_keys])).all()
    blob = a.to_bytes()
    a2 = sketch_from_bytes(blob)
    assert a2.contains_many(a_keys).all()


# ---------------------------------------------------------------------- hll
def test_hll_relative_error_and_merge():
    true_n = 500_000
    keys = _keys(int(true_n * 1.05))[:true_n]
    h = HyperLogLog(p=14, seed=7)
    h.add_many(keys)
    rel = abs(h.estimate() - true_n) / true_n
    assert rel < 3 * 1.04 / np.sqrt(1 << 14), rel  # 3 sigma

    # merge of disjoint halves == build of union (exact register equality)
    h1, h2, hu = (HyperLogLog(p=12, seed=7) for _ in range(3))
    h1.add_many(keys[: true_n // 2])
    h2.add_many(keys[true_n // 2 :])
    hu.add_many(keys)
    h1.merge(h2)
    assert np.array_equal(h1.registers, hu.registers)
    # round trip
    h3 = sketch_from_bytes(h1.to_bytes())
    assert h3.estimate() == h1.estimate()


def test_hll_small_range_linear_counting():
    h = HyperLogLog(p=12, seed=1)
    keys = _keys(100)
    h.add_many(keys)
    assert abs(h.estimate() - len(keys)) / len(keys) < 0.05


# ---------------------------------------------------------------------- cms
def test_cms_point_query_bounds():
    rng = np.random.Generator(np.random.PCG64(0))
    # zipf-ish frequencies over a small vocab
    vocab = np.arange(1000, dtype=np.uint64)
    freqs = (10000 / (np.arange(1000) + 1)).astype(np.int64) + 1
    cms = CountMinSketch(eps=0.001, delta=0.01, seed=3)
    cms.add_many(vocab, counts=freqs)
    est = cms.query_many(vocab)
    assert (est >= freqs).all(), "CMS must never underestimate"
    n_total = freqs.sum()
    assert (est <= freqs + np.ceil(cms.eps * n_total)).mean() > 0.98

    # merge = elementwise add
    c1 = CountMinSketch(eps=0.001, delta=0.01, seed=3)
    c2 = CountMinSketch(eps=0.001, delta=0.01, seed=3)
    c1.add_many(vocab[:500], counts=freqs[:500])
    c2.add_many(vocab[500:], counts=freqs[500:])
    c1.merge(c2)
    assert np.array_equal(c1.counts, cms.counts)
    c3 = sketch_from_bytes(c1.to_bytes())
    assert np.array_equal(c3.counts, cms.counts)


# ------------------------------------------------------------------ tdigest
def test_tdigest_quantiles_vs_exact():
    rng = np.random.Generator(np.random.PCG64(5))
    data = rng.lognormal(5.5, 0.6, size=200_000)
    td = TDigest(delta=200)
    for chunk in np.array_split(data, 10):
        td.add_many(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = td.quantile(q)
        exact_rank = (data <= est).mean()
        assert abs(exact_rank - q) < 0.015, (q, est, exact_rank)


def test_tdigest_merge_and_roundtrip():
    rng = np.random.Generator(np.random.PCG64(6))
    data = rng.normal(0, 1, size=100_000)
    parts = np.array_split(data, 8)
    digs = []
    for p in parts:
        t = TDigest(delta=200)
        t.add_many(p)
        digs.append(t)
    merged = digs[0]
    for d in digs[1:]:
        merged.merge(d)
    assert merged.count == len(data)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        exact_rank = (data <= est).mean()
        assert abs(exact_rank - q) < 0.02
    m2 = sketch_from_bytes(merged.to_bytes())
    assert m2.quantile(0.5) == pytest.approx(merged.quantile(0.5))


def test_tdigest_weighted_state_identity_discrete():
    """``add_weighted`` on a discrete domain is STATE-identical to the
    per-occurrence build — the tie-collapsing compress turns a
    low-cardinality domain into an exact per-value histogram fixed
    point, regardless of batching, arrival order, or which insert
    form delivered the weight. No-merge regime: every adjacent pair's
    weight fraction must exceed ~pi/(2*delta) (k1' >= delta/pi, so a
    pair step of >1.57% of total weight always breaks the <=1 bound) —
    60 values with counts in [4000, 5000) gives min pair fraction
    8000/300000 = 2.7%."""
    rng = np.random.Generator(np.random.PCG64(11))
    values = np.arange(60, dtype=np.float64) * 3.0
    counts = rng.integers(4000, 5000, size=60)
    expanded = np.repeat(values, counts)
    rng.shuffle(expanded)

    unit = TDigest(delta=200)
    for chunk in np.array_split(expanded, 13):  # forces mid-compressions
        unit.add_many(chunk)
    weighted = TDigest(delta=200)
    weighted.add_weighted(values, counts)

    unit._compress(force=True)
    weighted._compress(force=True)
    assert np.array_equal(unit.means, weighted.means)
    assert np.array_equal(unit.weights, weighted.weights)
    assert unit.count == weighted.count == counts.sum()
    # the fixed point IS the exact histogram -> exact quantiles
    srt = np.sort(expanded)
    for q in (0.01, 0.5, 0.99):
        est = weighted.quantile(q)
        lo, hi = srt[int(q * (len(srt) - 1))], srt[
            min(int(q * (len(srt) - 1)) + 1, len(srt) - 1)
        ]
        assert lo - 3.0 <= est <= hi + 3.0


def test_tdigest_weighted_high_cardinality_accuracy():
    """Above the exact-histogram regime the weighted build still meets
    the same rank-error bound as the unit build."""
    rng = np.random.Generator(np.random.PCG64(12))
    values = np.unique(rng.lognormal(5.5, 0.6, size=30_000).round(1))
    counts = rng.integers(1, 50, size=len(values))
    expanded = np.repeat(values, counts)
    td = TDigest(delta=200)
    td.add_weighted(values, counts)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = td.quantile(q)
        exact_rank = (expanded <= est).mean()
        assert abs(exact_rank - q) < 0.015, (q, est, exact_rank)


# ----------------------------------------------------------------------- mg
def test_mg_bounds_and_presence():
    """Misra-Gries invariants on a Zipf-ish stream: stored counts
    lower-bound the truth, true <= stored + err, err <= N/(k+1), and
    every key with true count > err is present."""
    from cuckoofilter_spark.core.mg import MisraGries

    rng = np.random.Generator(np.random.PCG64(3))
    zipf = rng.zipf(1.3, size=300_000)
    keys = np.minimum(zipf, 100_000).astype(np.uint64)
    mg = MisraGries(k=256)
    for chunk in np.array_split(keys, 9):
        mg.add_many(chunk)
    assert mg.total == len(keys)
    assert mg.err <= len(keys) // (256 + 1)
    truth_keys, truth_counts = np.unique(keys, return_counts=True)
    est = mg.query_many(truth_keys)
    assert (est <= truth_counts).all()                 # lower bound
    assert (truth_counts <= est + mg.err).all()        # bounded under
    hot = truth_keys[truth_counts > mg.err]
    assert (mg.query_many(hot) > 0).all(), "presence guarantee broken"
    assert len(mg.keys) <= 256


def test_mg_merge_guarantees_and_roundtrip():
    """Merging per-shard summaries (any split) preserves the
    invariants with summed err; blob round-trips; mismatched k
    refuses; weighted insert equals repeated insert's guarantees."""
    import pytest as _pt

    from cuckoofilter_spark.core.mg import MisraGries
    from cuckoofilter_spark.core.registry import sketch_from_bytes

    rng = np.random.Generator(np.random.PCG64(4))
    keys = np.minimum(rng.zipf(1.5, size=200_000), 50_000).astype(np.uint64)
    parts = np.array_split(keys, 7)
    merged = MisraGries(k=128)
    for p in parts:
        s = MisraGries(k=128)
        s.add_many(p)
        merged.merge(s)
    assert merged.total == len(keys)
    truth_keys, truth_counts = np.unique(keys, return_counts=True)
    est = merged.query_many(truth_keys)
    assert (est <= truth_counts).all()
    assert (truth_counts <= est + merged.err).all()
    assert merged.err <= len(keys) // (128 + 1) * 7  # summed bound

    back = sketch_from_bytes(merged.to_bytes())
    assert np.array_equal(back.keys, merged.keys)
    assert np.array_equal(back.counts, merged.counts)
    assert (back.total, back.err) == (merged.total, merged.err)

    with _pt.raises(ValueError, match="identical k"):
        MisraGries(k=64).merge(MisraGries(k=128))

    # weighted == unique+counts path carries the same bounds
    w = MisraGries(k=128)
    u, c = np.unique(keys, return_counts=True)
    w.add_many(u, c)
    est_w = w.query_many(truth_keys)
    assert (est_w <= truth_counts).all()
    assert (truth_counts <= est_w + w.err).all()


def test_mg_invariants_property():
    """Property (hypothesis): for ANY key stream, k, batch split, and
    merge tree shape, the MG invariants hold — lower bound, bounded
    undercount, presence of every key with true count > err, ≤k
    stored counters, exact total."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cuckoofilter_spark.core.mg import MisraGries

    @settings(max_examples=120, deadline=None)
    @given(
        data=st.lists(st.integers(0, 30), min_size=1, max_size=400),
        k=st.integers(1, 12),
        n_parts=st.integers(1, 5),
        pairwise=st.booleans(),
    )
    def check(data, k, n_parts, pairwise):
        keys = np.array(data, dtype=np.uint64)
        parts = np.array_split(keys, n_parts)
        summaries = []
        for p in parts:
            s = MisraGries(k=k)
            s.add_many(p)
            summaries.append(s)
        if pairwise:  # fold left
            acc = summaries[0]
            for s in summaries[1:]:
                acc.merge(s)
        else:  # tree-ish: merge into a fresh root
            acc = MisraGries(k=k)
            for s in summaries:
                acc.merge(s)
        tk, tc = np.unique(keys, return_counts=True)
        est = acc.query_many(tk)
        assert acc.total == len(keys)
        assert len(acc.keys) <= k
        assert (est <= tc).all()
        assert (tc <= est + acc.err).all()
        hot = tk[tc > acc.err]
        assert (acc.query_many(hot) > 0).all()

    check()


def test_mg_roundtrip_large_key_gap():
    """Regression: a valid summary whose adjacent sorted keys differ
    by >= 2^63 must round-trip (the old sortedness check cast a
    wrapped np.diff to int64 and falsely rejected it). Hashed keys
    hit this with ~25% probability on a 2-key summary."""
    from cuckoofilter_spark.core.mg import MisraGries

    mg = MisraGries(k=8)
    mg.add_many(np.array([1, 2**63 + 5], dtype=np.uint64),
                np.array([3, 4], dtype=np.int64))
    back = MisraGries.from_bytes(mg.to_bytes())
    assert np.array_equal(back.keys, mg.keys)
    assert np.array_equal(back.counts, mg.counts)


def test_mg_blob_rejects_corruption():
    from cuckoofilter_spark.core.mg import MisraGries

    mg = MisraGries(k=8)
    mg.add_many(np.arange(20, dtype=np.uint64),
                np.arange(1, 21, dtype=np.int64))
    assert len(mg.keys) >= 2  # survivors to corrupt
    blob = bytearray(mg.to_bytes())
    import pytest as _pt
    with _pt.raises(ValueError):
        MisraGries.from_bytes(bytes(blob[:-3]))  # truncated
    # unsorted keys rejected
    hs = len(blob) - 16 * len(mg.keys)
    k0 = blob[hs:hs + 8]
    k1 = blob[hs + 8:hs + 16]
    blob[hs:hs + 8], blob[hs + 8:hs + 16] = k1, k0
    with _pt.raises(ValueError, match="sorted"):
        MisraGries.from_bytes(bytes(blob))


# ---------------------------------------------------------------------- kll
def test_kll_rank_error():
    rng = np.random.Generator(np.random.PCG64(8))
    data = rng.exponential(2.0, size=150_000)
    k = KLL(k=200, seed=1)
    for chunk in np.array_split(data, 7):
        k.add_many(chunk)
    assert k.n == len(data)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = k.quantile(q)
        exact_rank = (data <= est).mean()
        assert abs(exact_rank - q) < 0.025, (q, exact_rank)


@pytest.mark.parametrize("seed", range(5))
def test_tdigest_weighted_equals_expanded_property(seed):
    """Property (randomized domains/weights/batchings): a weighted
    t-digest build and the expanded per-occurrence build agree on
    every quantile to within one distinct-value step — even when the
    greedy pass merges centroids (where raw state identity may not
    hold), the collapsed-tie multiset semantics pin the quantiles."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n_vals = int(rng.integers(3, 400))
    values = np.unique(rng.normal(0, 1000, n_vals).round(2))
    counts = rng.integers(1, 200, size=len(values))
    expanded = np.repeat(values, counts)
    rng.shuffle(expanded)

    w = TDigest(delta=100)
    # weighted insert in random split order
    split = rng.integers(1, len(values) + 1)
    w.add_weighted(values[:split], counts[:split])
    w.add_weighted(values[split:], counts[split:])
    u = TDigest(delta=100)
    for chunk in np.array_split(expanded, int(rng.integers(1, 9))):
        u.add_many(chunk)

    assert w.count == u.count == counts.sum()
    gaps = np.diff(np.sort(values))
    step = float(gaps.max()) if len(gaps) else 1.0
    for q in (0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0):
        assert abs(w.quantile(q) - u.quantile(q)) <= step + 1e-9, (
            seed, q, w.quantile(q), u.quantile(q))


def test_kll_weighted_rank_error():
    """Binary weight decomposition: quantiles of a weighted insert
    match the expanded multiset within the sketch's rank-error band,
    and ``n`` counts total weight."""
    rng = np.random.Generator(np.random.PCG64(13))
    values = np.sort(rng.uniform(0, 1000, size=500))
    counts = rng.integers(1, 700, size=500)
    expanded = np.repeat(values, counts)
    k = KLL(k=200, seed=1)
    k.add_weighted(values, counts)
    assert k.n == counts.sum()
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = k.quantile(q)
        exact_rank = (expanded <= est).mean()
        assert abs(exact_rank - q) < 0.03, (q, exact_rank)


def test_kll_merge_and_roundtrip():
    rng = np.random.Generator(np.random.PCG64(9))
    data = rng.uniform(0, 100, size=80_000)
    a, b = KLL(k=200, seed=2), KLL(k=200, seed=3)
    a.add_many(data[:40_000])
    b.add_many(data[40_000:])
    a.merge(b)
    assert a.n == len(data)
    med = a.quantile(0.5)
    assert abs((data <= med).mean() - 0.5) < 0.03
    a2 = sketch_from_bytes(a.to_bytes())
    assert a2.n == a.n
    assert a2.quantile(0.5) == pytest.approx(med)


def test_registry_dispatch():
    from cuckoofilter_spark.core.cuckoo import CuckooFilter

    cf = CuckooFilter(100, 12, seed=1)
    cf.add_many(_keys(50))
    assert isinstance(sketch_from_bytes(cf.to_bytes()), CuckooFilter)
    with pytest.raises(ValueError):
        sketch_from_bytes(b"XXXXjunk")


def test_approx_overlap_inclusion_exclusion(spark):
    """HLL overlap on planted sets: A=0..9999, B=5000..14999 —
    intersection 5000, union 15000; estimates within 5-sigma, exact
    relations hold (disjoint -> ~0, identical -> ~|A|)."""
    from cuckoofilter_spark.operators.approx import approx_overlap

    a = spark.range(0, 10_000).selectExpr("id AS k")
    b = spark.range(5_000, 15_000).selectExpr("id AS k")
    r = approx_overlap(a, "k", b, "k", p=14, seed=7)
    sigma = 1.04 / (2 ** 14) ** 0.5
    assert abs(r["n_a"] - 10_000) / 10_000 <= 5 * sigma
    assert abs(r["n_union"] - 15_000) / 15_000 <= 5 * sigma
    assert abs(r["n_intersection"] - 5_000) / 5_000 <= 15 * sigma
    assert 0.0 <= r["jaccard"] <= 1.0

    disjoint = approx_overlap(
        a, "k", spark.range(100_000, 110_000).selectExpr("id AS k"),
        "k", p=14, seed=7,
    )
    assert disjoint["n_intersection"] <= 0.05 * 10_000
    same = approx_overlap(a, "k", a, "k", p=14, seed=7)
    assert abs(same["n_intersection"] - 10_000) / 10_000 <= 5 * sigma


def test_kmv_distinct_and_overlap(spark):
    """KMV at estimation scale (sets >> k): distinct within 5/sqrt(k),
    intersection within its sample bound, exact below k, merge
    associative, blob round-trip via the registry."""
    import numpy as np

    from cuckoofilter_spark.core.kmv import KMVSketch, kmv_set_estimates
    from cuckoofilter_spark.core.registry import sketch_from_bytes
    from cuckoofilter_spark.operators.approx import (
        approx_overlap_kmv, kmv_sketch,
    )

    k = 2048
    a = spark.range(0, 200_000).selectExpr("id AS x")
    b = spark.range(150_000, 350_000).selectExpr("id AS x")
    r = approx_overlap_kmv(a, "x", b, "x", k=k, seed=11)
    rse = 1 / (k - 2) ** 0.5
    assert abs(r["n_a"] - 200_000) / 200_000 <= 5 * rse
    assert abs(r["n_union"] - 350_000) / 350_000 <= 5 * rse
    assert abs(r["n_intersection"] - 50_000) / 50_000 <= 10 * rse

    # exact mode below k
    small = kmv_sketch(spark.range(0, 500).selectExpr("id AS x"), "x",
                       k=k, seed=11)
    assert small.estimate() == 500.0

    # merge associativity + registry round-trip
    s1 = KMVSketch(k=64, seed=3); s1.add_many(np.arange(1000, dtype=np.uint64))
    s2 = KMVSketch(k=64, seed=3)
    s2.add_many(np.arange(500, 1500, dtype=np.uint64))
    s3 = KMVSketch(k=64, seed=3)
    s3.add_many(np.arange(1200, 2000, dtype=np.uint64))
    left = sketch_from_bytes(s1.to_bytes()).merge(s2).merge(s3)
    right = s3.merge(sketch_from_bytes(s2.to_bytes()).merge(s1))
    assert np.array_equal(left.values, right.values)

    import pytest as _pt
    with _pt.raises(ValueError):
        KMVSketch(k=64, seed=3).merge(KMVSketch(k=64, seed=4))
    with _pt.raises(ValueError):
        sketch_from_bytes(b"KMV1" + b"\x00" * 10)
    # jaccard of identical sketches is exactly 1 in exact mode
    same = kmv_set_estimates(s2, s2)
    assert same["jaccard"] == 1.0


def test_kmv_from_bytes_rejects_unsorted_blob():
    """Sortedness validation must use an elementwise compare:
    np.diff on uint64 wraps mod 2^64, so a DECREASING pair yields a
    huge positive diff and an unsorted blob would slip through to
    corrupt _theta() and every estimate derived from it."""
    import numpy as np
    import pytest as _pt

    from cuckoofilter_spark.core.kmv import KMVSketch

    sk = KMVSketch(k=64, seed=3)
    sk.add_many(np.arange(1, 200, dtype=np.uint64))
    blob = sk.to_bytes()
    import struct

    head = struct.calcsize("<4sIQI")
    vals = np.frombuffer(blob, dtype=np.uint64, offset=head).copy()
    assert len(vals) >= 2
    bad = bytes(blob[:head]) + vals[::-1].tobytes()  # strictly decreasing
    with _pt.raises(ValueError, match="not strictly increasing"):
        KMVSketch.from_bytes(bad)
    # adjacent-equal still rejected too
    vals2 = vals.copy()
    vals2[1] = vals2[0]
    bad2 = bytes(blob[:head]) + vals2.tobytes()
    with _pt.raises(ValueError, match="not strictly increasing"):
        KMVSketch.from_bytes(bad2)
    # and the intact blob still round-trips
    ok = KMVSketch.from_bytes(blob)
    assert np.array_equal(ok.values, sk.values)


def test_frequent_keys_filter_one_sided_guarantee(spark):
    """frequent_keys_filter: every key whose TRUE count >= min_count
    must probe true (CMS overshoots only + filter zero-FN); rare keys
    far below threshold mostly stay out (eps/FPR budget)."""
    import numpy as np
    from pyspark.sql import functions as F

    from cuckoofilter_spark.core.registry import sketch_from_bytes
    from cuckoofilter_spark.operators.approx import frequent_keys_filter

    # keys 0..99: count 100 each (frequent); keys 1000..9999: count 1
    freq = spark.range(0, 10_000).selectExpr("id % 100 AS k")
    rare = spark.range(1000, 10_000).selectExpr("id AS k")
    df = freq.union(rare)
    blob = frequent_keys_filter(df, "k", 50, eps=1e-5, cms_seed=3,
                                filter_seed=3)
    sk = sketch_from_bytes(blob)
    hot = np.arange(100, dtype=np.uint64)
    assert sk.contains_many(hot).all(), "frequent key missing"
    cold = np.arange(1000, 10_000, dtype=np.uint64)
    # rare keys admitted only through FPR (16-bit) — a sliver
    assert sk.contains_many(cold).mean() < 0.01

    import pytest as _pt
    with _pt.raises(ValueError):
        frequent_keys_filter(df, "k", 0)


def test_overlap_matrix_planted_overlaps(spark):
    """overlap_matrix: three groups with constructed overlaps — the
    pairwise KMV jaccard estimates must land within the k=4096 bound
    of the exact values, all pairs present exactly once, canonical
    order."""
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.approx import overlap_matrix

    # A = [0, 100k), B = [50k, 150k) (j=1/3), C = [200k, 300k) (j=0)
    base = spark.range(0, 100_000)
    df = (
        base.selectExpr("'a' AS g", "id AS x")
        .union(base.selectExpr("'b' AS g", "id + 50000 AS x"))
        .union(base.selectExpr("'c' AS g", "id + 200000 AS x"))
    )
    m = {(r.group_a, r.group_b): r
         for r in overlap_matrix(df, "g", "x", k=4096, seed=3).collect()}
    assert set(m) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = m[("a", "b")]
    assert abs(ab.jaccard_e6 / 1e6 - 1 / 3) < 0.05
    assert abs(ab.est_intersection - 50_000) / 50_000 < 0.15
    assert abs(ab.est_union - 150_000) / 150_000 < 0.1
    assert m[("a", "c")].jaccard_e6 / 1e6 < 0.01
    assert m[("b", "c")].jaccard_e6 / 1e6 < 0.01


def test_grouped_kmv(spark):
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.grouped import grouped_sketch_agg

    df = spark.range(0, 60_000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v"))
    out = {r["g"]: r["estimate"] for r in
           grouped_sketch_agg(df, "g", "v", kind="kmv", k=1024,
                              seed=5).collect()}
    assert set(out) == {0, 1, 2}
    for est in out.values():
        assert abs(est - 20_000) / 20_000 <= 5 / (1024 - 2) ** 0.5


def test_grouped_value_count_strategy_state_identity(spark):
    """grouped_sketch_agg(strategy='shuffle_value_count'): per-group
    t-digest state equals the local per-occurrence build on a discrete
    domain (the JVM (group,value)->count collapse + add_weighted),
    and the guard refuses non-value kinds."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from cuckoofilter_spark.core.registry import sketch_from_bytes
    from cuckoofilter_spark.operators.grouped import grouped_sketch_agg

    df = spark.range(30_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 40).cast("double").alias("v"),
    )
    lo = {r["g"]: bytes(r["sketch"]) for r in grouped_sketch_agg(
        df, "g", "v", kind="tdigest", delta=200.0,
        strategy="local").collect()}
    sc = {r["g"]: bytes(r["sketch"]) for r in grouped_sketch_agg(
        df, "g", "v", kind="tdigest", delta=200.0,
        strategy="shuffle_value_count").collect()}
    assert set(lo) == set(sc) == {"0", "1", "2"}
    for g in lo:
        a, b = sketch_from_bytes(lo[g]), sketch_from_bytes(sc[g])
        a._compress(force=True)
        b._compress(force=True)
        assert np.array_equal(a.means, b.means), g
        assert np.array_equal(a.weights, b.weights), g
        assert a.count == b.count == 10_000

    with _pt.raises(ValueError, match="value-based"):
        grouped_sketch_agg(df, "g", "v", kind="hll",
                           strategy="shuffle_value_count", p=12)


def test_grouped_value_count_nan_values(spark):
    """Regression: float NaN VALUES (not NULL) pass Spark's isNotNull
    filter and reach the weighted partial as their own (g, NaN, c)
    row — the keys and counts must stay aligned (NaN dropped jointly)
    instead of crashing add_weighted with mismatched shapes."""
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.grouped import grouped_sketch_agg

    df = spark.range(300).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.when(F.col("id") % 7 == 0, F.lit(float("nan")))
        .otherwise((F.col("id") % 10).cast("double")).alias("v"),
    )
    rows = grouped_sketch_agg(
        df, "g", "v", kind="tdigest", delta=200.0,
        strategy="shuffle_value_count",
    ).collect()
    assert {r["g"] for r in rows} == {"0", "1"}
    # p50 over 0..9 uniform-ish after NaN removal stays in-range
    for r in rows:
        assert 2.0 <= r["p50"] <= 7.0


def test_kmv_merge_order_independence_property():
    """Hypothesis: for ANY partition of a key set into batches and any
    merge order, the KMV state (value array) is identical — the
    monoid property the distributed build relies on."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from cuckoofilter_spark.core.kmv import KMVSketch

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**63),
                 min_size=0, max_size=300),
        st.integers(min_value=1, max_value=5),
        st.randoms(),
    )
    def check(keys, n_parts, rnd):
        arr = np.array(keys, dtype=np.uint64)
        whole = KMVSketch(k=32, seed=9)
        whole.add_many(arr)
        parts = [[] for _ in range(n_parts)]
        for x in keys:
            parts[rnd.randrange(n_parts)].append(x)
        shards = []
        for p in parts:
            s = KMVSketch(k=32, seed=9)
            s.add_many(np.array(p, dtype=np.uint64))
            shards.append(s)
        rnd.shuffle(shards)
        acc = shards[0]
        for s in shards[1:]:
            acc.merge(s)
        assert np.array_equal(acc.values, whole.values)
    check()


def test_sketch_rollup_mergeability(spark):
    """Rollup tables: hour->day blob merges are BIT-identical to
    direct day builds for hll AND kmv (the mergeability contract at
    the storage layer); raw data is scanned once per granularity
    here, zero times in the rollup itself."""
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.rollup import (
        rollup_sketch_table, sketch_time_table,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for kind, params in (("hll", {"p": 12, "seed": 3}),
                         ("kmv", {"k": 256, "seed": 3})):
        fine = sketch_time_table(ev, "ts", "event_type", "user_id",
                                 bucket="1 hour", kind=kind, **params)
        fine.persist()
        day = {(r.bucket_start, r.key): r.readout
               for r in rollup_sketch_table(fine, bucket="1 day")
               .collect()}
        direct = {(r.bucket_start, r.key): r.readout
                  for r in sketch_time_table(ev, "ts", "event_type",
                                             "user_id", bucket="1 day",
                                             kind=kind, **params)
                  .collect()}
        fine.unpersist()
        assert set(day) == set(direct) and len(day) > 0, kind
        for k in day:
            assert abs(day[k] - direct[k]) < 1e-9, (kind, k)
