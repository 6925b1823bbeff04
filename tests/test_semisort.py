"""Semi-sorted (permutation-encoded) filter parity tests —
SURVEY.md §2.3/§2.4: PermEncoding table invariants, packed layout
round-trips for every supported width, space parity, distributed
build/merge via the registry."""

from __future__ import annotations

import numpy as np
import pytest

from cuckoofilter_spark.core.semisort import (
    DEC_TABLE, ENC_TABLE, N_ENTS, SemiSortCuckooFilter, decode_codewords,
    encode_lowbits,
)


def test_perm_tables_reference_invariants():
    # 3876 = C(19,4) non-decreasing 4-nibble multisets
    assert len(DEC_TABLE) == N_ENTS == 3876
    assert len(ENC_TABLE) == 1 << 16
    lbs = decode_codewords(np.arange(N_ENTS))
    # every decoded multiset is non-decreasing; encode∘decode = id
    assert (np.diff(lbs.astype(int), axis=1) >= 0).all()
    assert (encode_lowbits(lbs) == np.arange(N_ENTS)).all()
    # enumeration order: first is (0,0,0,0), last is (15,15,15,15);
    # second is (0,0,0,1) per the reference recursion
    assert lbs[0].tolist() == [0, 0, 0, 0]
    assert lbs[1].tolist() == [0, 0, 0, 1]
    assert lbs[-1].tolist() == [15, 15, 15, 15]
    # dec_table values are unique codeword payloads
    assert len(np.unique(DEC_TABLE)) == N_ENTS


def test_rejects_unsupported_width():
    with pytest.raises(ValueError):
        SemiSortCuckooFilter(1000, 12)


@pytest.mark.parametrize("f", [5, 6, 7, 8, 9, 13, 17])
def test_roundtrip_preserves_membership(f):
    sk = SemiSortCuckooFilter(4000, f, seed=3)
    rng = np.random.default_rng(f)
    keys = np.unique(rng.integers(0, 2**63, 3000, dtype=np.int64)).view(
        np.uint64
    )
    sk.add_many(keys)
    rt = SemiSortCuckooFilter.from_bytes(sk.to_bytes())
    assert rt.f == f and rt.num_buckets == sk.num_buckets
    assert rt.contains_many(keys).all(), "false negative after round-trip"
    absent = np.arange(10**9, 10**9 + 50_000, dtype=np.uint64)
    assert (rt.contains_many(absent) == sk.contains_many(absent)).all()
    # bucket multisets identical (slot order may normalize)
    for a, b in zip(sk.table.tolist(), rt.table.tolist()):
        assert sorted(a) == sorted(b)


def test_space_parity_f13_is_12_bits_per_tag():
    sk = SemiSortCuckooFilter(100_000, 13, seed=1)
    # (3 + 9) * 4 = 48 bits/bucket = 12 bits/tag (src/packedtable.h:13-18)
    assert sk.bits_per_bucket == 48
    assert sk.packed_size_bytes * 8 == sk.num_buckets * 4 * 12
    blob = sk.to_bytes()
    # the wire blob may additionally zlib-compress the packed section;
    # the parity metric is the UNcompressed packed size
    assert len(blob) <= sk.packed_size_bytes + 48  # 48-byte header


def test_registry_dispatch_and_merge():
    from cuckoofilter_spark.core.registry import make_sketch, sketch_from_bytes

    a = make_sketch("semisort", max_num_keys=2000, bits_per_item=13, seed=5)
    b = make_sketch("semisort", max_num_keys=2000, bits_per_item=13, seed=5)
    ka = np.arange(0, 700, dtype=np.uint64)
    kb = np.arange(500, 1200, dtype=np.uint64)
    a.add_many(ka)
    b.add_many(kb)
    a.merge(b, dedup=True)
    assert a.contains_many(np.arange(0, 1200, dtype=np.uint64)).all()
    rt = sketch_from_bytes(a.to_bytes())
    assert isinstance(rt, type(a))
    assert rt.contains_many(np.arange(0, 1200, dtype=np.uint64)).all()


def test_distributed_semisort_build(spark):
    from cuckoofilter_spark.operators.build import build_sketch_shards
    from cuckoofilter_spark.operators.merge import merge_shards_to_blob
    from cuckoofilter_spark.operators.probe import might_contain_udf
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = orders.select("o_orderkey").distinct().count()
    shards = build_sketch_shards(
        orders, "o_orderkey", kind="semisort", lineage=False,
        max_num_keys=int(n * 1.3) + 64, bits_per_item=13, seed=2014,
    )
    blob = merge_shards_to_blob(shards, dedup=True)
    probe = might_contain_udf(spark, blob)
    misses = (
        orders.select("o_orderkey").distinct()
        .filter(~probe("o_orderkey")).count()
    )
    assert misses == 0


def test_wire_format_roundtrip_and_final_blob_packed():
    """Shards/merge rounds travel in the raw wire format (kind 0/2);
    only the final blob pays the perm codec (kind 1/3) — and both
    deserialize to identical tables."""
    import struct

    from cuckoofilter_spark.core.registry import sketch_from_bytes, wire_bytes

    sk = SemiSortCuckooFilter(20_000, 13, seed=11)
    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(0, 2**63, 15_000, dtype=np.int64)).view(
        np.uint64
    )
    sk.add_many(keys)
    hdr = struct.calcsize("<4sBBBxQQQQIB3x")

    wire = wire_bytes(sk)
    kind_wire = struct.unpack("<4sBBBxQQQQIB3x", wire[:hdr])[-1]
    assert kind_wire in (0, 2), "wire blob must skip the perm codec"
    packed = sk.to_bytes()
    kind_packed = struct.unpack("<4sBBBxQQQQIB3x", packed[:hdr])[-1]
    assert kind_packed in (1, 3), "final blob must be perm-packed"

    a = sketch_from_bytes(wire)
    b = sketch_from_bytes(packed)
    assert isinstance(a, SemiSortCuckooFilter)
    assert a.num_buckets == b.num_buckets == sk.num_buckets
    # wire format preserves exact slot order; packed normalizes per
    # bucket — multisets must agree, membership must be identical
    assert (a.table == sk.table).all()
    for ra, rb in zip(a.table.tolist(), b.table.tolist()):
        assert sorted(ra) == sorted(rb)
    assert a.contains_many(keys).all() and b.contains_many(keys).all()


def test_print_bucket_debug_helpers():
    """PrintBucket/PrintTags parity surface (src/packedtable.h:63-90)."""
    sk = SemiSortCuckooFilter(1000, 13, seed=2)
    sk.add_many(np.arange(50, dtype=np.uint64))
    occupied = int(np.flatnonzero((sk.table != 0).any(axis=1))[0])
    s = sk.print_bucket(occupied)
    assert s.startswith(f"bucket[{occupied}]") and "codeword=" in s
    assert "|" in sk.print_tags([0x1F3, 0x0A2])
    assert "f=13" in repr(sk)
