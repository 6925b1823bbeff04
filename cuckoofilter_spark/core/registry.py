"""Sketch registry: kind name <-> class, blob magic dispatch.

Every sketch blob starts with a 4-byte magic; ``sketch_from_bytes``
dispatches on it so Spark operators can carry heterogeneous sketch
columns (`kind` string + `sketch` binary).
"""

from __future__ import annotations

from cuckoofilter_spark.core.bloom import BlockedBloomFilter
from cuckoofilter_spark.core.cms import CountMinSketch
from cuckoofilter_spark.core.cuckoo import CuckooFilter
from cuckoofilter_spark.core.semisort import SemiSortCuckooFilter
from cuckoofilter_spark.core.hll import HyperLogLog
from cuckoofilter_spark.core.kll import KLL
from cuckoofilter_spark.core.kmv import KMVSketch
from cuckoofilter_spark.core.mg import MisraGries
from cuckoofilter_spark.core.tdigest import TDigest

SKETCH_KINDS = {
    "cuckoo": CuckooFilter,
    "semisort": SemiSortCuckooFilter,
    "bloom": BlockedBloomFilter,
    "hll": HyperLogLog,
    "cms": CountMinSketch,
    "tdigest": TDigest,
    "kll": KLL,
    "kmv": KMVSketch,
    "mg": MisraGries,
}

_MAGIC_TO_CLS = {
    b"CKF1": CuckooFilter,
    b"CKS1": SemiSortCuckooFilter,
    b"SBB1": BlockedBloomFilter,
    b"HLL1": HyperLogLog,
    b"CMS1": CountMinSketch,
    b"TDG1": TDigest,
    b"KLL1": KLL,
    b"KMV1": KMVSketch,
    b"MGS1": MisraGries,
}


def sketch_from_bytes(blob: bytes):
    cls = _MAGIC_TO_CLS.get(bytes(blob[:4]))
    if cls is None:
        raise ValueError(f"unknown sketch magic {blob[:4]!r}")
    return cls.from_bytes(blob)


def wire_bytes(sk) -> bytes:
    """Serialize a sketch for TRANSPORT (shard rows, intermediate merge
    rounds): the fastest self-describing format.

    Semi-sorted filters skip the permutation codec here — the 1
    bit/tag saving (reference src/packedtable.h:13) belongs on the
    final stored/broadcast blob only; paying pack+unpack on every
    shuffle boundary dominated the build (BENCH_r01). ``to_bytes()``
    without arguments remains the space-optimal final format."""
    if getattr(sk, "KIND", None) == "semisort":
        return sk.to_bytes(packed=False)
    return sk.to_bytes()


def make_sketch(kind: str, **params):
    """Construct a fresh sketch of ``kind`` with constructor params."""
    cls = SKETCH_KINDS[kind]
    return cls(**params)
