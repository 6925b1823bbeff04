"""cuckoofilter_spark — a PySpark-native distributed mergeable-sketch library.

A from-scratch re-expression of the capabilities of the
``efficient/cuckoofilter`` reference library (CoNEXT 2014, "Cuckoo
Filter: Practically Better Than Bloom") as idiomatic PySpark:

- ``core``       pure-numpy sketch kernels (cuckoo filter, semi-sorted
                 cuckoo, split-block bloom, HLL, count-min, t-digest,
                 KLL) — vectorized uint-array hot loops, zero per-row
                 Python, deterministic seeds, versioned byte blobs.
- ``operators``  Spark DataFrame operators: distributed sketch build
                 (``mapInArrow``), tree merge (``applyInPandas``),
                 broadcast membership probes, dedup, similarity search,
                 text statistics.
- ``sources``    ingest of the pre-tokenized training-sequence table
                 (Iceberg layout, Parquet fallback) + deterministic
                 synthetic generation of that table.
- ``functions``  portable Column-expression helpers.
- ``plans``      checkpoint / lineage manifest helpers.
- ``streaming``  Structured Streaming sketch maintenance.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and the
published papers (Fan et al. CoNEXT'14; Flajolet et al. HLL;
Cormode-Muthukrishnan CMS; Dunning t-digest; Karnin-Lang-Liberty KLL).
"""

__version__ = "0.1.0"

from cuckoofilter_spark.core.cuckoo import (  # noqa: F401
    CuckooFilter, Status, suggest_capacity,
)
from cuckoofilter_spark.core.semisort import SemiSortCuckooFilter  # noqa: F401
from cuckoofilter_spark.core.bloom import BlockedBloomFilter  # noqa: F401
from cuckoofilter_spark.core.hll import HyperLogLog  # noqa: F401
from cuckoofilter_spark.core.cms import CountMinSketch  # noqa: F401
from cuckoofilter_spark.core.tdigest import TDigest  # noqa: F401
from cuckoofilter_spark.core.kll import KLL  # noqa: F401
from cuckoofilter_spark.core.kmv import KMVSketch  # noqa: F401
from cuckoofilter_spark.core.mg import MisraGries  # noqa: F401
from cuckoofilter_spark.core.registry import sketch_from_bytes  # noqa: F401
