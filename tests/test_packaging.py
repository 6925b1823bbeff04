"""The spark-submit --py-files artifact must be zipimport-able.

Executors receive ``--py-files cuckoofilter_spark.zip`` on sys.path
and import the package straight out of the archive — any
``__file__``-relative data load or import-time filesystem access
breaks that silently on a real cluster. This test builds the zip and
exercises the numpy core (build → serialize → merge → probe) from a
clean interpreter whose ONLY path to the package is the zip.
"""

import subprocess
import sys

SNIPPET = """
import sys
sys.path = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, sys.argv[1])
import cuckoofilter_spark as cfs
assert "cuckoofilter_spark.zip" in cfs.__file__, cfs.__file__
import numpy as np
keys = np.arange(1, 50_001, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
a = cfs.CuckooFilter(60_000, 12, seed=3)
a.add_many(keys[:25_000])
b = cfs.CuckooFilter(60_000, 12, seed=3)
b.add_many(keys[25_000:])
m = cfs.sketch_from_bytes(a.to_bytes()).merge(cfs.sketch_from_bytes(b.to_bytes()))
assert m.contains_many(keys).all()
# semisort + bloom also importable from the archive
s = cfs.SemiSortCuckooFilter(10_000, 13, seed=3); s.add_many(keys[:5_000])
assert cfs.sketch_from_bytes(s.to_bytes()).contains_many(keys[:5_000]).all()
print("zipimport OK")
"""


def test_pyfiles_zip_is_importable(tmp_path):
    sys.path.insert(0, "scripts")
    from package_pyfiles import build_zip

    z = build_zip(tmp_path)
    r = subprocess.run(
        [sys.executable, "-c", SNIPPET, str(z)],
        capture_output=True, text=True, cwd=tmp_path, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert "zipimport OK" in r.stdout


def test_scale_conf_sizing_rules():
    """scale_conf: partition count ~ input/target, memory cap engages
    for small executors, floors respected, 100 TB lands in a sane
    range."""
    import pytest

    from cuckoofilter_spark.session import scale_conf

    c = scale_conf(100 << 30)  # 100 GB, default 256 MB target
    assert int(c["spark.sql.shuffle.partitions"]) == 400
    assert int(c["spark.sql.files.maxPartitionBytes"]) == 256 << 20

    # small executors: per-core share (2g/4/4 = 128 MB) caps the size
    c2 = scale_conf(100 << 30, executor_mem_bytes=2 << 30)
    assert int(c2["spark.sql.files.maxPartitionBytes"]) == 128 << 20
    assert int(c2["spark.sql.shuffle.partitions"]) == 800

    # 100 TB: ~400k partitions, AQE advisories aligned
    c3 = scale_conf(100 << 40)
    assert 300_000 < int(c3["spark.sql.shuffle.partitions"]) < 500_000
    assert c3["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == \
        c3["spark.sql.files.maxPartitionBytes"]

    # tiny input floors at 32 partitions / 16 MB target
    c4 = scale_conf(1 << 20, executor_mem_bytes=1 << 26)
    assert int(c4["spark.sql.shuffle.partitions"]) == 32
    assert int(c4["spark.sql.files.maxPartitionBytes"]) >= 16 << 20

    with pytest.raises(ValueError):
        scale_conf(0)
