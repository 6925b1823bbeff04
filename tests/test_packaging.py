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
