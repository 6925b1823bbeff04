"""Build the ``--py-files`` artifact for cluster launches.

The north-rule deployment path is ``spark-submit --py-files
cuckoofilter_spark.zip job.py`` — executors unpack the zip onto
``sys.path`` and import the package via zipimport. That only works if
the package is pure-Python with no ``__file__``-relative data loads
at import time (ours generates the 3876-entry perm tables in memory,
so it is). ``tests/test_packaging.py`` proves it by importing the
built zip from a clean interpreter.

Usage: ``python scripts/package_pyfiles.py [out_dir]`` →
``<out_dir>/cuckoofilter_spark.zip`` (default ``dist/``).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build_zip(out_dir: Path | str = REPO / "dist") -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / "cuckoofilter_spark.zip"
    pkg = REPO / "cuckoofilter_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = build_zip(sys.argv[1] if len(sys.argv) > 1 else REPO / "dist")
    print(dest)
