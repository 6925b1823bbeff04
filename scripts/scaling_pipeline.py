"""Two-parallelism scaling evidence for the PIPELINE stage (round 3).

`scripts/scaling_bench.py` evidences the north-rule ≥0.8 efficiency on
the sketch BUILD job; this script applies the same N-vs-4N protocol
(fresh JVM per leg, best-of-2, 2-vs-8 cores — rationale in
scaling_bench.py's docstring) to a representative corpus-shaping job:
benchmark decontamination (eval = every 97th doc, n=3, min_overlap=1).

The driver documents tables are too small for scaling runs (sf0.1 =
5k docs → the job is fixed-overhead-bound; measured sf0.1 and sf1 at
EQUAL wall, BENCH/BASELINE.md §4b), so this script derives two
deterministic corpora from the sf1 documents table (itself derived by
`scripts/make_sf1.py`): QUARTER = 2 replicas (100k docs) and FULL = 8
replicas (400k docs), id-offset by 10^15 per replica with a
per-replica suffix token (same construction as make_sf1).

- weak leg (headline): QUARTER on 2 cores vs FULL on 8 cores — 4x
  work on 4x cores; efficiency = T_small / T_large.
- strong leg: FULL at both sizes; efficiency = ratio / 4.

Writes BENCH/scaling_pipeline.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
SMALL, LARGE = 2, 8
SF1 = os.path.join(REPO, ".bench", "sf1")
QUARTER = os.path.join(REPO, ".bench", "decontam_scale_q")  # 100k docs
FULL = os.path.join(REPO, ".bench", "decontam_scale")       # 400k docs
OFF = 10**15


def _derive(out_path: str, replicas: int) -> None:
    if os.path.exists(os.path.join(out_path, "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    from cuckoofilter_spark.session import get_spark

    spark = get_spark(app="decontam-scale-gen", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SF1, "documents.parquet")) \
        .select("doc_id", "text")
    parts = []
    for r in range(replicas):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * OFF)).alias("doc_id"),
                # suffix token keeps replicas near- but not exact-dups
                F.concat(F.col("text"), F.lit(f" rep{r}")).alias("text"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(32).write.mode("overwrite").parquet(out_path)
    spark.stop()


def worker(cores: int, path: str) -> None:
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.decontam import decontaminate
    from cuckoofilter_spark.session import get_spark, warm_python_workers

    spark = get_spark(app=f"scale-pipe-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    docs = spark.read.parquet(path)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    n_docs = corpus.count()
    best = float("inf")
    flagged = 0
    for _ in range(2):
        t0 = time.time()
        flagged = decontaminate(
            corpus, ev, "doc_id", "text", n=3, min_overlap=1
        ).count()
        best = min(best, time.time() - t0)
    print(json.dumps({
        "cores": cores, "sec": round(best, 3), "docs": n_docs,
        "flagged": flagged,
        "docs_per_sec": round(n_docs / best, 1),
    }))
    spark.stop()


def _run_leg(cores: int, path: str) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(cores), path],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    out = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps(out))
    return out


def main() -> None:
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        raise SystemExit(f"run scripts/make_sf1.py first (missing {SF1})")
    _derive(QUARTER, 2)
    _derive(FULL, 8)
    weak_small = _run_leg(SMALL, QUARTER)
    strong_small = _run_leg(SMALL, FULL)
    large = _run_leg(LARGE, FULL)
    ratio = LARGE / SMALL
    out = {
        "job": "decontaminate (eval-ngram CF gate + exact verify)",
        "weak": {
            "small": weak_small, "large": large,
            "efficiency": round(weak_small["sec"] / large["sec"], 3),
        },
        "strong": {
            "small": strong_small, "large": large,
            "efficiency": round(
                strong_small["sec"] / large["sec"] / ratio, 3
            ),
        },
    }
    path = os.path.join(REPO, "BENCH", "scaling_pipeline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        main()
