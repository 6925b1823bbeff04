"""Two-parallelism scaling evidence for INCREMENTAL INGEST (round 7).

Applies the north-rule N-vs-4N protocol (see scaling_bench.py for the
rationale: fresh JVM per leg, best-of-2, 2-vs-8 cores) to the round-7
cross-corpus dedup job: ``dedup_against_corpus`` — a new crawl batch
(every 5th doc of the derived corpus, plus exact re-crawls of every
25th) deduplicated against the remaining 4/5 as the existing corpus.

Corpus construction matters for WEAK scaling of a DEDUP job in a way
it does not for a scan-shaped job, and two first cuts measured the
corpus instead of the operator (ledger): (1) reusing
scaling_pipeline.py's 2-replica QUARTER vs the 8-replica FULL
quadruples per-doc near-dup DEGREE between legs (weak "0.68");
(2) a base-family 1/4 subset of one corpus keeps degree but cuts
CROSS-family planted pairs 16x for 4x fewer docs — pair mass is
quadratic in families, so the large leg carries 4x the verify work
per doc (weak "0.66"). Weak scaling is only well-posed when pair
mass grows LINEARLY with the input, which is also the realistic
incremental-crawl shape: a new snapshot is mostly re-crawled
near-dup versions of existing pages, one or two per page.

Construction used: 16 near-dup replicas per base doc (suffix token);
the NEW batch is replica 15 (every new doc has exactly 15 near-dup
partners, all in the existing corpus) plus exact re-crawls of every
25th base family; the corpus is replicas 0-14. The quarter leg
filters to base families ``(doc_id % OFF) % 4 == 0`` — same 15-degree
and same exact-recrawl rate, 1/4 the families on 1/4 the cores.

- weak leg (headline): quarter-families on 2 cores vs all families
  on 8 cores — 4x work on 4x cores; efficiency = T_small / T_large.
- strong leg: all families at both sizes; efficiency = ratio / 4.

Writes BENCH/scaling_ingest.json.
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
DOUBLE = os.path.join(REPO, ".bench", "ingest_scale")       # 800k docs
OFF = 10**15  # replica id offset (same as scaling_pipeline._derive)
REPLICAS = 16


def _derive() -> None:
    """16-replica corpus (800k docs) — legs must be tens of seconds
    so the job's serial driver terms (broadcast build, per-action
    barriers) amortize; at the 400k/18 s scale they dominate the
    measurement (first-cut ledger note)."""
    if os.path.exists(os.path.join(DOUBLE, "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    from cuckoofilter_spark.session import get_spark

    spark = get_spark(app="ingest-scale-gen", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SF1, "documents.parquet")) \
        .select("doc_id", "text")
    parts = []
    for r in range(REPLICAS):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * OFF)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" rep{r}")).alias("text"),
            )
        )
    df = parts[0]
    for pp in parts[1:]:
        df = df.unionByName(pp)
    df.repartition(32).write.mode("overwrite").parquet(DOUBLE)
    spark.stop()


def worker(cores: int, quarter: bool) -> None:
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.dedup import dedup_against_corpus
    from cuckoofilter_spark.session import get_spark, warm_python_workers

    spark = get_spark(app=f"scale-ingest-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    docs = spark.read.parquet(DOUBLE).select("doc_id", "text")
    if quarter:
        docs = docs.filter((F.col("doc_id") % OFF) % 4 == 0)
    # exact INTEGER division (r7 ADVICE): `/` is double division and
    # ids near 16*10^15 exceed 2^53, relying on favorable rounding
    rep = F.expr(f"doc_id div {OFF}L")  # replica index 0..15
    old = docs.filter(rep < REPLICAS - 1)
    new = docs.filter(rep == REPLICAS - 1).unionByName(
        old.filter((F.col("doc_id") % OFF) % 25 == 1)
        .withColumn("doc_id", F.col("doc_id") + 7 * 10**17)
    )
    n_new = new.count()
    best = float("inf")
    kept = 0
    for _ in range(2):
        t0 = time.time()
        kept = dedup_against_corpus(
            new, old, "doc_id", "text", threshold=0.8
        ).count()
        best = min(best, time.time() - t0)
    print(json.dumps({
        "cores": cores, "sec": round(best, 3), "new_docs": n_new,
        "kept": kept,
        "docs_per_sec": round(n_new / best, 1),
    }))
    spark.stop()


def _run_leg(cores: int, quarter: bool) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(cores), "quarter" if quarter else "full"],
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
    _derive()
    weak_small = _run_leg(SMALL, True)
    strong_small = _run_leg(SMALL, False)
    large = _run_leg(LARGE, False)
    ratio = LARGE / SMALL
    out = {
        "job": "dedup_against_corpus (exact anti-join + cross-corpus "
               "MinHash near-dup)",
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
    path = os.path.join(REPO, "BENCH", "scaling_ingest.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3] == "quarter")
    else:
        main()
