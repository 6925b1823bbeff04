"""Derive a deterministic sf1 (10x sf0.1) bench input under .bench/sf1.

The driver testdata stops at sf0.1, where most pipeline queries are
fixed-overhead-bound (0.5-1.5 s) and per-query deltas drown in noise;
one scale step up makes plan costs visible (VERDICT r2 item 5). The
derivation is pure replication with deterministic id offsets — no
random data, no external input:

- ids shift by ``replica * 10^12`` so replicas never collide;
- document TEXTS get a per-replica suffix token — identical replicas
  would plant 10-way exact-duplicate groups and turn the near-dup
  benches into a different (quadratic-in-copies) workload;
- embeddings/lineitem/orders/events replicate verbatim apart from ids.

The tokens table used by the build/probe benches is already synthetic
and scales natively (bench.py sizes it from the sf in the dir name:
``sf1`` -> 10^6 docs), so it is NOT derived here.

Usage:  python scripts/make_sf1.py  [src_sf_dir]  [out_dir]  [mult]
then:   SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
``mult`` (default 10) generalizes the step: 100 from sf0.1 gives an
sf10 input (the round-4 decade, VERDICT r3 item 9) with the same
id-offset/text-suffix discipline — one replication pass, no external
data.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MULT = 10   # default; argv[3] overrides
OFF = 10**12


def main() -> None:
    from cuckoofilter_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench", "sf1",
    )
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else MULT
    spark = get_spark(app="make-sf1", cores=16)
    spark.sparkContext.setLogLevel("ERROR")

    shifts = {
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
        "lineitem": ("l_orderkey",),
        "orders": ("o_orderkey",),
        "events": ("event_id", "user_id"),
    }
    for table, id_cols in shifts.items():
        dst = os.path.join(out, f"{table}.parquet")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            print(f"skip {table} (exists)")
            continue
        base = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        parts = []
        for k in range(mult):
            rep = base
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(k * OFF))
            if table == "documents" and k > 0:
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" zrep{k}"))
                )
            parts.append(rep)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite").parquet(dst)
        print(f"wrote {table} x{mult}")
    spark.stop()
    print(out)


if __name__ == "__main__":
    main()
