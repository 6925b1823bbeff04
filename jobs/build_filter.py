"""spark-submit entrypoint: distributed membership-filter build.

    spark-submit --py-files cuckoofilter_spark.zip jobs/build_filter.py \
        --input /data/tokens --column tokens --capacity 1200000000 \
        --bits 12 --seed 7 --checkpoint /ckpt/run1 --output /out/filter.bin

Reads the pre-tokenized sequence table (Iceberg if the runtime jar is
on the cluster, Parquet otherwise), runs the checkpointed partial
build + tree merge, writes the final blob + a metrics JSON. Resumes
automatically from the checkpoint manifest after a crash.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--column", default="tokens")
    ap.add_argument("--capacity", type=int, required=True,
                    help="expected GLOBAL distinct keys (pre-headroom)")
    ap.add_argument("--bits", type=int, default=12)
    ap.add_argument("--seed", type=int, default=2014)
    ap.add_argument("--kind", default="cuckoo", choices=["cuckoo", "bloom"])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--fanout", type=int, default=16)
    ap.add_argument("--headroom", type=float, default=None,
                    help="legacy capacity multiplier; default is the "
                         "suggest_capacity merged-load rule")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from cuckoofilter_spark.core.registry import sketch_from_bytes
    from cuckoofilter_spark.plans.checkpoint import (
        checkpointed_build, checkpointed_tree_merge,
    )
    from cuckoofilter_spark.sources.ingest import read_tokens

    spark = SparkSession.builder.appName("cf-build").getOrCreate()
    df = read_tokens(spark, args.input)
    if args.headroom is not None:
        cap = int(args.capacity * args.headroom)
    else:
        from cuckoofilter_spark.core.cuckoo import suggest_capacity

        cap = suggest_capacity(args.capacity)
    params: dict = {"kind": args.kind, "seed": args.seed}
    if args.kind == "cuckoo":
        params |= {"max_num_keys": cap, "bits_per_item": args.bits}
    else:
        import math

        params |= {"log_num_buckets": max(6, math.ceil(math.log2(cap / 25.6)))}

    t0 = time.time()
    checkpointed_build(spark, args.checkpoint, df, args.column, params=params)
    blob = checkpointed_tree_merge(
        spark, args.checkpoint, fanout=args.fanout,
        dedup=(args.kind == "cuckoo"),
    )
    dt = time.time() - t0
    with open(args.output, "wb") as fh:
        fh.write(blob)
    sk = sketch_from_bytes(blob)
    metrics = {
        "seconds": round(dt, 2),
        "bytes": len(blob),
        "keys": int(getattr(sk, "num_items", 0)),
        "load_factor": float(getattr(sk, "load_factor", 0.0)),
    }
    with open(args.output + ".metrics.json", "w") as fh:
        json.dump(metrics, fh, indent=2)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
