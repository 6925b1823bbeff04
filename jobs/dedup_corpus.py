"""spark-submit entrypoint: corpus deduplication (exact + near-dup).

    spark-submit --py-files cuckoofilter_spark.zip jobs/dedup_corpus.py \
        --input /data/documents --id doc_id --text text \
        --method minhash --threshold 0.8 --output /out/docs_dedup

Pipeline: exact dedup (md5 keep-min) → near-dup pair generation
(``minhash`` LSH, ``simhash`` Hamming bands, or exact ``ngram``
PPJoin prefix filtering) → connected-component cluster resolution →
keep-one. Writes the surviving rows as Parquet plus a JSON stats line
on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--id", dest="id_col", default="doc_id")
    ap.add_argument("--text", dest="text_col", default="text")
    ap.add_argument("--method", default="minhash",
                    choices=["exact", "minhash", "simhash", "ngram"])
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="jaccard threshold (minhash/ngram)")
    ap.add_argument("--max-hamming", type=int, default=3,
                    help="simhash hamming radius")
    ap.add_argument("--seed", type=int, default=2014)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from cuckoofilter_spark.operators.dedup import (
        dedup_exact, dedup_near, near_dup_pairs_minhash,
        near_dup_pairs_ngram, near_dup_pairs_simhash,
    )

    spark = SparkSession.builder.appName("corpus-dedup").getOrCreate()
    t0 = time.time()
    df = spark.read.parquet(args.input)
    n_in = df.count()

    kept = dedup_exact(df, args.id_col, args.text_col)
    n_pairs = 0
    if args.method != "exact":
        pairs_fn = {
            "minhash": lambda d: near_dup_pairs_minhash(
                d, args.id_col, args.text_col,
                threshold=args.threshold, seed=args.seed),
            "ngram": lambda d: near_dup_pairs_ngram(
                d, args.id_col, args.text_col,
                threshold=args.threshold, seed=args.seed),
            "simhash": lambda d: near_dup_pairs_simhash(
                d, args.id_col, args.text_col,
                max_hamming=args.max_hamming, seed=args.seed),
        }[args.method]
        pairs = pairs_fn(kept).persist()
        n_pairs = pairs.count()
        kept = dedup_near(kept, pairs, args.id_col)

    kept.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    print(json.dumps({
        "rows_in": n_in, "rows_out": n_out,
        "near_dup_pairs": int(n_pairs),
        "method": args.method, "sec": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
