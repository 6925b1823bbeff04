"""spark-submit entrypoint: corpus vocabulary report.

    spark-submit --py-files cuckoofilter_spark.zip jobs/vocab_report.py \
        --input /data/documents --text text --group source \
        --top-k 20 --overlap-k 4096 --output /out/vocab_report

One pass over the corpus answers the three vocabulary questions a
dataset curator asks before mixing sources:

1. **top words per group** (``<output>/top_words``): EXACT per-group
   top-k words via the self-certifying Misra-Gries gate
   (``grouped_top_k_exact``) — only the ≤summary_k candidate hashes
   per group pay an exact count, and the certification (k-th count >
   summary err) is checked, not assumed.
2. **vocabulary overlap between groups** (``<output>/overlap``):
   all-pairs distinct-word overlap/jaccard estimates from ONE scan
   (per-group KMV + set algebra, ``overlap_matrix``) — no pairwise
   joins.
3. **per-group vocabulary size** (``<output>/vocab_sizes``): HLL
   distinct-word estimate per group (mergeable grouped UDAF).

Prints one JSON line with row counts per output, same contract as
``jobs/shape_corpus.py``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--text", dest="text_col", default="text")
    ap.add_argument("--group", dest="group_col", default="source")
    ap.add_argument("--top-k", type=int, default=20)
    ap.add_argument("--summary-k", type=int, default=0,
                    help="MG summary size (0 = 64*top_k)")
    ap.add_argument("--overlap-k", type=int, default=4096)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--seed", type=int, default=2014)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.approx import (
        grouped_top_k_exact, overlap_matrix,
    )
    from cuckoofilter_spark.operators.grouped import grouped_sketch_agg
    from cuckoofilter_spark.operators.text import words_col

    spark = SparkSession.builder.appName("vocab-report").getOrCreate()
    docs = spark.read.parquet(args.input)

    # one exploded (group, word, hash) relation feeds all three
    # questions; xxhash64 keys keep every shuffle 8 bytes per word
    wdf = (
        docs.select(
            F.col(args.group_col).cast("string").alias("g"),
            F.explode(words_col(args.text_col)).alias("w"),
        )
        .withColumn("h", F.xxhash64("w"))
    )
    wdf.persist()

    counts = {}

    # 1. exact top-k words per group (hash-keyed, words joined back)
    top = grouped_top_k_exact(
        wdf, "g", "h", args.top_k,
        summary_k=args.summary_k or None, seed=args.seed,
    )
    words_dim = wdf.select("h", "w").distinct()
    top_words = (
        words_dim.join(F.broadcast(top), "h")
        .select(F.col("g").alias(args.group_col), "w", "n", "rank")
        .orderBy(args.group_col, "rank")
    )
    top_words.write.mode("overwrite").parquet(f"{args.output}/top_words")
    counts["top_words"] = spark.read.parquet(
        f"{args.output}/top_words"
    ).count()

    # 2. all-pairs vocabulary overlap (one pass, blob-only shuffle)
    ov = overlap_matrix(wdf, "g", "h", k=args.overlap_k, seed=args.seed)
    ov.write.mode("overwrite").parquet(f"{args.output}/overlap")
    counts["overlap_pairs"] = spark.read.parquet(
        f"{args.output}/overlap"
    ).count()

    # 3. per-group vocabulary size (HLL estimate)
    sizes = grouped_sketch_agg(
        wdf, "g", "h", kind="hll", p=args.hll_p, seed=args.seed,
    ).select(
        F.col("g").alias(args.group_col),
        F.col("estimate").alias("vocab_est"),
    )
    sizes.write.mode("overwrite").parquet(f"{args.output}/vocab_sizes")
    counts["groups"] = spark.read.parquet(
        f"{args.output}/vocab_sizes"
    ).count()

    wdf.unpersist()
    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    sys.exit(main())
