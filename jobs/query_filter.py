"""spark-submit entrypoint: probe a built filter against a key column.

    spark-submit --py-files cuckoofilter_spark.zip jobs/query_filter.py \
        --filter /out/filter.bin --input /data/probes --column key \
        --output /out/hits
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--filter", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--column", required=True)
    ap.add_argument("--output", help="parquet dir for hit rows; omit to "
                                     "just print counts")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.probe import might_contain_udf
    from cuckoofilter_spark.sources.ingest import read_tokens

    spark = SparkSession.builder.appName("cf-query").getOrCreate()
    with open(args.filter, "rb") as fh:
        blob = fh.read()
    probe = might_contain_udf(spark, blob)
    df = read_tokens(spark, args.input)
    hits = df.withColumn("might_contain", probe(args.column))
    if args.output:
        hits.write.mode("overwrite").parquet(args.output)
    stats = (
        hits.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("might_contain").cast("long")).alias("hits"),
        ).collect()[0]
    )
    print(json.dumps({"rows": stats["n"], "hits": stats["hits"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
