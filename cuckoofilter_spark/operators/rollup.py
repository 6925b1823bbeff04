"""Sketch rollup tables — re-aggregation from materialized blobs.

The warehouse pattern mergeable sketches exist for: persist one sketch
per fine time bucket (hour), answer every coarser window (day, week,
arbitrary ranges) by MERGING the stored blobs — the raw data is
scanned exactly once, ever. For HLL the merge is register-max, so a
rolled-up day is BIT-IDENTICAL to a sketch built directly from the
day's raw rows — not approximately equal, equal — which is the
testable form of the mergeability contract every companion sketch
here satisfies (the same property the distributed build's tree-merge
relies on, `operators/merge.py`).

At 100 TB: the fine table is (bucket, key, KB-blob) rows; a month of
hourly buckets × 10^3 keys is ~10^6 blobs ≈ GBs — the rollup job
shuffles ONLY blobs, never raw events.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_time_table(
    df: DataFrame, ts_col: str, key_col: str, value_col: str, *,
    bucket: str = "1 hour", kind: str = "hll", **params,
) -> DataFrame:
    """The fine-grained sketch table: one sketch per
    (time bucket, key) — ``(bucket_start, key, sketch, readout)``.
    One scan of the raw data; this is the table you persist."""
    from cuckoofilter_spark.operators.grouped import grouped_sketch_agg

    bucketed = df.withColumn(
        "_bucket",
        F.window(F.col(ts_col).cast("timestamp"), bucket).getField("start"),
    ).withColumn(
        "_bk",
        F.concat(
            F.col("_bucket").cast("string"), F.lit("|"),
            F.col(key_col).cast("string"),
        ),
    )
    agg = grouped_sketch_agg(bucketed, "_bk", value_col, kind=kind,
                             **params)
    readout_col = [c for c in agg.columns if c not in ("_bk", "sketch")][0]
    split = F.split(F.col("_bk"), r"\|", 2)
    return agg.select(
        split.getItem(0).cast("timestamp").alias("bucket_start"),
        split.getItem(1).alias("key"),
        "sketch",
        F.col(readout_col).alias("readout"),
    )


def rollup_sketch_table(
    fine: DataFrame, *, bucket: str = "1 day",
) -> DataFrame:
    """Roll a fine sketch table up to coarser buckets by MERGING blobs
    (``(bucket_start, key, sketch, readout)`` in and out). No raw
    data touched; the one shuffle carries KB blobs keyed by
    (coarse bucket, key)."""
    from cuckoofilter_spark.core.registry import sketch_from_bytes
    from cuckoofilter_spark.operators.grouped import _READOUTS

    coarse = fine.withColumn(
        "_cb", F.window("bucket_start", bucket).getField("start")
    )

    def merge_group(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in pdfs:
            for cb, key, blob in zip(pdf["_cb"], pdf["key"], pdf["sketch"]):
                sk = sketch_from_bytes(bytes(blob))
                g = (cb, key)
                if g in acc:
                    acc[g].merge(sk)
                else:
                    acc[g] = sk
        rows = []
        for (cb, key), sk in acc.items():
            _, readout = _READOUTS[sk.KIND]
            rows.append((cb, key, sk.to_bytes(), float(readout(sk))))
        yield pd.DataFrame(
            rows, columns=["bucket_start", "key", "sketch", "readout"]
        )

    # hash-repartition by (coarse bucket, key) then merge per task —
    # same partial/final blob-only shape as the grouped UDAF
    return (
        coarse.repartition("_cb", "key")
        .select("_cb", "key", "sketch")
        .mapInPandas(
            merge_group,
            "bucket_start timestamp, key string, sketch binary, "
            "readout double",
        )
    )
