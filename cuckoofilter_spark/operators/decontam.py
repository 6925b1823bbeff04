"""Benchmark decontamination — the cuckoo filter's flagship
training-pipeline role.

Before training on a 100 TB corpus you must remove documents that
overlap the evaluation benchmarks (n-gram contamination). The exact
answer is an n-gram join corpus × eval — at corpus scale that join's
corpus side (every n-gram of every document, shuffled by n-gram) is
the single most expensive movement in the pipeline. The membership
sketch removes it:

1. the EVAL side's distinct word n-grams are built into one cuckoo
   filter blob (eval sets are millions of n-grams — megabytes at
   16 bits/item) and broadcast;
2. the CORPUS side is a narrow scan: per document, count how many of
   its n-grams the filter contains (one vectorized probe per Arrow
   batch, ``operators/probe.py count_hits_udf`` — no explode, no
   shuffle). Zero false negatives (reference guarantee,
   ``src/cuckoofilter.h:166-185``) ⇒ every truly contaminated
   document survives this gate;
3. only the surviving candidates — the contaminated sliver plus an
   FPR-controlled trickle (bits_per_item=16 ⇒ ~0.01% per n-gram) —
   pay the exact verification join, so the result is EXACT while the
   shuffle carries ~0.1% of the corpus n-grams.

This is the same probe-then-verify shape as the semi-join operator
(``operators/semijoin.py``), applied per-array instead of per-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoofilter_spark.operators.build import build_sketch_shards
from cuckoofilter_spark.operators.merge import merge_shards_to_blob
from cuckoofilter_spark.operators.probe import count_hits_udf
from cuckoofilter_spark.operators.text import shingles_col


def eval_ngram_filter(
    eval_df: DataFrame, text_col: str, *, n: int = 3,
    bits_per_item: int = 16, seed: int = 7, capacity: int | None = None,
) -> tuple[bytes, DataFrame]:
    """Build the broadcastable eval-side artifacts: (filter blob,
    distinct-n-gram DataFrame).

    The n-gram table is returned as well because the exact
    verification join needs the true strings — the filter alone can
    only bound membership. ``capacity`` defaults to the exact distinct
    count (one aggregation over the eval set, which is small by
    definition); pass it explicitly to skip that pass."""
    ngrams = (
        eval_df.select(F.explode(shingles_col(text_col, n)).alias("ngram"))
        .distinct()
    )
    ngrams.persist()
    if capacity is None:
        capacity = ngrams.count()
    shards = build_sketch_shards(
        ngrams.select(F.xxhash64("ngram").alias("h")),
        "h", kind="cuckoo", lineage=False,
        max_num_keys=max(int(capacity), 1024),
        bits_per_item=bits_per_item, seed=seed,
    )
    blob = merge_shards_to_blob(shards, dedup=True)
    return blob, ngrams


def decontaminate(
    corpus: DataFrame, eval_df: DataFrame, id_col: str, text_col: str, *,
    n: int = 3, min_overlap: int = 1, bits_per_item: int = 16,
    seed: int = 7,
) -> DataFrame:
    """EXACT contamination report: one row per corpus document whose
    distinct word-``n``-gram overlap with the eval set is ≥
    ``min_overlap`` — columns ``(id_col, n_overlap)``.

    Plan shape (the part that matters at 100 TB): the corpus is
    touched by (a) one narrow probe pass — no shuffle — and (b) an
    explode+join of CANDIDATE documents only. Monotonicity makes the
    gate safe: per-document filter hits ≥ true overlaps (zero false
    negatives), so ``hits ≥ min_overlap`` can never drop a document
    the exact join would keep. To drop the contaminated docs instead
    of reporting them, anti-join this result back on ``id_col``."""
    blob, ev_ngrams = eval_ngram_filter(
        eval_df, text_col, n=n, bits_per_item=bits_per_item, seed=seed
    )
    spark = corpus.sparkSession
    hits = count_hits_udf(spark, blob)

    with_ng = corpus.select(
        F.col(id_col),
        shingles_col(text_col, n).alias("_ngrams"),
    ).withColumn("_h", F.transform("_ngrams", lambda g: F.xxhash64(g)))

    candidates = with_ng.filter(hits("_h") >= min_overlap)

    # Exact verify: shingles_col already de-duplicates per document,
    # so count(*) after the equi-join IS the distinct-overlap count.
    overlap = (
        candidates.select(id_col, F.explode("_ngrams").alias("ngram"))
        .join(ev_ngrams, "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return overlap
