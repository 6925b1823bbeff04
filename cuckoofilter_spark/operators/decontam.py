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
   its n-grams the filter contains (``contamination_count_udf``:
   tokenize → shingle → hash → one batched probe, all inside one
   Arrow UDF — no explode, no shuffle). Zero false negatives
   (reference guarantee, ``src/cuckoofilter.h:166-185``) ⇒ every
   truly contaminated document survives this gate;
3. only the surviving candidates — the contaminated sliver plus an
   FPR-controlled trickle (bits_per_item=16 ⇒ ~0.01% per n-gram) —
   pay the exact verification join, so the result is EXACT while the
   shuffle carries ~0.1% of the corpus n-grams.

This is the same probe-then-verify shape as the semi-join operator
(``operators/semijoin.py``), applied per-array instead of per-key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoofilter_spark.core.cuckoo import suggest_capacity as _suggest_capacity
from cuckoofilter_spark.operators.build import build_sketch_shards
from cuckoofilter_spark.operators.merge import merge_shards_to_blob
from cuckoofilter_spark.operators.text import shingles_col


def _ngram_hash_udf(seed: int):
    """string n-gram -> uint64 hash (as long). Delegates to
    ``dedup.gram_string_hashes`` — bit-identical to the per-shingle
    hash ``dedup._shingle_hashes`` assigns the same word sequence, so
    the JVM-shingled build side and the Python-shingled probe side
    agree."""
    from pyspark.sql.types import LongType

    from cuckoofilter_spark.operators.dedup import gram_string_hashes

    @F.pandas_udf(LongType())
    def h(s: pd.Series) -> pd.Series:
        return pd.Series(gram_string_hashes(s, seed).view(np.int64))

    return h


def contamination_count_udf(spark, blob: bytes, *, n: int, seed: int):
    """Column-function ``f(text) -> int``: how many of the document's
    distinct word n-grams the broadcast eval filter contains.

    ONE pass does tokenize → shingle → hash → batch probe inside the
    UDF (``dedup._shingle_hashes`` + one ``contains_many`` per Arrow
    batch). Doing the shingling here rather than with the JVM
    ``shingles_col`` Column matters twice over: the interpreted
    higher-order expression costs ~25× more per doc, and Catalyst's
    projection collapsing would otherwise re-evaluate it in every
    operator that references the array."""
    import uuid

    from pyspark.sql.types import IntegerType

    from cuckoofilter_spark.operators.dedup import _shingle_hashes_batch
    from cuckoofilter_spark.operators.probe import _get_filter

    bc = spark.sparkContext.broadcast(bytes(blob))
    cache_key = uuid.uuid4().hex

    @F.pandas_udf(IntegerType())
    def hits(s: pd.Series) -> pd.Series:
        sk = _get_filter(bc, cache_key)
        arrs = _shingle_hashes_batch(s, n, seed)
        lens = np.fromiter(
            (len(a) for a in arrs), dtype=np.int64, count=len(arrs)
        )
        if len(arrs) == 0 or int(lens.sum()) == 0:
            return pd.Series(np.zeros(len(arrs), dtype=np.int32))
        flat = np.concatenate(arrs)
        hv = sk.contains_many(flat).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(hv)))
        ends = np.cumsum(lens)
        out = csum[ends] - csum[ends - lens]
        return pd.Series(out.astype(np.int32))

    def apply(col):
        return hits(F.col(col) if isinstance(col, str) else col)

    return apply


def ngram_stats_udf(spark, blob: bytes, *, n: int, seed: int):
    """Column-function ``f(text) -> struct<n_total int, n_hits int>``:
    the document's distinct word-n-gram count and how many of them the
    broadcast filter contains — the one-pass gate ``novelty_report``
    needs (same tokenize → shingle → hash → batch probe pipeline as
    ``contamination_count_udf``, plus the free total)."""
    import uuid

    from pyspark.sql.types import (
        IntegerType, StructField, StructType,
    )

    from cuckoofilter_spark.operators.dedup import _shingle_hashes_batch
    from cuckoofilter_spark.operators.probe import _get_filter

    bc = spark.sparkContext.broadcast(bytes(blob))
    cache_key = uuid.uuid4().hex
    out_type = StructType([
        StructField("n_total", IntegerType()),
        StructField("n_hits", IntegerType()),
    ])

    @F.pandas_udf(out_type)
    def stats(s: pd.Series) -> pd.DataFrame:
        sk = _get_filter(bc, cache_key)
        arrs = _shingle_hashes_batch(s, n, seed)
        lens = np.fromiter(
            (len(a) for a in arrs), dtype=np.int64, count=len(arrs)
        )
        if len(arrs) == 0 or int(lens.sum()) == 0:
            z = np.zeros(len(arrs), dtype=np.int32)
            return pd.DataFrame({"n_total": z, "n_hits": z})
        flat = np.concatenate(arrs)
        hv = sk.contains_many(flat).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(hv)))
        ends = np.cumsum(lens)
        hits = (csum[ends] - csum[ends - lens]).astype(np.int32)
        return pd.DataFrame(
            {"n_total": lens.astype(np.int32), "n_hits": hits}
        )

    def apply(col):
        return stats(F.col(col) if isinstance(col, str) else col)

    return apply


def novelty_report(
    corpus: DataFrame, ref_df: DataFrame, id_col: str, text_col: str, *,
    n: int = 3, bits_per_item: int = 16, seed: int = 7,
) -> DataFrame:
    """EXACT per-document novelty vs a reference corpus — the scoring
    complement of ``decontaminate``: for EVERY corpus document,
    ``(id_col, n_total, n_seen, novelty_milli)`` where ``n_total`` is
    its distinct word-``n``-gram count, ``n_seen`` how many of those
    appear anywhere in ``ref_df``, and ``novelty_milli =
    floor(1000 * (n_total - n_seen) / n_total)`` (integer arithmetic —
    engine-portable; 1000 = fully novel). Data curation uses this to
    down-weight or drop low-novelty documents against an existing
    training snapshot.

    Plan shape: one narrow probe pass computes (n_total, gate hits)
    per document inside a single Arrow UDF — no shuffle, no explode.
    Zero false negatives make the gate exact-preserving BOTH ways:
    a document with 0 filter hits has exactly 0 true overlaps (its
    ``n_seen`` is 0 without any join), so only documents with ≥1 hit
    — the overlapping sliver plus the FPR trickle — pay the
    explode + broadcast-join verification. Documents with an empty
    n-gram set (< n words) report n_total=0, novelty_milli=1000.

    Caching lifetime: the gate output (and the reference n-gram table
    built by ``eval_ngram_filter``) stay persisted for the session —
    deliberate when scoring several corpus slices against one
    reference, but a loop over MANY references should call
    ``spark.catalog.clearCache()`` between iterations (as bench.py
    does) or unpersist after materializing the result."""
    blob, ref_ngrams = eval_ngram_filter(
        ref_df, text_col, n=n, bits_per_item=bits_per_item, seed=seed
    )
    spark = corpus.sparkSession
    stats = ngram_stats_udf(spark, blob, n=n, seed=seed)

    base = corpus.select(
        F.col(id_col), F.col(text_col).alias("__text"),
        stats(text_col).alias("__st"),
    ).select(
        id_col, "__text",
        F.col("__st.n_total").alias("n_total"),
        F.col("__st.n_hits").alias("__hits"),
    )
    base.persist()

    exact = (
        base.filter(F.col("__hits") >= 1)
        .select(id_col, F.explode(shingles_col("__text", n)).alias("ngram"))
        .join(F.broadcast(ref_ngrams), "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n_seen"))
    )
    out = (
        base.drop("__text")
        .join(exact, id_col, "left")
        .select(
            id_col,
            "n_total",
            F.coalesce(F.col("__n_seen"), F.lit(0)).cast("long")
            .alias("n_seen"),
            F.when(F.col("n_total") > 0,
                   F.floor(F.lit(1000) * (F.col("n_total") - F.coalesce(
                       F.col("__n_seen"), F.lit(0)))
                           / F.col("n_total")))
            .otherwise(F.lit(1000)).alias("novelty_milli"),
        )
    )
    return out


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
        ngrams.select(_ngram_hash_udf(seed)("ngram").alias("h")),
        "h", kind="cuckoo", lineage=False,
        max_num_keys=max(_suggest_capacity(int(capacity)), 1024),
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
    of reporting them, anti-join this result back on ``id_col``.

    SECURITY: n-gram matching compares kernel hashes; with the
    default public seed an adversarial corpus document can forge fake
    contamination hits. For untrusted corpora pass
    ``seed=dedup.random_kernel_seed()`` (keyed kernel mode — see the
    ``operators.dedup`` trust-model note); build and probe share
    ``seed``, so one argument keys both sides."""
    blob, ev_ngrams = eval_ngram_filter(
        eval_df, text_col, n=n, bits_per_item=bits_per_item, seed=seed
    )
    return overlap_report(
        corpus, blob, ev_ngrams, id_col, text_col,
        n=n, min_overlap=min_overlap, seed=seed,
    )


def overlap_report(
    corpus: DataFrame, blob: bytes, ev_ngrams: DataFrame,
    id_col: str, text_col: str, *, n: int = 3, min_overlap: int = 1,
    seed: int = 7, broadcast_eval: bool = True, hits_udf=None,
) -> DataFrame:
    """The probe-gate + exact-verify core of ``decontaminate``, against
    PRE-BUILT eval artifacts — so a streaming job (or a loop over
    corpus slices) builds the eval filter once and reuses it per
    batch.

    ``broadcast_eval`` pins the verify join's build side to the eval
    n-gram table. Without the hint, an eval set past the
    auto-broadcast threshold silently flips the join to sort-merge —
    which shuffles EVERY candidate n-gram, the exact movement this
    operator exists to avoid. Set False only if the eval side is too
    big for executor memory (at which point reconsider the eval set:
    this op's contract is a small-relative-to-corpus eval side).

    ``hits_udf`` lets a caller reuse one ``contamination_count_udf``
    (and its filter broadcast) across MANY calls — the streaming job
    passes it so a long-running stream broadcasts the blob once, not
    once per micro-batch."""
    spark = corpus.sparkSession
    hits = (hits_udf if hits_udf is not None
            else contamination_count_udf(spark, blob, n=n, seed=seed))
    if broadcast_eval:
        ev_ngrams = F.broadcast(ev_ngrams)

    # Gate first (one UDF pass over raw text), THEN shingle only the
    # surviving candidates with the JVM Column — the expensive string
    # n-gram array is never materialized for the clean bulk of the
    # corpus.
    candidates = corpus.filter(hits(text_col) >= min_overlap)

    # Exact verify: shingles_col de-duplicates per document, so
    # count(*) after the equi-join IS the distinct-overlap count.
    overlap = (
        candidates.select(
            id_col, F.explode(shingles_col(text_col, n)).alias("ngram")
        )
        .join(ev_ngrams, "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return overlap
