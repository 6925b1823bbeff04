"""Structured Streaming sketch maintenance.

Two shapes the reference library never had (strictly batch —
SURVEY.md §2.9 streaming row) but a continuously-ingesting training
corpus needs:

1. ``run_streaming_sketch_build`` — ``foreachBatch``: each micro-batch
   runs the SAME partial-build operator as batch mode and appends its
   shard rows to a shard table; the global filter at any moment is the
   tree-merge of all rows so far. Exactly-once comes from the pair
   (streaming checkpoint, per-batch overwrite into ``batch=<id>``
   subdirs — re-delivered batch ids overwrite idempotently, never
   double-append).

2. ``streaming_distinct_by_key`` — ``applyInPandasWithState``: a
   per-key HLL blob lives in the state store; each trigger folds new
   keys into the state sketch and emits the running distinct estimate.
   This is the custom-stateful-operator pattern
   (``applyInPandasWithState``) from the build brief.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cuckoofilter_spark.core.hll import HyperLogLog


def run_streaming_sketch_build(
    stream_df: DataFrame, column: str, *, out_dir: str, checkpoint_dir: str,
    kind: str = "cuckoo", trigger_available_now: bool = True, **params,
) -> None:
    """Maintain a sketch-shard table from a streaming source.

    Each micro-batch: partial build (one shard row per partition) →
    overwrite ``<out_dir>/batch=<id>/``. Readers tree-merge
    ``<out_dir>/batch=*`` whenever they need the current global
    filter. Blocks until the stream drains (availableNow) — pass
    ``trigger_available_now=False`` for a continuous 10s-trigger job.
    """
    from cuckoofilter_spark.operators.build import build_sketch_shards

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        shards = build_sketch_shards(
            batch_df, column, kind=kind, lineage=False, **params
        )
        # idempotent per-batch target: a redelivered batch overwrites
        # its own directory instead of appending duplicates
        shards.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    writer = (
        stream_df.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="10 seconds").start()
    q.awaitTermination()


STATE_SCHEMA = "sketch binary"
OUTPUT_SCHEMA = "key string, n_rows long, distinct_est long"


def streaming_distinct_by_key(
    stream_df: DataFrame, key_col: str, value_col: str, *,
    p: int = 14, seed: int = 2014,
) -> DataFrame:
    """Running per-key distinct-count estimates via a stateful HLL.

    Returns a streaming DataFrame (key, n_rows, distinct_est) updated
    every trigger; attach your own writeStream sink."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (blob,) = state.get
            hll = HyperLogLog.from_bytes(bytes(blob))
        else:
            hll = HyperLogLog(p=p, seed=seed)
        n = 0
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype=np.int64, na_value=0)
            hll.add_many(vals.view(np.uint64))
            n += len(pdf)
        state.update((hll.to_bytes(),))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_rows": [n],
                "distinct_est": [int(round(hll.estimate()))],
            }
        )

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).alias(value_col),
        )
        .groupBy("key")
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_streaming_dedup(
    stream_df: DataFrame, id_col: str, text_col: str, *, out_dir: str,
    checkpoint_dir: str, capacity: int, bits_per_item: int = 16,
    seed: int = 2014, trigger_available_now: bool = True,
) -> None:
    """Streaming exact dedup: drop rows whose normalized-text
    fingerprint appeared in ANY earlier batch (cross-batch memory = a
    cuckoo filter of fingerprint hashes), keeping the min-id row for
    duplicates within a batch.

    Layout under ``out_dir``: surviving rows in ``data/batch=<id>/``,
    the filter state AFTER batch k in ``_filter/batch=<k>.bin``.

    Replay safety: batch N probes the state of the largest batch id
    STRICTLY below N — a redelivered batch re-reads its original
    pre-state, reproduces the same survivors, and overwrites its own
    outputs (idempotent), instead of probing a state that already
    absorbed its fingerprints (which would drop the whole batch).

    False-drop caveat (inherent to sketch-backed dedup): a filter
    false positive wrongly drops a novel document at the filter's FPR
    (≈2·4/2^f; ~1e-4 at f=16). Size ``capacity`` for the total corpus
    — an overfull filter refuses inserts loudly rather than degrade.
    """
    from cuckoofilter_spark.core.cuckoo import CuckooFilter
    from cuckoofilter_spark.core.registry import sketch_from_bytes
    from cuckoofilter_spark.operators.build import (
        build_sketch_shards, string_key_expr,
    )
    from cuckoofilter_spark.operators.dedup import dedup_exact
    from cuckoofilter_spark.operators.merge import collect_merged
    from cuckoofilter_spark.operators.probe import might_contain_udf
    from cuckoofilter_spark.operators.text import normalize_text

    state_dir = os.path.join(out_dir, "_filter")
    os.makedirs(state_dir, exist_ok=True)

    def _load_state(before_batch: int):
        best = -1
        for name in os.listdir(state_dir):
            if name.startswith("batch=") and name.endswith(".bin"):
                k = int(name[len("batch="):-len(".bin")])
                if k < before_batch:
                    best = max(best, k)
        if best < 0:
            return CuckooFilter(capacity, bits_per_item, seed=seed)
        with open(os.path.join(state_dir, f"batch={best}.bin"), "rb") as fh:
            return sketch_from_bytes(fh.read())

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = _load_state(batch_id)
        batch_df = dedup_exact(batch_df, id_col, text_col)
        fp = string_key_expr(normalize_text(text_col))
        probe = might_contain_udf(spark, state.to_bytes())
        kept = batch_df.filter(~probe(fp))
        kept.write.mode("overwrite").parquet(
            os.path.join(out_dir, "data", f"batch={batch_id}")
        )
        kept_back = spark.read.parquet(
            os.path.join(out_dir, "data", f"batch={batch_id}")
        )
        shards = build_sketch_shards(
            kept_back.select(fp.alias("__fp")), "__fp", kind="cuckoo",
            lineage=False, max_num_keys=capacity,
            bits_per_item=bits_per_item, seed=seed,
        )
        batch_filter = collect_merged(shards, dedup=True)
        new_state = state.merge(batch_filter, dedup=True)
        tmp = os.path.join(state_dir, f".batch={batch_id}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(new_state.to_bytes())
        os.replace(tmp, os.path.join(state_dir, f"batch={batch_id}.bin"))

    writer = (
        stream_df.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="10 seconds").start()
    q.awaitTermination()
