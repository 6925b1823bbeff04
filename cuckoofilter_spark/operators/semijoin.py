"""Filter-pruned semi-join — the cuckoo/bloom filter's production role.

``filter_semi_join(fact, key, dim, dim_key)``:

1. build a membership sketch over the dim keys (distributed partial
   build + merge — the dim side may itself be huge; nothing is
   collected except the final KB..MB blob),
2. broadcast the blob and prune the fact table with the vectorized
   probe (zero false negatives ⇒ no row that should survive is lost),
3. optionally finish with an exact join to drop the ≤FPR stragglers.

At 100 TB the pruning happens BEFORE the join shuffle: with FPR ~0.1%
and a selective dim predicate, the shuffle moves orders of magnitude
fewer bytes. When the dim key set is small Spark would broadcast the
join anyway — the sketch path is for dims too big to broadcast raw
but whose *fingerprints* (12 bits/key) still fit: 10^9 keys ≈ 1.9 GB
raw int64 vs ~0.2 GB cuckoo blob at f=12. Spark's own AQE runtime
bloom (``spark.sql.optimizer.runtime.bloomFilter.enabled``) is the
built-in analog (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cuckoofilter_spark.operators.build import build_sketch_shards
from cuckoofilter_spark.operators.merge import merge_shards_to_blob
from cuckoofilter_spark.operators.probe import might_contain_udf

# dims at or below this capacity build the membership blob driver-side
# from one distinct-key collect (<= 32 MB of longs) — see
# build_membership_blob round-8 note
_DRIVER_BUILD_MAX = 1 << 22


def build_membership_blob(
    dim: DataFrame, dim_key: str, *, kind: str = "cuckoo",
    bits_per_item: int = 12, seed: int = 2014, capacity: int | None = None,
    target_load: float = 0.85,
) -> bytes:
    """Build + merge a membership sketch over ``dim[dim_key]``.

    ``capacity`` defaults to ``dim.count()``; either way it is run
    through ``suggest_capacity`` (core/cuckoo.py), the single home of
    the merged-load guard: a merged filter above ~0.96 load can
    overflow (reference pre-doubles at 0.96,
    src/cuckoofilter.h:92-95), so size for ≤ ``target_load`` merged.
    """
    return _blob_and_keys(
        dim, dim_key, kind=kind, bits_per_item=bits_per_item, seed=seed,
        capacity=capacity, target_load=target_load,
    )[0]


def _blob_and_keys(
    dim: DataFrame, dim_key: str, *, kind: str = "cuckoo",
    bits_per_item: int = 12, seed: int = 2014, capacity: int | None = None,
    target_load: float = 0.85,
):
    """(blob, keys_pdf | None): ``build_membership_blob`` plus — when
    the round-8 driver-side small-dim path ran on a RAW (unhashed)
    integral key — the collected distinct-key pandas frame, so
    ``filter_semi_join``/``filter_anti_join`` can reuse it for the
    exact verify join instead of re-scanning + re-distincting the dim
    inside the final job."""
    from cuckoofilter_spark.core.cuckoo import suggest_capacity

    if kind in ("cuckoo", "semisort") and (
        capacity is None or capacity <= _DRIVER_BUILD_MAX
    ):
        # Round 8: SMALL dims build driver-side from one distinct-key
        # collect (8 bytes/key) instead of a count job + shard-build +
        # merge round — the blob is KB..MB either way and membership
        # answers are identical (FPR-pattern noise only, always
        # exact-verified or bound-checked downstream). The LIMIT
        # bounds what the driver can receive: when it fires (dim past
        # the cap) we fall through to the count + distributed build.
        import numpy as np

        from pyspark.sql.types import StringType

        from cuckoofilter_spark.operators.build import (
            check_add_statuses, string_key_expr,
        )
        from cuckoofilter_spark.core.registry import make_sketch

        key_col = F.col(dim_key)
        if isinstance(dim.schema[dim_key].dataType, StringType):
            key_col = string_key_expr(key_col)
        # JVM-side null drop BEFORE toPandas: a nullable int column
        # would otherwise arrive as float64 and round keys >= 2^53.
        # Gate with a distinct COUNT, not a LIMIT: a global limit
        # funnels every surviving row through one task before the
        # collect (measured 0.78 s vs 0.17+0.17 s for count + parallel
        # toPandas on a 700k-key dim).
        kdf = (
            dim.select(key_col.alias("__k"))
            .filter(F.col("__k").isNotNull()).distinct()
        )
        n_distinct = kdf.count()
        if n_distinct <= _DRIVER_BUILD_MAX:
            rows = kdf.toPandas()
            keys = rows["__k"].to_numpy(dtype=np.int64).view(np.uint64)
            cap = suggest_capacity(
                int(capacity or len(keys)), target_load=target_load
            )
            sk = make_sketch(
                kind, max_num_keys=cap,
                bits_per_item=bits_per_item, seed=seed,
            )
            check_add_statuses(sk.add_many(keys), "build_membership_blob")
            hashed = isinstance(dim.schema[dim_key].dataType, StringType)
            return sk.to_bytes(), (None if hashed else rows)
    if capacity is None:
        capacity = dim.count()
    capacity = suggest_capacity(int(capacity), target_load=target_load)
    if kind in ("cuckoo", "semisort"):
        shards = build_sketch_shards(
            dim, dim_key, kind=kind, lineage=False,
            max_num_keys=capacity, bits_per_item=bits_per_item, seed=seed,
        )
    elif kind == "bloom":
        import math

        log_nb = max(6, math.ceil(math.log2(max(1, capacity) * 1.0 / 25.6)))
        shards = build_sketch_shards(
            dim, dim_key, kind="bloom", lineage=False,
            log_num_buckets=log_nb, seed=seed,
        )
    else:
        raise ValueError(f"not a membership sketch kind: {kind!r}")
    # merge_shards_to_blob, NOT collect_merged: below its
    # driver_threshold it collects (tests, small dims); above, it tree-
    # merges so a 10^5-shard dim build never fans every shard blob
    # into the driver — the aggregate-then-merge shape the reference's
    # own merge design exists for (SURVEY §2.1 merge row).
    return merge_shards_to_blob(shards, dedup=(kind == "cuckoo")), None


def filter_semi_join(
    fact: DataFrame, key: str | Column, dim: DataFrame, dim_key: str,
    *, kind: str = "cuckoo", exact: bool = True, bits_per_item: int = 12,
    seed: int = 2014,
) -> DataFrame:
    """Rows of ``fact`` whose ``key`` appears in ``dim[dim_key]``.

    ``exact=True`` (default) appends a broadcast left-semi join so the
    result is exactly the semi-join — the sketch only *prunes*.
    ``exact=False`` returns the pure approximate filter (≤FPR extra
    rows, zero missing rows).
    """
    spark = fact.sparkSession
    blob, keys_pdf = _blob_and_keys(
        dim, dim_key, kind=kind, bits_per_item=bits_per_item, seed=seed
    )
    probe = might_contain_udf(spark, blob)
    key_col = F.col(key) if isinstance(key, str) else key
    pruned = fact.filter(probe(key_col))
    if not exact:
        return pruned
    dim_keys = _dim_keys_df(spark, dim, dim_key, keys_pdf)
    return pruned.join(
        F.broadcast(dim_keys), on=key_col == F.col("__dk"), how="left_semi"
    )


def _dim_keys_df(spark, dim: DataFrame, dim_key: str, keys_pdf) -> DataFrame:
    """The exact-verify join's distinct-key side. Measured round 8:
    re-creating the collected keys as a driver-local DataFrame LOSES
    to the JVM recompute (broadcast-building a 690k-row
    LocalTableScan: 4.3 s vs 2.4 s for the parallel scan + distinct +
    broadcast), so the keys_pdf reuse is deliberately NOT taken —
    kept as a parameter so the A/B is one-line to revisit."""
    return dim.select(F.col(dim_key).alias("__dk")).distinct()


def filter_anti_join(
    fact: DataFrame, key: str | Column, dim: DataFrame, dim_key: str,
    *, kind: str = "cuckoo", exact: bool = True, bits_per_item: int = 12,
    seed: int = 2014,
) -> DataFrame:
    """Rows of ``fact`` whose ``key`` does NOT appear in
    ``dim[dim_key]`` — novelty detection (today's crawl minus
    yesterday's corpus), the membership filter's other production
    role.

    Zero false negatives flips the guarantee around: a probe MISS
    proves the key is absent from dim, so the narrow ``~probe`` filter
    emits only correct rows and the only error mode is *omission* of
    the ≤FPR novel keys the filter wrongly claims to contain.
    ``exact=True`` (default) recovers exactly those: the probe HITS —
    |dim matches| + FPR stragglers, a sliver of the fact table — go
    through a broadcast left-anti join and the recovered rows are
    unioned back. Fact-side cost: one narrow probe pass + an
    anti-join over the hit sliver only; the bulk of a mostly-novel
    fact table never touches a join.

    NULL keys: kept, matching ``left_anti`` join semantics (a NULL key
    can never equal any dim key, so the row is trivially novel).
    ``probe(NULL)`` is NULL — failing both the ``~probe`` and
    ``probe`` filters — so NULL rows are routed through an explicit
    ``isNull`` arm rather than silently dropped."""
    spark = fact.sparkSession
    blob, keys_pdf = _blob_and_keys(
        dim, dim_key, kind=kind, bits_per_item=bits_per_item, seed=seed
    )
    probe = might_contain_udf(spark, blob)
    key_col = F.col(key) if isinstance(key, str) else key
    misses = fact.filter(key_col.isNull() | ~probe(key_col))
    if not exact:
        return misses
    dim_keys = _dim_keys_df(spark, dim, dim_key, keys_pdf)
    recovered = fact.filter(probe(key_col)).join(
        F.broadcast(dim_keys), on=key_col == F.col("__dk"), how="left_anti"
    )
    return misses.unionByName(recovered)
