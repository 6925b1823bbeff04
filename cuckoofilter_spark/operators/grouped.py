"""Grouped mergeable sketch aggregation — the sketch-as-UDAF surface.

``df.groupBy(g).agg(sketch(col))`` semantics with the partial+final
contract a JVM UDAF would get, built from the two Spark primitives
that preserve it in Python:

- **partial** — ``mapInPandas`` over the raw input: each task folds
  its Arrow batches into ONE sketch per group it sees (true map-side
  combine: no shuffle of raw rows, zero per-row Python), emitting tiny
  ``(group, blob)`` rows.
- **final** — ``applyInPandas`` per group over the partial blobs:
  deserialize, ``merge`` (the sketches' associative-commutative merge
  — order across tasks is nondeterministic, which is exactly why the
  UDAF contract demands it), emit the merged blob plus its scalar
  readout.

The shuffle therefore carries one blob per (task, group) — KB per
group at any input scale — the same wire discipline as the global
``build_sketch_shards``/``tree_merge`` pipeline (reference parity:
the filter's own distributive build, SURVEY.md §2.9 aggregations).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoofilter_spark.core.registry import make_sketch, sketch_from_bytes
from cuckoofilter_spark.operators.build import check_add_statuses

# per-kind scalar readout of a merged sketch: (column name, fn)
_READOUTS = {
    "hll": ("estimate", lambda sk: float(sk.estimate())),
    "cuckoo": ("n_items", lambda sk: float(sk.size)),
    "semisort": ("n_items", lambda sk: float(sk.size)),
    "bloom": ("size_bytes", lambda sk: float(sk.size_in_bytes)),
    "cms": ("size_bytes", lambda sk: float(len(sk.to_bytes()))),
    "tdigest": ("p50", lambda sk: float(sk.quantile(0.5))),
    "kll": ("p50", lambda sk: float(sk.quantile(0.5))),
    "kmv": ("estimate", lambda sk: float(sk.estimate())),
    "mg": ("n_tracked", lambda sk: float(len(sk.keys))),
}
_VALUE_KINDS = ("tdigest", "kll")


_F64_EXACT_MAX = float(1 << 53)  # largest contiguous exact int in float64


def _keys_array(series: pd.Series, value_based: bool) -> np.ndarray:
    vals = series.dropna()
    if value_based:
        return vals.to_numpy(dtype=np.float64)
    if pd.api.types.is_float_dtype(vals.dtype):
        # Arrow→pandas hazard: an int64 VALUE column containing NULLs
        # arrives here as float64; ints above 2^53 would round to a
        # different key and be sketched silently wrong — refuse.
        arr = vals.to_numpy(dtype=np.float64)
        if np.any(np.abs(arr) >= _F64_EXACT_MAX):
            raise ValueError(
                "membership-key column arrived as float64 (int column "
                "with NULLs?) and holds values >= 2^53 — exact int keys "
                "are unrepresentable; drop NULLs or pre-hash upstream "
                "(build.string_key_expr) so the column stays int64"
            )
        return arr.astype(np.int64).view(np.uint64)
    return vals.to_numpy(dtype=np.int64).view(np.uint64)


def grouped_sketch_agg(
    df: DataFrame, group_col: str, column: str, *, kind: str = "hll",
    repartition_by_group: bool = False, num_partitions: int | None = None,
    strategy: str = "local", **params,
) -> DataFrame:
    """One mergeable sketch per group: returns
    ``(group_col, sketch binary, <readout> double)``.

    ``column`` must be numeric (int keys for membership/distinct
    kinds, any numeric for tdigest/kll); pre-hash strings JVM-side
    with ``build.string_key_expr`` — the shuffle should never carry
    raw strings.

    Memory shape: each task holds one live sketch per group IT SEES
    (KBs each), so this targets moderate group cardinality (up to
    ~10^4 groups per task, like any in-memory partial agg). For
    higher-cardinality groups pass ``repartition_by_group=True``:
    one extra shuffle clusters rows so each task sees
    ~cardinality/num_partitions groups, bounding task memory at any
    group count (the partial then feeds the final a single blob per
    group — no merge fan-in either).

    Membership kinds (cuckoo/semisort) REFUSE overflow loudly: if any
    insert returns NotEnoughSpace (group exceeds the filter capacity)
    the task raises instead of silently producing a filter with false
    negatives — size ``max_num_keys`` for the largest group.

    ``strategy='shuffle_value_count'`` (value kinds only; ``'auto'``
    picks it via the same size+duplication gates as the global build)
    pre-aggregates ``(group, value) -> count`` JVM-side so the pandas
    boundary carries groups × value-cardinality rows instead of every
    occurrence — for a discrete value column (n_tok) at billions of
    rows this is the difference between shipping 2.9 G doubles and
    ~20 k pairs; digests insert via ``add_weighted`` (t-digest state
    identical on low-cardinality domains, KLL same rank guarantee).

    The group column keeps its input type. Caveat (Arrow→pandas): an
    integer group column that contains NULLs arrives in the partial as
    float64, so int group ids above 2^53 mixed with NULL groups would
    lose precision — cast such ids to string upstream. The same hazard
    applies to the VALUE column for membership kinds: a nullable int64
    key column arrives as float64, and key values >= 2^53 would round
    to a different key — ``_keys_array`` detects that case and raises
    instead of sketching wrong keys (values < 2^53 convert exactly and
    pass through)."""
    if kind not in _READOUTS:
        raise ValueError(f"unknown sketch kind {kind!r}")
    readout_name, readout = _READOUTS[kind]
    value_based = kind in _VALUE_KINDS
    if strategy not in ("local", "shuffle_value_count", "auto"):
        raise ValueError(f"unknown grouped strategy {strategy!r}")
    if strategy == "auto":
        from cuckoofilter_spark.operators.approx import _value_strategy

        strategy = ("shuffle_value_count" if value_based
                    and _value_strategy(df, column, "auto")
                    == "shuffle_value_count" else "local")
    if strategy == "shuffle_value_count" and not value_based:
        raise ValueError(
            "shuffle_value_count requires a value-based sketch "
            "(tdigest, kll)"
        )
    src = df.select(F.col(group_col).alias("g"), F.col(column).alias("v"))
    weighted = strategy == "shuffle_value_count"
    if weighted:
        # JVM-side (group, value) partial COUNT: for discrete value
        # domains the pandas boundary carries groups x cardinality
        # rows instead of every occurrence — the grouped analog of
        # build.py's shuffle_value_count. Null values are dropped to
        # match _keys_array's dropna.
        src = (
            src.filter(F.col("v").isNotNull())
            .groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
        )
    g_type = df.schema[group_col].dataType.simpleString()  # type-preserving
    partial_schema = f"g {g_type}, blob binary"
    out_schema = (
        f"{group_col} {g_type}, sketch binary, {readout_name} double"
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # dropna=False: SQL GROUP BY keeps the NULL group — pandas
        # silently drops it by default, which would lose rows
        sketches: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g", sort=False, dropna=False):
                if weighted:
                    # drop NaN VALUES jointly with their counts: the
                    # JVM isNotNull filter passes float NaN (it is
                    # not NULL), and _keys_array's dropna would strip
                    # it from the keys while the count column kept
                    # its row — misaligned add_weighted arrays
                    sub = sub.dropna(subset=["v"])
                vals = sub["v"]
                keys = _keys_array(vals, value_based)
                if not len(keys):
                    continue
                g = None if pd.isna(g) else g
                sk = sketches.get(g)
                if sk is None:
                    sk = sketches[g] = make_sketch(kind, **params)
                if weighted:
                    sk.add_weighted(
                        keys, sub["c"].to_numpy(dtype=np.int64)
                    )
                else:
                    check_add_statuses(
                        sk.add_many(keys),
                        f"grouped_sketch_agg[{kind}] group={g!r}",
                    )
        if sketches:
            yield pd.DataFrame(
                {
                    "g": list(sketches.keys()),
                    "blob": [sk.to_bytes() for sk in sketches.values()],
                }
            )

    def final(key, pdf):
        merged = None
        for blob in pdf["blob"]:
            sk = sketch_from_bytes(bytes(blob))
            merged = sk if merged is None else merged.merge(sk)
        return pd.DataFrame(
            {
                group_col: [key[0]],
                "sketch": [merged.to_bytes()],
                readout_name: [readout(merged)],
            }
        )

    if repartition_by_group:
        n_parts = num_partitions or df.sparkSession.sparkContext \
            .defaultParallelism
        src = src.repartition(n_parts, "g")
    partials = src.mapInPandas(partial, partial_schema)
    return partials.groupBy("g").applyInPandas(final, out_schema)
