"""Deterministic synthetic pre-tokenized training-sequence table.

Schema per ``BASELINE.json`` ``input_hint`` / ``FIXTURES.md`` §1:

    doc_id string, tokens array<int32>, n_tok int32, source string

Generation is **distributed and order-independent**: every doc's
content is a pure function of ``(seed, doc index)``, so the table is
byte-identical regardless of partitioning or executor count — the
"token-array equality per row" invariant the driver checks. Token ids
are Zipf(s=1.1)-skewed over a 2^20 vocab (hot tokens exercise the
dedup/merge path), lengths ~LogNormal(5.5, 0.6) clipped to [16, 4096],
and ``source`` is Zipf-skewed over five categories so one source
dominates — the skew the salted repartition defuses.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TOKENS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"
VOCAB = 1 << 20
SOURCES = np.array(["web", "books", "code", "wiki", "forums"])
# Zipf-ish source weights: "web" dominates.
_SOURCE_W = np.array([0.62, 0.16, 0.10, 0.08, 0.04])
_SOURCE_CDF = np.cumsum(_SOURCE_W)


def _doc_batch(lo: int, hi: int, seed: int) -> pd.DataFrame:
    """Generate docs [lo, hi) deterministically from (seed, index)."""
    n = hi - lo
    idx = np.arange(lo, hi, dtype=np.int64)
    # One Philox stream keyed by (seed, doc index) per doc would be
    # cleanest but slow; instead derive per-doc scalar seeds and run one
    # generator per doc attribute batch, then per-doc token draws from a
    # counter-based Philox keyed on the doc index (order-independent).
    attr_rng = np.random.Generator(np.random.Philox(key=seed, counter=lo))
    # lengths: LogNormal(5.5, 0.6) clipped [16, 4096] — but must depend
    # only on doc index, so draw from a per-doc Philox stream instead of
    # the sequential attr_rng.
    del attr_rng
    lengths = np.empty(n, dtype=np.int64)
    srcs = np.empty(n, dtype=object)
    toks_out = []
    for k in range(n):
        g = np.random.Generator(np.random.Philox(key=(seed << 20) ^ int(idx[k])))
        ln = int(np.clip(np.exp(g.normal(5.5, 0.6)), 16, 4096))
        lengths[k] = ln
        srcs[k] = SOURCES[int(np.searchsorted(_SOURCE_CDF, g.random()))]
        # Zipf-like vocab skew: x = floor(V * u^a); a=8 concentrates
        # mass on low token ids (hot head), matching FIXTURES.md intent.
        u = g.random(ln)
        toks = np.floor(VOCAB * (u**8.0)).astype(np.int64)
        toks = np.minimum(toks, VOCAB - 1)
        toks_out.append(toks.astype(np.int32))
    return pd.DataFrame(
        {
            "doc_id": [f"doc-{i:012d}" for i in idx],
            "tokens": toks_out,
            "n_tok": lengths.astype(np.int32),
            "source": srcs,
        }
    )


def synth_tokens_df(
    spark: SparkSession, n_docs: int, seed: int = 42, parts: int | None = None
) -> DataFrame:
    """Distributed deterministic generation via ``mapInPandas`` over a
    ``spark.range`` driver of doc indices (no data ever sits on the
    driver; at 10^12 docs this is just a bigger range)."""
    parts = parts or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids within a range partition are contiguous
            yield _doc_batch(int(ids.min()), int(ids.max()) + 1, seed)

    return (
        spark.range(0, n_docs, 1, parts)
        .mapInPandas(gen, schema=TOKENS_SCHEMA)
    )


def write_tokens_table(
    spark: SparkSession, path: str, n_docs: int, seed: int = 42
) -> str:
    """Materialize the synthetic table as Parquet (Iceberg layout
    fallback — no Iceberg runtime jar in this sandbox, SURVEY.md §7)."""
    synth_tokens_df(spark, n_docs, seed).write.mode("overwrite").parquet(path)
    return path
