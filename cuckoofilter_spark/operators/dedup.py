"""Deduplication operators: exact, MinHash+LSH, SimHash.

Designed for the 100 TB shape of the problem:

- **exact**: fingerprint = md5(normalized text) (JVM-side), then a
  hash-partitioned groupBy on the fingerprint — the only shuffle moves
  16-byte digests + doc ids, never document bodies.
- **MinHash+LSH**: per-doc signatures are computed WITHOUT exploding
  shingles — shingle hashes stay an array column (JVM xxhash64 inside
  ``transform``), and one Arrow-batched pandas UDF turns each hash
  array into a 128-slot signature (numpy broadcast over all perms at
  once). Banding then explodes only B=32 short band rows per doc; the
  self-join on (band, band_hash) is the classic LSH candidate join and
  the only O(candidates) stage. Exact-jaccard verification runs only
  on candidate pairs.
- **SimHash**: 64-bit signature per doc from word hashes (same
  no-explode trick), Hamming-≤k candidate generation by pigeonhole
  banding into 4×16-bit keys, verification with JVM ``bit_count``.

MinHash perm parameters derive from a fixed seed — signatures are
reproducible across executors and runs (same principle as the
filter's explicit hash seeds, SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from cuckoofilter_spark.operators.text import fingerprint_md5, shingles_col

_MERSENNE = (1 << 61) - 1


def exact_duplicate_groups(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """(fingerprint, n_docs, keep_id) for every group of byte-identical
    normalized texts with ≥2 members; ``keep_id`` = min id survives."""
    return (
        df.select(F.col(id_col).alias("doc"), fingerprint_md5(text).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc").alias("keep_id"))
        .filter(F.col("n_docs") >= 2)
    )


def dedup_exact(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Drop all but the min-id doc of each exact-duplicate group."""
    ranked = df.withColumn("__fp", fingerprint_md5(text)).withColumn(
        "__rk",
        F.row_number().over(Window.partitionBy("__fp").orderBy(F.col(id_col))),
    )
    return ranked.filter(F.col("__rk") == 1).drop("__fp", "__rk")


def _perm_params(num_hashes: int, seed: int):
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame, id_col: str, text: str, *, num_hashes: int = 128,
    shingle_k: int = 3, seed: int = 2014,
) -> DataFrame:
    """(doc, sig array<long>[num_hashes]) per document.

    Shingle hashing is JVM-side (``xxhash64`` inside ``transform``);
    the pandas UDF only does the (a·h + b) mod p row-min in numpy.
    Docs with < shingle_k words get an all-sentinel signature (they
    can only pair with other empty docs)."""
    a, b = _perm_params(num_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        out = []
        for hs in hashes:
            if hs is None or len(hs) == 0:
                out.append(np.full(num_hashes, _MERSENNE, dtype=np.int64))
                continue
            h = np.asarray(hs, dtype=np.int64)[:, None] % _MERSENNE
            # (n_shingles, num_hashes) — one broadcast multiply, min over rows
            sig = ((h * a[None, :] + b[None, :]) % _MERSENNE).min(axis=0)
            out.append(sig)
        return pd.Series(out)

    sh = shingles_col(text, k=shingle_k)
    hashed = F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed)))
    return df.select(
        F.col(id_col).alias("doc"), sig_udf(hashed).alias("sig")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, *, bands: int = 32, rows_per_band: int = 4
) -> DataFrame:
    """Distinct (doc_a, doc_b) sharing ≥1 identical signature band.

    S-curve: pair at jaccard j collides w.p. 1-(1-j^r)^b; with b=32,
    r=4 the 50% threshold sits at (1/32)^(1/4) ≈ 0.42 and recall at
    j≥0.8 exceeds 0.99999."""
    banded = sigs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(F.slice(
                    "sig", (i * rows_per_band + 1).cast("int"), rows_per_band
                )),
            )
        ).alias("band", "bh"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


def verified_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str, text: str, *,
    shingle_k: int = 3, threshold: float = 0.8,
) -> DataFrame:
    """Exact word-shingle jaccard on candidate pairs; keep ≥ threshold.

    Output jaccard is scaled to an integer in 1e-4 units (j_e4) so
    downstream equality checks are FP-noise-proof."""
    sh = df.select(
        F.col(id_col).alias("doc"), shingles_col(text, k=shingle_k).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnsRenamed({"doc": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn("n_int", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "n_union", F.size("sh_a") + F.size("sh_b") - F.col("n_int")
        )
        .withColumn(
            "j_e4",
            F.round(F.col("n_int") * 10000 / F.greatest("n_union", F.lit(1)))
            .cast("long"),
        )
    )
    return j.filter(
        F.col("n_int") * 1.0 / F.greatest("n_union", F.lit(1)) >= threshold
    ).select("doc_a", "doc_b", "j_e4")


def near_dup_pairs_minhash(
    df: DataFrame, id_col: str, text: str, *, threshold: float = 0.8,
    num_hashes: int = 128, bands: int = 32, rows_per_band: int = 4,
    shingle_k: int = 3, seed: int = 2014,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded LSH
    candidates → exact-jaccard verification."""
    sigs = minhash_signatures(
        df, id_col, text, num_hashes=num_hashes, shingle_k=shingle_k, seed=seed
    )
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    return verified_jaccard_pairs(
        df, cands, id_col, text, shingle_k=shingle_k, threshold=threshold
    )


def simhash64(
    df: DataFrame, id_col: str, text: str, seed: int = 2014,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc, simhash long): sign of per-bit weighted sums of word
    k-shingle hashes. Shingles (not bare words) keep the signature
    discriminative on small-vocabulary corpora — bare-word simhash
    degenerates when all docs share one vocabulary."""

    @F.pandas_udf(LongType())
    def sim_udf(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                continue
            h = np.asarray(hs, dtype=np.int64).view(np.uint64)
            bits = (
                (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int64)  # signed BEFORE the vote arithmetic
            votes = bits.sum(axis=0) * 2 - len(h)  # (+1/-1 votes per bit)
            sim = np.uint64(0)
            for bit_idx in np.flatnonzero(votes > 0):
                sim |= np.uint64(1) << np.uint64(bit_idx)
            out[i] = np.int64(sim.astype(np.int64))
        return pd.Series(out)

    hashed = F.transform(
        shingles_col(text, k=shingle_k), lambda s: F.xxhash64(s, F.lit(seed))
    )
    return df.select(F.col(id_col).alias("doc"), sim_udf(hashed).alias("simhash"))


def near_dup_pairs_simhash(
    df: DataFrame, id_col: str, text: str, *, max_hamming: int = 3,
    seed: int = 2014,
) -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming of their simhashes.

    Pigeonhole: ≤3 differing bits over 4 disjoint 16-bit bands ⇒ at
    least one band identical — band-join generates candidates, JVM
    ``bit_count(a XOR b)`` verifies exactly."""
    sims = simhash64(df, id_col, text, seed=seed)
    banded = sims.select(
        "doc", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), 16 * i)
                .bitwiseAND(F.lit(0xFFFF)) for i in range(4)
            ])
        ).alias("band", "bkey"),
    )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
