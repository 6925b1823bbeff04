"""Deduplication operators: exact, MinHash+LSH, SimHash, exact
n-gram-Jaccard (PPJoin prefix filtering), and cluster resolution
(connected components + keep-one).

Designed for the 100 TB shape of the problem:

- **exact**: fingerprint = md5(normalized text) (JVM-side), then a
  hash-partitioned groupBy on the fingerprint — the only shuffle moves
  16-byte digests + doc ids, never document bodies.
- **MinHash+LSH**: per-doc signatures are computed WITHOUT exploding
  shingles — one Arrow-batched pandas UDF does shingle→hash→128-perm
  row-min per document with a fully vectorized hash kernel (per-word
  C siphash13 + polynomial window mix; per-doc text work belongs in a
  batch UDF: Spark's nested higher-order array lambdas are
  CodegenFallback, measured ~2ms/doc interpreted). Banding then
  explodes only B=32 short band rows per doc; the self-join on
  (band, band_hash) is the classic LSH candidate join and the only
  O(candidates) stage. Exact-jaccard verification runs only on
  candidate pairs.
- **SimHash**: 64-bit signature per doc from shingle hashes (same
  batch-UDF path), Hamming-≤k candidate generation by pigeonhole
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

from cuckoofilter_spark.operators.text import fingerprint_md5

# MinHash permutation field: the Mersenne prime 2^31-1. With a, b, h
# all < p the product a·h < 2^62 fits uint64 EXACTLY — no 128-bit
# arithmetic needed, unlike p=2^61-1 where a naive int64 multiply
# wraps mod 2^64 BEFORE the mod-p reduction and silently leaves the
# advertised universal family (a·h+b) mod p. Reducing the 64-bit
# shingle hash to 31 bits costs a ~5e-10 per-pair collision
# probability — far below the minhash estimator's own noise.
_MERSENNE = (1 << 31) - 1
_P31 = np.uint64(_MERSENNE)

# Tokenizer parity: the JVM side (``text.words_col`` → Java regex
# ``\s+``) and the DuckDB oracle (RE2 ``\s``) both split on ASCII
# whitespace ONLY — [ \t\n\x0B\f\r]. Python's ``str.split()`` also
# splits on Unicode whitespace (NBSP \xa0,  , \x85, ...), so a
# document whose n-grams straddle such a character would hash
# differently here than in the filter built from JVM shingles — and a
# probe gate (decontam) could then undercount hits and silently drop a
# truly contaminated document, breaking the zero-false-negative
# contract. Every Python-side tokenization in this package goes
# through ``_words`` so all three tokenizers agree byte-for-byte.
_ASCII_WS_RE = None  # compiled lazily (workers import this module)


def _words(text: str) -> list[str]:
    """ASCII-whitespace word split matching Java ``\\s+`` / RE2
    ``\\s`` exactly (empty strings filtered)."""
    global _ASCII_WS_RE
    if _ASCII_WS_RE is None:
        import re

        _ASCII_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
    return [w for w in _ASCII_WS_RE.split(text) if w]


def _fold31(x: np.ndarray) -> np.ndarray:
    """x mod (2^31-1) for any uint64 x, exact (2^31 ≡ 1 mod p, so
    summing the 31-bit limbs preserves the residue)."""
    x = (x & _P31) + ((x >> np.uint64(31)) & _P31) + (x >> np.uint64(62))
    x = (x & _P31) + (x >> np.uint64(31))
    return np.where(x >= _P31, x - _P31, x)


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


# ---------------------------------------------------------------------
# Vectorized shingle-hash kernel (round-6: replaces the per-shingle
# hashlib.blake2b Python loop, which was ~3 us/shingle and 41% of the
# whole sf10 bench). Pure numpy over the UTF-8 BYTE stream — no Python
# word-string objects are ever materialized:
#
#   1. the batch's documents are utf-8-encoded and joined with '\n';
#   2. word spans = maximal runs of non-ASCII-whitespace BYTES. This
#      is exactly the Java \s+ / RE2 \s word split (see _words): the
#      six ASCII whitespace bytes never occur inside a UTF-8
#      multi-byte sequence (continuation bytes are >= 0x80), so byte
#      splitting == codepoint splitting;
#   3. word hash = seeded 64-bit polynomial over the span's bytes,
#      splitmix64-finalized (_span_hashes; byte gathers are length-
#      bucketed so total work is O(total bytes));
#   4. shingle hash = seeded polynomial over the k word hashes of a
#      sliding window, splitmix64-finalized; windows never straddle a
#      document boundary; per-doc distinct via np.unique.
#
# Same shingle SET semantics as before (distinct word-k-grams of the
# ASCII-whitespace split); only the hash VALUES changed vs rounds 1-5
# — permitted because every consumer treats the hash as an opaque
# uniform 64-bit key: minhash/jaccard verification and the PPJoin
# oracle compare exact jaccard over the (injective-whp) hash sets,
# simhash is checked for internal consistency plus an exact
# small-corpus Hamming oracle computed from these same signatures, and
# the decontam build/probe sides share this kernel via
# ``gram_string_hashes``. Polynomial (vs cryptographic) hashing is a
# deliberate trade: collisions are birthday-random on natural text,
# and dedup/minhash tolerate ~2^-64-per-pair fingerprint noise — but
# it is NOT adversarially collision-resistant.
_POLY_C = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier
_WS_LUT = np.zeros(256, dtype=bool)
_WS_LUT[[9, 10, 11, 12, 13, 32]] = True  # \t \n \x0b \f \r ' '
# spans longer than this fall back to one hashlib call each (a 1 MB
# unbroken token must not turn the length-bucketed loop into 10^6
# tiny gathers); both kernel entry points share the constant, so the
# same giant word hashes identically everywhere
_SPAN_CAP = 256


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized uint64 (wrapping)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _utf8_concat(texts):
    """(u8, doc_offsets): the batch's documents utf-8-encoded, joined
    by '\n' (whitespace — words cannot span the seam), as a uint8
    array plus each document's start offset (int64[n_docs])."""
    bufs = [(t or "").encode("utf-8", "surrogatepass") for t in texts]
    lens = np.fromiter(
        (len(b) for b in bufs), dtype=np.int64, count=len(bufs)
    )
    offsets = np.cumsum(lens + 1) - (lens + 1)
    u8 = np.frombuffer(b"\n".join(bufs) + b"\n", dtype=np.uint8)
    return u8, offsets


def _word_spans(u8: np.ndarray):
    """(starts, lengths) of maximal non-whitespace byte runs."""
    if u8.size == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    nonws = ~_WS_LUT[u8]
    d = np.diff(nonws.view(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if nonws[0]:
        starts = np.concatenate(([0], starts))
    if nonws[-1]:
        ends = np.concatenate((ends, [u8.size]))
    return starts.astype(np.int64), (ends - starts).astype(np.int64)


def _span_hashes(u8, starts, lengths, seed: int) -> np.ndarray:
    """Seeded hash of each byte span, vectorized: polynomial over the
    bytes + splitmix64. Length-bucketed (descending sort) so the byte
    gathers do O(total bytes) total work with no per-span masks."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    init = np.uint64(seed & (2**64 - 1))
    giant = lengths > _SPAN_CAP
    if giant.any():
        import hashlib

        salt = (seed & (2**64 - 1)).to_bytes(8, "little")
        mv = u8.tobytes()
        for i in np.flatnonzero(giant):
            out[i] = int.from_bytes(
                hashlib.blake2b(
                    mv[starts[i]:starts[i] + lengths[i]],
                    digest_size=8, key=salt,
                ).digest(), "little",
            )
        keep = ~giant
        starts, lengths = starts[keep], lengths[keep]
        idx_back = np.flatnonzero(keep)
    else:
        idx_back = None
    m = len(starts)
    if m:
        order = np.argsort(lengths, kind="stable")[::-1]
        st, ln_desc = starts[order], lengths[order]
        ln_asc = ln_desc[::-1]
        h = np.full(m, init)
        with np.errstate(over="ignore"):
            for j in range(int(ln_desc[0])):
                q = m - int(np.searchsorted(ln_asc, j + 1, side="left"))
                if q == 0:
                    break
                h[:q] = h[:q] * _POLY_C + u8[st[:q] + j]
            h = _mix64(h)
        vals = np.empty(m, dtype=np.uint64)
        vals[order] = h
        if idx_back is None:
            out = vals
        else:
            out[idx_back] = vals
    return out


def _window_gram_hashes(wh: np.ndarray, k: int) -> np.ndarray:
    """Hash of every length-``k`` window of the word-hash array
    (positions 0..len-k): seeded-by-caller polynomial + splitmix64.
    MUST stay formula-identical to ``_seq_hashes`` so a k-window and
    the same k-word sequence hash alike."""
    total = len(wh)
    with np.errstate(over="ignore"):
        acc = np.full(total - k + 1, np.uint64(0))
        for j in range(k):
            acc = acc * _POLY_C + wh[j:total - k + 1 + j]
        return _mix64(acc)


def _seq_hashes(wh, counts, offs) -> np.ndarray:
    """Hash of each variable-length word-hash sequence (sequence i =
    wh[offs[i] : offs[i]+counts[i]]): same polynomial + splitmix64 as
    ``_window_gram_hashes``."""
    n = len(counts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    order = np.argsort(counts, kind="stable")[::-1]
    c_desc, o_desc = counts[order], offs[order]
    c_asc = c_desc[::-1]
    acc = np.full(n, np.uint64(0))
    with np.errstate(over="ignore"):
        for j in range(int(c_desc[0]) if len(c_desc) else 0):
            q = n - int(np.searchsorted(c_asc, j + 1, side="left"))
            if q == 0:
                break
            acc[:q] = acc[:q] * _POLY_C + wh[o_desc[:q] + j]
        acc = _mix64(acc)
    out = np.empty(n, dtype=np.uint64)
    out[order] = acc
    return out


def _shingle_hashes_batch(texts, k: int, seed: int) -> list[np.ndarray]:
    """Distinct word-k-shingle hashes for every document of an Arrow
    batch (list of uint64 arrays, sorted per doc). Shingle SET
    definition matches ``shingles_col``/the SQL oracles exactly:
    ASCII-whitespace words, k-grams, de-duplicated."""
    texts = list(texts)
    n_docs = len(texts)
    u8, doc_offs = _utf8_concat(texts)
    w_starts, w_lens = _word_spans(u8)
    total = len(w_starts)
    if total < k:
        return [np.empty(0, dtype=np.uint64)] * n_docs
    wh = _span_hashes(u8, w_starts, w_lens, seed)
    # word -> document, then per-doc word counts (words are emitted in
    # byte order, so each doc's words are contiguous in wh)
    doc_of = np.searchsorted(doc_offs, w_starts, side="right") - 1
    counts = np.bincount(doc_of, minlength=n_docs)
    acc = _window_gram_hashes(wh, k)
    lengths = np.maximum(counts - (k - 1), 0)
    offs = np.cumsum(counts) - counts  # doc start offsets (word index)
    starts = np.cumsum(lengths) - lengths
    m = int(lengths.sum())
    if m == 0:
        return [np.empty(0, dtype=np.uint64)] * n_docs
    idx = (
        np.arange(m, dtype=np.int64)
        - np.repeat(starts, lengths)
        + np.repeat(offs, lengths)
    )
    grams = acc[idx]
    out, s = [], 0
    for length in lengths.tolist():
        out.append(np.unique(grams[s:s + length]))
        s += length
    return out


def _shingle_hashes(text: str, k: int, seed: int) -> np.ndarray:
    """Distinct word-k-shingle hashes of one document (uint64;
    process-independent, unlike Python hash()). Single-doc wrapper
    over the batch kernel."""
    return _shingle_hashes_batch([text], k, seed)[0]


def gram_string_hashes(grams, seed: int) -> np.ndarray:
    """uint64 hash per already-joined n-gram STRING (words joined by
    single spaces) — bit-identical to the hash ``_shingle_hashes``
    assigns the same word sequence, for build/probe agreement when one
    side shingles JVM-side (``shingles_col`` output strings) and the
    other shingles in Python (``decontam``). Handles mixed gram
    lengths."""
    grams = list(grams)
    u8, gram_offs = _utf8_concat(grams)
    w_starts, w_lens = _word_spans(u8)
    wh = _span_hashes(u8, w_starts, w_lens, seed)
    gram_of = np.searchsorted(gram_offs, w_starts, side="right") - 1
    counts = np.bincount(gram_of, minlength=len(grams))
    offs = np.cumsum(counts) - counts
    return _seq_hashes(wh, counts, offs)


def minhash_signatures(
    df: DataFrame, id_col: str, text: str, *, num_hashes: int = 128,
    shingle_k: int = 3, seed: int = 2014,
) -> DataFrame:
    """(doc, sig array<long>[num_hashes]) per document.

    One Arrow-batched pandas UDF does shingle→hash→(a·h+b) mod p
    row-min. Shingling deliberately lives in Python: Spark's nested
    higher-order array lambdas are CodegenFallback (interpreted,
    measured ~2ms/doc); the batch UDF does the same work in ~20µs/doc.
    Docs with < shingle_k words get an all-sentinel signature (they
    can only pair with other empty docs)."""
    a, b = _perm_params(num_hashes, seed)
    a_u = a.astype(np.uint64)[None, :]
    b_u = b.astype(np.uint64)[None, :]

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        hs_per_doc = _shingle_hashes_batch(texts, shingle_k, seed)
        out = []
        for hs in hs_per_doc:
            if len(hs) == 0:
                out.append(np.full(num_hashes, _MERSENNE, dtype=np.int64))
                continue
            h = _fold31(hs)[:, None]
            # (n_shingles, num_hashes): exact (a·h+b) mod p per cell
            # (a·h < 2^62 — no uint64 overflow), min over shingles —
            # the universal-family guarantee the LSH recall analysis
            # (1-(1-j^r)^b) assumes
            sig = _fold31(h * a_u + b_u)
            out.append(sig.min(axis=0).astype(np.int64))
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc"), sig_udf(F.col(text)).alias("sig")
    )


_TILE_K = 1 << 20  # tile id encoding base (chunk ids < 2^20 always)


def tiled_band_self_join(
    banded: DataFrame, doc_col: str = "doc", *,
    band_cols: tuple = ("band", "bh"), bucket_cap: int | None = 8192,
    payload_cols: tuple = (),
) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs sharing a band bucket, with the
    hot-bucket skew guard: buckets larger than ``bucket_cap`` split
    into g = ⌈m/cap⌉ deterministic chunks and replicate to the g tiles
    each chunk pair owns (the blocked-GEMM tiling), so every join task
    sees ≤ ~2·cap rows while the emitted pair set stays IDENTICAL
    (each cross-chunk pair lives in exactly one tile; intra-chunk
    duplicates collapse in the final distinct). The hot-bucket list is
    tiny (aggregated then broadcast); ``bucket_cap=None`` disables the
    guard. ``payload_cols`` ride through as ``{col}_a``/``{col}_b``
    (must be functionally dependent on ``doc_col`` so the distinct
    stays a pure pair-dedup). Shared by the MinHash and SimHash
    candidate joins."""
    bc = list(band_cols)
    pc = list(payload_cols)
    join_keys = bc
    if bucket_cap:
        hot = (
            banded.groupBy(*bc).count()
            .filter(F.col("count") > bucket_cap)
            .select(
                *bc,
                F.ceil(F.col("count") / bucket_cap).cast("int").alias("g"),
            )
        )
        # tile ids in LONG arithmetic: i * 2^20 + c overflows int32 once
        # a bucket exceeds ~16.8M rows (g > 2048) — wrapped ids stay
        # pairwise-consistent (correct pairs) but collide ACROSS chunk
        # pairs, silently re-merging the work the guard exists to split
        tile_base = F.lit(_TILE_K).cast("long")
        tiles = F.transform(
            F.sequence(F.lit(0), F.col("g") - 1),
            lambda i: F.when(
                i <= F.col("c"),
                i.cast("long") * tile_base + F.col("c"),
            ).otherwise(F.col("c").cast("long") * tile_base + i),
        )
        banded = (
            banded.join(F.broadcast(hot), bc, "left")
            .withColumn("g", F.coalesce("g", F.lit(1)))
            .withColumn("c", F.pmod(F.hash(doc_col), F.col("g")))
            .select(doc_col, *pc, *bc, F.explode(tiles).alias("tile"))
        )
        join_keys = bc + ["tile"]
    left = banded.alias("l")
    right = banded.alias("r")
    cond = F.col(f"l.{doc_col}") < F.col(f"r.{doc_col}")
    for k in join_keys:
        cond = (F.col(f"l.{k}") == F.col(f"r.{k}")) & cond
    return (
        left.join(right, cond)
        .select(
            F.col(f"l.{doc_col}").alias("doc_a"),
            F.col(f"r.{doc_col}").alias("doc_b"),
            *[F.col(f"l.{c}").alias(f"{c}_a") for c in pc],
            *[F.col(f"r.{c}").alias(f"{c}_b") for c in pc],
        )
        .distinct()
    )


def lsh_candidate_pairs(
    sigs: DataFrame, *, bands: int = 32, rows_per_band: int = 4,
    bucket_cap: int | None = 8192,
) -> DataFrame:
    """Distinct (doc_a, doc_b) sharing ≥1 identical signature band.

    S-curve: pair at jaccard j collides w.p. 1-(1-j^r)^b; with b=32,
    r=4 the 50% threshold sits at (1/32)^(1/4) ≈ 0.42 and recall at
    j≥0.8 exceeds 0.99999.

    Hot-bucket skew (one boilerplate family = 30% of the corpus in a
    single (band, band_hash) bucket ⇒ one task computing m²/2 pairs
    alone) is handled by ``tiled_band_self_join``'s chunk tiling.

    ``sigs`` is persisted here: the signature pandas-UDF feeds three
    consumers (hot-bucket agg, join left, join right) and must compute
    once, not three times. Spark's ContextCleaner reclaims the cache
    when the DataFrame goes out of scope."""
    sigs = sigs.persist()
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
    return tiled_band_self_join(
        banded, "doc", band_cols=("band", "bh"), bucket_cap=bucket_cap
    )


def verified_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str, text: str, *,
    shingle_k: int = 3, threshold: float = 0.8,
) -> DataFrame:
    """Exact word-shingle jaccard on candidate pairs; keep ≥ threshold.

    Texts join onto the (small) candidate-pair set, then one batched
    UDF computes exact set jaccard per pair — same shingle definition
    as the SQL oracle's list_distinct/list_intersect. Output jaccard
    is in 1e-4 integer units (j_e4), FP-noise-proof."""
    txt = df.select(F.col(id_col).alias("doc"), F.col(text).alias("txt"))

    @F.pandas_udf(LongType())
    def j_e4_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta), dtype=np.int64)
        for i in range(len(ta)):
            wa = _words(ta.iloc[i] or "")
            wb = _words(tb.iloc[i] or "")
            sa = {" ".join(wa[j:j + shingle_k])
                  for j in range(len(wa) - shingle_k + 1)}
            sb = {" ".join(wb[j:j + shingle_k])
                  for j in range(len(wb) - shingle_k + 1)}
            n_int = len(sa & sb)
            n_union = len(sa) + len(sb) - n_int
            # threshold test with the SAME IEEE ops as the SQL oracle
            # (divide then compare) — boundary pairs agree bit-for-bit
            if n_int / max(n_union, 1) >= threshold:
                out[i] = round(n_int * 10000 / max(n_union, 1))
            else:
                out[i] = -1
        return pd.Series(out)

    j = (
        pairs.join(txt.withColumnsRenamed({"doc": "doc_a", "txt": "t_a"}),
                   "doc_a")
        .join(txt.withColumnsRenamed({"doc": "doc_b", "txt": "t_b"}),
              "doc_b")
        .withColumn("j_e4", j_e4_udf("t_a", "t_b"))
    )
    return j.filter(F.col("j_e4") >= 0).select("doc_a", "doc_b", "j_e4")


def near_dup_pairs_minhash(
    df: DataFrame, id_col: str, text: str, *, threshold: float = 0.8,
    num_hashes: int = 128, bands: int = 32, rows_per_band: int = 4,
    shingle_k: int = 3, seed: int = 2014, bucket_cap: int | None = 8192,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded LSH
    candidates (skew-tiled above ``bucket_cap``) → exact-jaccard
    verification."""
    sigs = minhash_signatures(
        df, id_col, text, num_hashes=num_hashes, shingle_k=shingle_k, seed=seed
    )
    cands = lsh_candidate_pairs(
        sigs, bands=bands, rows_per_band=rows_per_band, bucket_cap=bucket_cap
    )
    return verified_jaccard_pairs(
        df, cands, id_col, text, shingle_k=shingle_k, threshold=threshold
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): every node connects its LARGER
    neighbors to the minimum of its neighborhood (incl. itself)."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u").agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: each node connects its SMALLER (or equal)
    neighbors — and itself — to the minimum among them."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    return (
        d.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def star_contraction_components(
    edges: DataFrame, *, max_rounds: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction — O(log n) rounds regardless of component DIAMETER
    (min-label propagation needs O(diameter) rounds; a 10^6-doc chain
    of pairwise near-dups would need 10^6 of them).

    ``edges``: (src, dst) pairs. Returns (doc, rep) for every node in
    the edge set, rep = component minimum. Each round localCheckpoints
    to truncate lineage; convergence = edge set unchanged, checked by
    count + anti-join (cheap: the edge table shrinks toward one star
    edge per non-root node)."""
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("doc"))
        .unionByName(e.select(F.col("v").alias("doc")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        same = (
            nxt.count() == e.count()
            and nxt.join(e, ["u", "v"], "left_anti").limit(1).count() == 0
        )
        e = nxt
        if same:
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    # converged edge set is a star forest: (node, component-min root)
    labels = e.select(F.col("u").alias("doc"), F.col("v").alias("rep"))
    roots = (
        labels.select(F.col("rep").alias("doc")).distinct()
        .withColumn("rep", F.col("doc"))
    )
    out = labels.unionByName(roots)
    # safety: exactly one label per original node — a star forest that
    # dropped or duplicated a node would silently split components
    n_nodes = nodes.count()
    if out.count() != n_nodes or out.select("doc").distinct().count() != n_nodes:
        raise RuntimeError("star contraction produced a non-star forest")
    return out


def duplicate_clusters(
    pairs: DataFrame, *, max_iter: int = 25,
    pair_cols: tuple = ("doc_a", "doc_b"),
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: (doc, rep)
    where ``rep`` is the minimum doc id of the connected component —
    the canonical survivor a keep-one dedup retains.

    Iterative min-label propagation: each round every node adopts the
    minimum label among itself and its neighbors; converges in
    O(diameter) rounds — near-dup components are dense clique-ish
    blobs, so diameter is tiny and this is the cheapest path. If a
    pathological long-chain component exceeds ``max_iter`` rounds, the
    resolver FALLS BACK to O(log n) large-star/small-star contraction
    (``star_contraction_components``) instead of failing. Each round
    is one shuffle join on the edge list; ``localCheckpoint`` truncates
    the growing lineage so round N's plan does not replay rounds
    1..N-1. Only docs appearing in ``pairs`` are returned (isolated
    docs are their own rep by definition)."""
    ca, cb = pair_cols
    edges = (
        pairs.select(F.col(ca).alias("src"), F.col(cb).alias("dst"))
        .union(pairs.select(F.col(cb).alias("src"), F.col(ca).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("rep", F.col("doc"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges.src == labels.doc)
            .select(F.col("dst").alias("doc"), "rep")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("doc")
            .agg(F.min("rep").alias("rep"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.rep") != F.col("o.rep"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # component diameter exceeds max_iter: a silently-unconverged
        # label table would split components — switch to the
        # diameter-independent O(log n) algorithm
        out = star_contraction_components(edges)
        edges.unpersist()
        return out
    edges.unpersist()
    return labels


def dedup_near(
    df: DataFrame, pairs: DataFrame, id_col: str,
    pair_cols: tuple = ("doc_a", "doc_b"),
) -> DataFrame:
    """Keep-one near-dup dedup: drop every doc whose cluster rep is a
    different (smaller) id; docs in no pair survive untouched. Works
    over any pair source (minhash/simhash/ngram text pairs, or
    embedding pairs via ``pair_cols=("id_a", "id_b")``)."""
    drop = (
        duplicate_clusters(pairs, pair_cols=pair_cols)
        .filter(F.col("doc") != F.col("rep"))
        .select(F.col("doc").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


def shingle_hash_rows(
    df: DataFrame, id_col: str, text: str, *, shingle_k: int = 3,
    seed: int = 2014,
) -> DataFrame:
    """(doc, sh) posting rows: one row per distinct word-k-shingle hash
    per document (same vectorized shingle hashes as MinHash — one batch
    UDF emits the array, Spark explodes it)."""

    @F.pandas_udf(ArrayType(LongType()))
    def sh_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([
            hs.view(np.int64)
            for hs in _shingle_hashes_batch(texts, shingle_k, seed)
        ])

    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(sh_udf(F.col(text))).alias("sh"),
    )


def near_dup_pairs_ngram(
    df: DataFrame, id_col: str, text: str, *, threshold: float = 0.6,
    shingle_k: int = 3, seed: int = 2014, bucket_cap: int | None = 8192,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs by PPJoin-style prefix
    filtering (Xiao et al., WWW'08; Bayardo et al., WWW'07 — published
    algorithm, no LSH approximation).

    Candidate generation with a RECALL GUARANTEE: order every doc's
    shingles by global rarity (document frequency, ties by hash); if
    J(A,B) >= t then the first ``|x| - ceil(t*|x|) + 1`` shingles of
    each side must share an element (prefix-filtering principle), so
    joining only the prefix postings finds every qualifying pair —
    unlike MinHash-LSH there is no probabilistic miss. Exact-jaccard
    verification then removes false candidates.

    Scale shape: the df aggregation and the posting self-join move
    (doc, sh) longs only — never text; prefixes shrink the postings by
    ~t; hot shingles (boilerplate) are chunk-tiled by
    ``tiled_band_self_join``; verification touches candidates only."""
    sh = shingle_hash_rows(
        df, id_col, text, shingle_k=shingle_k, seed=seed
    ).persist()
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("dfreq"))
    n_sh = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    )
    w = Window.partitionBy("doc").orderBy("dfreq", "sh")
    prefix = (
        sh.join(dfreq, "sh")
        .withColumn("rk", F.row_number().over(w))
        .join(n_sh, "doc")
        .filter(F.col("rk") <= prefix_len)
        .select("doc", "sh")
    )
    cands = tiled_band_self_join(
        prefix, "doc", band_cols=("sh",), bucket_cap=bucket_cap
    )
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
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, h in enumerate(_shingle_hashes_batch(texts, shingle_k, seed)):
            if len(h) == 0:
                continue
            bits = (
                (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int64)  # signed BEFORE the vote arithmetic
            votes = bits.sum(axis=0) * 2 - len(h)  # (+1/-1 votes per bit)
            sim = np.uint64(0)
            for bit_idx in np.flatnonzero(votes > 0):
                sim |= np.uint64(1) << np.uint64(bit_idx)
            out[i] = np.int64(sim.astype(np.int64))
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc"), sim_udf(F.col(text)).alias("simhash")
    )


def near_dup_pairs_simhash(
    df: DataFrame, id_col: str, text: str, *, max_hamming: int = 3,
    seed: int = 2014, bucket_cap: int | None = 8192, rotate: int = 0,
    sims: DataFrame | None = None,
) -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming of their simhashes.

    Pigeonhole: ≤3 differing bits over 4 disjoint 16-bit bands ⇒ at
    least one band identical — band-join generates candidates (with
    the same ``tiled_band_self_join`` hot-bucket guard as MinHash:
    near-identical boilerplate shares ALL four bands, m docs ⇒ one
    m²/2 task without it), JVM ``bit_count(a XOR b)`` verifies
    exactly.

    ``rotate`` (bits) rotates every signature before banding; rotation
    is a Hamming isometry, so ANY rotation's banded+verified pair set
    equals the exact Hamming-≤k set — two different rotations give two
    INDEPENDENT band partitions whose results must agree, which is the
    scale-shaped self-check the contract query runs (no O(n²) arm).
    ``sims`` lets callers pass a precomputed (doc, simhash) table so
    the signature UDF runs once across several bandings."""
    if sims is None:
        sims = simhash64(df, id_col, text, seed=seed).persist()
    r = int(rotate) % 64
    if r:
        sig = F.shiftrightunsigned(F.col("simhash"), r).bitwiseOR(
            F.shiftleft(F.col("simhash"), 64 - r)
        )
    else:
        sig = F.col("simhash")
    banded = sims.select(
        "doc", sig.alias("rsim"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(sig, 16 * i)
                .bitwiseAND(F.lit(0xFFFF)) for i in range(4)
            ])
        ).alias("band", "bkey"),
    )
    pairs = tiled_band_self_join(
        banded, "doc", band_cols=("band", "bkey"), bucket_cap=bucket_cap,
        payload_cols=("rsim",),
    ).withColumn(
        # Hamming on the rotated signatures == Hamming on the originals
        "hamming",
        F.bit_count(F.col("rsim_a").bitwiseXOR(F.col("rsim_b"))),
    )
    return pairs.filter(F.col("hamming") <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )
