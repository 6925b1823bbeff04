"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Scoring is one BLAS GEMM per Arrow batch (round 8; the JVM
  ``zip_with``+``aggregate`` fold it replaced is CodegenFallback);
  each task emits only its local top-k per query, then a bounded
  per-query window ranks exactly. At scale: queries are collected
  (small by contract), the corpus scan is embarrassingly parallel,
  and only (tasks × n_queries × k) rows survive to the final sort —
  never a corpus-wide shuffle of vectors.
- ``lsh_ann_topk``: the scale path — L independent random-hyperplane
  LSH tables; candidates = same bucket in ≥1 table; exact re-rank of
  candidates only. Hyperplanes derive from a fixed seed (reproducible
  across executors). Recall tunes with (n_bits, n_tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_EPS = 1e-12


def _as_double(col) -> "F.Column":
    return F.transform(col, lambda x: x.cast("double"))


def _norm(col) -> "F.Column":
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(va: str, vb: str, na: str, nb: str) -> "F.Column":
    """Shared cosine score; the single place the epsilon lives."""
    return _dot(va, vb) / (F.col(na) * F.col(nb) + F.lit(_EPS))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 10, exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors: (query_id, rank, neighbor_id, sim_e6).

    ``sim_e6`` is cosine similarity in 1e-6 integer units — ranking
    uses the full double, the reported value is FP-noise-proof.
    Deterministic tie-break on neighbor id.

    Round 8 (guide §4.2): the corpus×queries scoring is ONE BLAS GEMM
    per Arrow batch inside ``mapInPandas`` — the interpreted
    ``zip_with``/``aggregate`` fold it replaces is CodegenFallback and
    evaluated per (row, query) pair (measured 4.9 s vs 0.5 s on the
    20k×20 sf1.0 step). Each task emits only its local top-k per query
    (pruning by the same total (sim DESC, nbr ASC) order the global
    window uses, so the union provably contains the global top-k); the
    final exact window ranks tasks×queries×k candidate rows. The
    query side is collected to the driver — same smallness contract as
    the ``broadcast(q)`` it replaces."""
    q_rows = queries.select(
        F.col(id_col).cast("long"), _as_double(vec_col)
    ).collect()
    if not q_rows:
        # empty query set: preserve the (empty) output schema
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, rank int, nbr long, sim_e6 long"
        )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    kk, excl = int(k), bool(exclude_self)

    def part_topk(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf["nbr"].to_numpy()
            M = np.stack([
                np.asarray(v, dtype=np.float64) for v in pdf["cv"]
            ])
            cn = np.sqrt((M * M).sum(axis=1))
            sims = (M @ Q.T) / (cn[:, None] * qn[None, :] + _EPS)
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                s = sims[:, j]
                nbr = ids
                if excl:
                    keep = nbr != qids[j]
                    s, nbr = s[keep], nbr[keep]
                if len(s) > kk:
                    # partial top-k by (sim DESC, nbr ASC): lexsort on
                    # (-rank keys) then slice — small arrays per task
                    idx = np.lexsort((nbr, -s))[:kk]
                else:
                    idx = np.lexsort((nbr, -s))
                out_q.append(np.full(len(idx), qids[j], dtype=np.int64))
                out_n.append(nbr[idx])
                out_s.append(s[idx])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "nbr": np.concatenate(out_n),
                "sim": np.concatenate(out_s),
            })

    from cuckoofilter_spark.session import fan_out

    # raw float column, not _as_double: float32 -> float64 is exact in
    # numpy, and skipping the interpreted per-element transform keeps
    # the scan narrow
    cand = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col).alias("nbr"), F.col(vec_col).alias("cv")
    ).mapInPandas(part_topk, "query_id long, nbr long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nbr"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "nbr",
            F.round(F.col("sim") * 1e6).cast("long").alias("sim_e6"),
        )
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_bucket_udf(dim: int, n_bits: int, n_tables: int, seed: int):
    """pandas UDF: embedding -> array<long> of per-table bucket keys.

    Vectorized per Arrow batch: one (batch, dim) @ (dim, tables*bits)
    matmul, sign-bits packed per table."""
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    flat = planes.reshape(n_tables * n_bits, dim).T  # (dim, T*B)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def bucketize(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ flat) > 0  # (batch, T*B)
        bits = bits.reshape(len(m), n_tables, n_bits)
        keys = (bits * weights[None, None, :]).sum(axis=2)  # (batch, T)
        # offset per table so buckets never collide across tables
        keys = keys + (np.arange(n_tables, dtype=np.int64) << np.int64(n_bits))[None, :]
        return pd.Series(list(keys))

    return bucketize


def lsh_multiprobe_bucket_udf(
    dim: int, n_bits: int, n_tables: int, seed: int, n_probes: int
):
    """Query-side multi-probe bucketizer (Lv et al., VLDB'07,
    restricted to 1-bit perturbations): per table emit the base bucket
    PLUS the ``n_probes-1`` buckets reached by flipping the sign bits
    with the smallest hyperplane margins — the buckets a near-miss
    neighbor most likely fell into. Same plane family as
    ``lsh_bucket_udf`` (the corpus side stays 1 bucket/table), so
    multi-probe buys the recall of ~n_probes times the tables at the
    memory/shuffle cost of the SMALL table count."""
    if not 1 <= n_probes <= n_bits + 1:
        raise ValueError(f"n_probes must be in [1, n_bits+1], got {n_probes}")
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    flat = planes.reshape(n_tables * n_bits, dim).T  # (dim, T*B)
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    offsets = (np.arange(n_tables, dtype=np.int64) << np.int64(n_bits))

    @F.pandas_udf(ArrayType(LongType()))
    def bucketize(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        proj = m @ flat                                  # (batch, T*B)
        bits = (proj > 0).reshape(len(m), n_tables, n_bits)
        base = (bits * weights[None, None, :]).sum(axis=2)  # (batch, T)
        marg = np.abs(proj).reshape(len(m), n_tables, n_bits)
        # bits ranked by how close the point sits to each hyperplane
        flip_order = np.argsort(marg, axis=2)[:, :, : n_probes - 1]
        out = np.empty((len(m), n_tables, n_probes), dtype=np.int64)
        out[:, :, 0] = base
        for j in range(n_probes - 1):
            out[:, :, j + 1] = base ^ (
                np.int64(1) << flip_order[:, :, j].astype(np.int64)
            )
        out += offsets[None, :, None]
        return pd.Series(list(out.reshape(len(m), -1)))

    return bucketize


def lsh_ann_topk(
    corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int, k: int = 10, n_bits: int = 6,
    n_tables: int = 16, seed: int = 2014, exclude_self: bool = True,
    target_recall: float | None = None, recall_at_sim: float = 0.8,
    max_tables: int = 256, n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: LSH-bucket candidate join + exact re-rank.

    Output schema matches ``cosine_topk`` so recall can be computed by
    a plain join of the two results.

    ``target_recall=`` sizes (n_bits, n_tables) automatically via
    ``lsh_params_for_recall`` at ``recall_at_sim`` — the cosine level
    at which neighbors must be found with that probability (true
    neighbors ABOVE it are found with higher probability; the solver's
    S-curve is monotone in s).

    ``n_probes > 1`` turns on query-side multi-probe (see
    ``lsh_multiprobe_bucket_udf``): the corpus is still hashed once
    per table — replication factor, the memory/shuffle cost driver,
    stays n_tables — while each query additionally checks its
    n_probes-1 most-likely near-miss buckets per table. The
    target_recall solver assumes single-probe, so with n_probes>1 it
    is conservative (measured recall only goes up)."""
    if target_recall is not None:
        n_bits, n_tables = lsh_params_for_recall(
            recall_at_sim, target_recall, max_tables=max_tables
        )
    bucketize = lsh_bucket_udf(dim, n_bits, n_tables, seed)
    q_bucketize = (
        lsh_multiprobe_bucket_udf(dim, n_bits, n_tables, seed, n_probes)
        if n_probes > 1 else bucketize
    )
    from cuckoofilter_spark.session import fan_out

    c = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col).alias("nbr"), _as_double(vec_col).alias("cv"),
        F.explode(bucketize(vec_col)).alias("bucket"),
    ).withColumn("cn", _norm("cv"))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"),
        F.explode(q_bucketize(vec_col)).alias("bucket"),
    ).withColumn("qn", _norm("qv"))
    cand = c.join(F.broadcast(q), "bucket").drop("bucket")
    if exclude_self:
        cand = cand.filter(F.col("nbr") != F.col("query_id"))
    cand = cand.dropDuplicates(["query_id", "nbr"])
    scored = cand.withColumn("sim", _cosine("qv", "cv", "qn", "cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nbr"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "nbr",
            F.round(F.col("sim") * 1e6).cast("long").alias("sim_e6"),
        )
    )


def ivf_centroids(
    corpus: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 64, seed: int = 2014, refine_iters: int = 0,
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: sample ``n_cells`` corpus
    vectors by hash order (reproducible across runs/executors — same
    principle as the filter's explicit hash seeds) and L2-normalize.

    ``refine_iters`` runs that many spherical-k-means (Lloyd) rounds:
    one distributed assignment+partial-sum job per round (mapInPandas
    emits per-task (cell, count, sum) rows — n_cells × tasks tiny rows
    — and the driver finishes the means). Refinement tightens cell
    balance, raising recall at fixed nprobe; 0 keeps the one-shot
    hash-sampled quantizer."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), _as_double(vec_col).alias("v"))
        .orderBy(F.xxhash64("i", F.lit(seed)))
        .limit(n_cells)
        .collect()
    )
    C = np.array([r["v"] for r in rows], dtype=np.float64)
    C /= np.linalg.norm(C, axis=1, keepdims=True) + _EPS
    for _ in range(int(refine_iters)):
        C = _lloyd_round(corpus, C, vec_col)
    return C


def _lloyd_round(corpus: DataFrame, C: np.ndarray, vec_col: str) -> np.ndarray:
    """One spherical-k-means round: distributed nearest-centroid
    partial sums, driver-side mean+renormalize. Empty cells keep their
    previous centroid (the standard Lloyd dead-cell rule)."""
    Ct = C.T.copy()
    n_cells, dim = C.shape

    def part(batches):
        sums = np.zeros((n_cells, dim))
        counts = np.zeros(n_cells, dtype=np.int64)
        for pdf in batches:
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["v"]])
            M = M / (np.linalg.norm(M, axis=1, keepdims=True) + _EPS)
            a = (M @ Ct).argmax(axis=1)
            np.add.at(sums, a, M)
            np.add.at(counts, a, 1)
        hit = np.flatnonzero(counts)
        if len(hit):
            yield pd.DataFrame(
                {
                    "cell": hit.astype(np.int64),
                    "n": counts[hit],
                    "s": [sums[c].tobytes() for c in hit],
                }
            )

    from cuckoofilter_spark.session import fan_out

    rows = (
        fan_out(corpus.select(_as_double(vec_col).alias("v")))
        .mapInPandas(part, "cell long, n long, s binary")
        .collect()
    )
    sums = np.zeros((n_cells, dim))
    counts = np.zeros(n_cells, dtype=np.int64)
    for r in sorted(rows, key=lambda r: r["cell"]):  # deterministic order
        sums[r["cell"]] += np.frombuffer(bytes(r["s"]), dtype=np.float64)
        counts[r["cell"]] += r["n"]
    out = C.copy()
    hit = counts > 0
    out[hit] = sums[hit] / counts[hit, None]
    out /= np.linalg.norm(out, axis=1, keepdims=True) + _EPS
    return out


def ivf_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """pandas UDF: embedding -> array<long> of the nprobe nearest
    centroid ids (one matmul per Arrow batch)."""
    C = centroids.T  # (dim, cells)

    @F.pandas_udf(ArrayType(LongType()))
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        M = M / (np.linalg.norm(M, axis=1, keepdims=True) + _EPS)
        sims = M @ C                      # (batch, cells)
        if nprobe == 1:
            cells = sims.argmax(axis=1)[:, None]
        else:
            cells = np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe]
        return pd.Series(list(cells.astype(np.int64)))

    return assign


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 10, n_cells: int = 64,
    nprobe: int = 8, seed: int = 2014, exclude_self: bool = True,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    ``n_cells`` inverted lists (each vector in its nearest cell), probe
    the ``nprobe`` nearest cells per query, exact-rerank candidates.

    Scale shape: corpus assignment is one matmul per Arrow batch and
    adds NO copies (one cell per vector — vs L copies under
    multi-table LSH); the candidate equi-join touches ~nprobe/n_cells
    of the corpus per query. Recall rises with nprobe (= n_cells →
    exact). Output schema matches ``cosine_topk`` for recall joins."""
    C = ivf_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells, seed=seed,
        refine_iters=refine_iters,
    )
    corpus_cell = ivf_assign_udf(C, nprobe=1)
    query_cells = ivf_assign_udf(C, nprobe=nprobe)
    from cuckoofilter_spark.session import fan_out

    # fan_out (round 8): single-row-group scans serialize the assign
    # UDF + norm projection; result is partition-independent
    c = fan_out(corpus).select(
        F.col(id_col).alias("nbr"), _as_double(vec_col).alias("cv"),
        F.explode(corpus_cell(vec_col)).alias("cell"),
    ).withColumn("cn", _norm("cv"))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"),
        F.explode(query_cells(vec_col)).alias("cell"),
    ).withColumn("qn", _norm("qv"))
    cand = c.join(F.broadcast(q), "cell").drop("cell")
    if exclude_self:
        cand = cand.filter(F.col("nbr") != F.col("query_id"))
    cand = cand.dropDuplicates(["query_id", "nbr"])
    scored = cand.withColumn("sim", _cosine("qv", "cv", "qn", "cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nbr"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "nbr",
            F.round(F.col("sim") * 1e6).cast("long").alias("sim_e6"),
        )
    )


def cosine_near_dup_pairs(
    corpus: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.44,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.

    Brute-force O(n²) non-equi self-join — kept ONLY as the oracle
    baseline for tests (Spark executes it as BroadcastNestedLoop).
    Production paths: ``cosine_near_dup_pairs_blocked`` (exact, tiled
    GEMM, equi-join shuffles only) or ``lsh_near_dup_pairs``
    (subquadratic, for thresholds with a collision-probability
    margin)."""
    a = corpus.select(
        F.col(id_col).alias("id_a"), _as_double(vec_col).alias("va")
    ).withColumn("na", _norm("va"))
    b = corpus.select(
        F.col(id_col).alias("id_b"), _as_double(vec_col).alias("vb")
    ).withColumn("nb", _norm("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", _cosine("va", "vb", "na", "nb"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )


def cosine_near_dup_pairs_blocked(
    corpus: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.44, n_blocks: int = 16,
) -> DataFrame:
    """EXACT near-dup pairs via block-tiled matrix products — the plan
    that survives scale-up when the threshold sits inside the bulk of
    the similarity distribution (here pairs exist AT 0.44, so any
    probabilistic bucketing either misses pairs or degenerates to
    all-pairs; exact answers are inherently Θ(n²) — the design goal is
    making the quadratic work *well-shaped*, not pretending it away).

    Plan: each vector hash-blocks into one of B blocks and replicates
    to the B tiles (i,j), i≤j, it participates in; one
    ``groupBy(tile).applyInPandas`` computes the tile's similarity
    block as a single BLAS GEMM and emits only pairs ≥ threshold.

    Scale properties (vs the naive id_a<id_b theta-join):
    - shuffle = n·B vector copies (√-replication), NOT n² rows;
    - no CartesianProduct/BroadcastNestedLoopJoin anywhere — the only
      wide node is a hash partition on the tile key;
    - every task holds two (n/B, d) matrices → memory bounded by B;
    - candidate pairs never materialize as rows, they stream out of a
      vectorized numpy comparison.
    Pick B ≈ n·d·8 / (target task bytes); B=16 bounds tasks to ~2·n/16
    vectors each here."""
    if n_blocks < 1:
        raise ValueError("n_blocks must be >= 1")
    from cuckoofilter_spark.session import fan_out

    vecs = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    # tile membership: block b joins tiles (i,b) for i<=b and (b,j) for
    # j>b — exactly one tile per unordered block pair, so no pair dedup
    tiles = F.array(
        *(
            [
                F.when(F.lit(i) <= F.col("blk"),
                       F.lit(i) * n_blocks + F.col("blk"))
                .otherwise(F.col("blk") * n_blocks + F.lit(i))
                for i in range(n_blocks)
            ]
        )
    )
    exploded = vecs.select(
        "vid", "v", "blk", F.explode(tiles).alias("tile")
    )

    thr = float(threshold)
    nb = int(n_blocks)

    def tile_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iloc[0])
        ti, tj = tile // nb, tile % nb
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        norms = np.linalg.norm(M, axis=1) + _EPS
        ids = pdf["vid"].to_numpy()
        blks = pdf["blk"].to_numpy()
        if ti == tj:
            S = (M @ M.T) / (norms[:, None] * norms[None, :])
            ia, ib = np.nonzero(np.triu(S >= thr, k=1))
        else:
            a = blks == ti
            b = ~a
            S = (M[a] @ M[b].T) / (
                norms[a][:, None] * norms[b][None, :]
            )
            ra, rb = np.nonzero(S >= thr)
            ia = np.flatnonzero(a)[ra]
            ib = np.flatnonzero(b)[rb]
        id_a = np.minimum(ids[ia], ids[ib])
        id_b = np.maximum(ids[ia], ids[ib])
        keep = id_a != id_b
        return pd.DataFrame({"id_a": id_a[keep], "id_b": id_b[keep]})

    return (
        exploded.groupBy("tile")
        .applyInPandas(tile_pairs, "id_a long, id_b long")
    )


def lsh_params_for_recall(
    threshold: float, target_recall: float, *, max_tables: int = 256,
    max_bits: int = 24,
) -> tuple[int, int]:
    """Solve (n_bits, n_tables) so a pair at cosine ``threshold`` is
    found with probability ≥ ``target_recall``.

    Hyperplane LSH: per-bit collision p = 1 - acos(s)/π (published
    SimHash/random-projection analysis, Charikar STOC'02); a pair is
    MISSED with probability (1 - p^n_bits)^n_tables. The solver picks
    the LARGEST n_bits whose required table count
    ``ceil(log(1-R) / log(1-p^n_bits))`` fits ``max_tables`` — more
    bits = sparser buckets = fewer candidates, tables are the
    replication cost, so this maximizes selectivity within a fixed
    replication budget. Raises when the threshold sits below the
    achievable S-curve zone (even 1 bit per table cannot reach the
    target within ``max_tables``) — the blocked-GEMM exact path is the
    right operator there, not a silently-lossy LSH."""
    import math

    if not (0.0 < target_recall < 1.0):
        raise ValueError("target_recall must be in (0, 1)")
    if not (-1.0 < threshold < 1.0):
        raise ValueError("cosine threshold must be in (-1, 1)")
    p = 1.0 - math.acos(threshold) / math.pi
    if p <= 0.0:
        raise ValueError("threshold <= -1 has zero collision probability")
    log_miss = math.log(1.0 - target_recall)
    for n_bits in range(max_bits, 0, -1):
        q = p ** n_bits
        if q >= 1.0:  # threshold ~ 1.0: one table of max_bits suffices
            return n_bits, 1
        n_tables = math.ceil(log_miss / math.log(1.0 - q))
        if n_tables <= max_tables:
            return n_bits, n_tables
    raise ValueError(
        f"no (n_bits<=**{max_bits}**, n_tables<={max_tables}) reaches "
        f"recall {target_recall} at cosine {threshold} (per-bit "
        f"collision p={p:.3f}) — the threshold sits below the LSH "
        f"S-curve zone; raise max_tables or use the exact blocked path "
        f"(cosine_near_dup_pairs_blocked)"
    )


def lsh_multiprobe_params_for_recall(
    threshold: float, target_recall: float, n_probes: int, *,
    max_replication: int = 256, max_bits: int = 24,
) -> tuple[int, int]:
    """(n_bits, n_tables) for the MULTI-PROBE pair join so a pair at
    cosine ``threshold`` is found with probability ≥ ``target_recall``
    within a total replication budget of ``max_replication`` rows per
    point (base arm + probe arm = n_tables * (1 + n_probes)).

    Model: per-bit collision p = 1 - acos(s)/π. A table catches the
    pair if the codes match (p^b) or differ in EXACTLY one bit that
    one endpoint's m = n_probes-1 flip set covers. The flip sets are
    margin-ranked, but the model scores them as uniform m-of-b draws
    from both sides — ρ = 1-(1-m/b)² — which UNDERSTATES recovery for
    genuinely-near pairs (the mismatched hyperplane grazes the pair,
    so it ranks early by margin); the solver is therefore conservative
    and measured recall lands above target (tests/test_lsh_autosize).
    Like the single-probe solver, picks the largest (most selective)
    n_bits whose table count fits the budget."""
    import math

    if n_probes < 2:
        raise ValueError("n_probes must be >= 2 for the multi-probe solver")
    if not (0.0 < target_recall < 1.0):
        raise ValueError("target_recall must be in (0, 1)")
    if not (-1.0 < threshold < 1.0):
        raise ValueError("cosine threshold must be in (-1, 1)")
    p = 1.0 - math.acos(threshold) / math.pi
    if p <= 0.0:
        raise ValueError("threshold <= -1 has zero collision probability")
    m = n_probes - 1
    log_miss = math.log(1.0 - target_recall)
    for n_bits in range(max_bits, 0, -1):
        rho = 1.0 if m >= n_bits else 1.0 - (1.0 - m / n_bits) ** 2
        q = (p ** n_bits
             + n_bits * p ** (n_bits - 1) * (1.0 - p) * rho)
        if q >= 1.0:
            return n_bits, 1
        n_tables = math.ceil(log_miss / math.log(1.0 - q))
        if n_tables * (1 + n_probes) <= max_replication:
            return n_bits, n_tables
    raise ValueError(
        f"no (n_bits<={max_bits}) fits replication budget "
        f"{max_replication} at recall {target_recall}, cosine "
        f"{threshold}, n_probes={n_probes} — raise max_replication or "
        f"use the exact blocked path"
    )


def lsh_near_dup_pairs(
    corpus: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.9, dim: int, n_bits: int = 16, n_tables: int = 32,
    seed: int = 2014, target_recall: float | None = None,
    max_tables: int = 256, n_probes: int = 1,
) -> DataFrame:
    """SUBQUADRATIC near-dup pairs for HIGH thresholds: hyperplane-LSH
    bucket equi-join for candidates, exact cosine verification.

    Recall for a pair at cosine s: per-bit collision p = 1 - acos(s)/π;
    miss probability (1-p^n_bits)^n_tables. Pass ``target_recall=`` to
    SOLVE (n_bits, n_tables) from the threshold instead of sizing by
    hand (``lsh_params_for_recall``; raises when the threshold sits
    below the achievable S-curve zone instead of silently missing
    pairs). With explicit (n_bits, n_tables): at s=0.95 the defaults
    give miss ≈ (1-0.181)^32 ≈ 1.7e-3, but at lower thresholds they
    degrade fast — prefer ``target_recall``. Precision is exact
    (candidates verify with the true cosine). Candidates stay
    near-linear when 2^n_bits ≫ corpus/bucket-occupancy; for
    thresholds near the bulk of the distribution use
    ``cosine_near_dup_pairs_blocked``.

    ``n_probes > 1`` turns on multi-probe (same 1-bit-flip scheme as
    the ANN path, ``lsh_multiprobe_bucket_udf``), ASYMMETRICALLY: one
    join arm keeps base buckets (n_tables rows/point — the bucket-
    occupancy driver), the other also emits each point's n_probes-1
    lowest-margin flip buckets per table. A pair is caught when either
    endpoint probes into the other's base bucket, so a one-bit code
    miss is recovered when the offending hyperplane grazes EITHER
    point — which for a genuinely-near pair is the likely geometry.
    That lets n_tables shrink at fixed measured recall: total
    replication n_tables*(1+n_probes) rows/point vs 2*n_tables(solver)
    for single-probe, a net cut once the solver's table count is >
    ~(1+n_probes)/2 times the multi-probe one (measured in
    tests/test_lsh_autosize.py). With ``target_recall`` AND
    ``n_probes>1``, sizing goes through the multi-probe-aware solver
    (``lsh_multiprobe_params_for_recall``, budget = ``max_tables``
    rows/point TOTAL across both arms) — it picks fewer bits/tables
    because 1-bit flips recover most single-bit code misses."""
    if target_recall is not None:
        if n_probes > 1:
            n_bits, n_tables = lsh_multiprobe_params_for_recall(
                threshold, target_recall, n_probes,
                max_replication=max_tables,
            )
        else:
            n_bits, n_tables = lsh_params_for_recall(
                threshold, target_recall, max_tables=max_tables
            )
    bucketize = lsh_bucket_udf(dim, n_bits, n_tables, seed)
    p_bucketize = (
        lsh_multiprobe_bucket_udf(dim, n_bits, n_tables, seed, n_probes)
        if n_probes > 1 else bucketize
    )
    from cuckoofilter_spark.session import fan_out

    corpus = fan_out(corpus.select(F.col(id_col), F.col(vec_col)))
    base = corpus.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("v"),
        F.explode(bucketize(vec_col)).alias("bucket"),
    ).withColumn("nrm", _norm("v"))
    probed = base if n_probes == 1 else corpus.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("v"),
        F.explode(p_bucketize(vec_col)).alias("bucket"),
    ).withColumn("nrm", _norm("v"))
    left = base.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "bucket",
    )
    right = probed.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    joined = left.join(right, "bucket").filter(F.col("id_a") != F.col("id_b"))
    if n_probes > 1:
        # base×probe sees each unordered pair from both directions —
        # canonicalize before dedup so (a,b)/(b,a) collapse
        joined = joined.select(
            F.least("id_a", "id_b").alias("id_a_c"),
            F.greatest("id_a", "id_b").alias("id_b_c"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("va"))
             .otherwise(F.col("vb")).alias("va_c"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("vb"))
             .otherwise(F.col("va")).alias("vb_c"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("na"))
             .otherwise(F.col("nb")).alias("na_c"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("nb"))
             .otherwise(F.col("na")).alias("nb_c"),
        ).withColumnsRenamed({
            "id_a_c": "id_a", "id_b_c": "id_b", "va_c": "va",
            "vb_c": "vb", "na_c": "na", "nb_c": "nb",
        })
    else:
        joined = joined.filter(F.col("id_a") < F.col("id_b"))
    cand = joined.dropDuplicates(["id_a", "id_b"])
    return (
        cand.withColumn("sim", _cosine("va", "vb", "na", "nb"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )


def ann_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """recall@k of the approx result against the exact result, per
    query: |exact∩approx| / |exact|."""
    e = exact.select("query_id", F.col("nbr").alias("e_nbr"))
    a = approx.select("query_id", F.col("nbr").alias("a_nbr"))
    hits = e.join(
        a, (e.query_id == a.query_id) & (e.e_nbr == a.a_nbr)
    ).groupBy(e.query_id).count()
    totals = e.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return (
        totals.join(hits, "query_id", "left")
        .withColumn(
            "recall_e4",
            F.round(F.coalesce(F.col("count"), F.lit(0)) * 10000 / F.col("n_exact"))
            .cast("long"),
        )
        .select("query_id", "recall_e4")
    )


# ------------------------------------------------ semantic dedup
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): drop all but one member
# of each cluster of semantically-near-identical documents, measured
# in embedding space. Composition of shipped parts: exact cosine
# pairs (blocked GEMM) or within-IVF-cell pairs (the paper's k-means
# restriction) → connected components → keep-one (min-id or
# quality-keep-best via operators/dedup.dedup_near).


def cosine_near_dup_pairs_celled(
    corpus: DataFrame, centroids: np.ndarray, *,
    id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.44, chunk: int = 4096,
) -> DataFrame:
    """(id_a, id_b) cosine-≥-threshold pairs restricted to vectors in
    the SAME IVF cell — the SemDeDup candidate restriction: cross-cell
    pairs are deliberately not considered (the paper's k-means
    clustering step). One ``groupBy(cell).applyInPandas``; each task
    GEMMs its own cell in ``chunk``-row slabs, so task memory is
    O(cell·d + chunk·cell) regardless of cell size. Cell balance (and
    therefore the recall/task-size trade) is the quantizer's job —
    pass ``ivf_centroids(..., refine_iters>0)`` output."""
    from pyspark.sql.types import StructField, StructType

    assign = ivf_assign_udf(centroids, nprobe=1)
    from cuckoofilter_spark.session import fan_out

    cells = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col).cast("long").alias("vid"),
        _as_double(vec_col).alias("v"),
        assign(F.col(vec_col))[0].alias("cell"),
    )
    out_schema = StructType([
        StructField("id_a", LongType()), StructField("id_b", LongType()),
    ])

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vid"].to_numpy()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        M /= np.linalg.norm(M, axis=1, keepdims=True) + _EPS
        n = len(ids)
        a_out, b_out = [], []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = M[s:e] @ M.T                      # (slab, n)
            ii, jj = np.nonzero(sims >= threshold)
            gi = ii + s
            keep = gi < jj                           # i < j, no self
            a, b = ids[gi[keep]], ids[jj[keep]]
            swap = a > b                             # emit id_a < id_b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            a_out.append(a2)
            b_out.append(b2)
        return pd.DataFrame({
            "id_a": np.concatenate(a_out) if a_out else
            np.empty(0, dtype=np.int64),
            "id_b": np.concatenate(b_out) if b_out else
            np.empty(0, dtype=np.int64),
        })

    return cells.groupBy("cell").applyInPandas(cell_pairs, out_schema)


def dedup_semantic(
    emb_df: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", threshold: float = 0.44,
    n_blocks: int = 16, keep: str = "min_id",
    quality_col: str | None = None,
) -> DataFrame:
    """EXACT SemDeDup: keep one member of every cosine-≥-threshold
    connected component. Pairs come from the block-tiled exact GEMM
    (no CartesianProduct; Θ(n²) work well-shaped into bounded BLAS
    tiles); survivor policy is ``dedup_near``'s (min-id, or
    ``keep='best'`` with a quality column)."""
    from cuckoofilter_spark.operators.dedup import dedup_near

    pairs = cosine_near_dup_pairs_blocked(
        emb_df, id_col=id_col, vec_col=vec_col,
        threshold=threshold, n_blocks=n_blocks,
    )
    return dedup_near(
        emb_df, pairs, id_col, pair_cols=("id_a", "id_b"),
        keep=keep, quality_col=quality_col,
    )


def dedup_semantic_ivf(
    emb_df: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", threshold: float = 0.44,
    n_cells: int = 64, refine_iters: int = 2, seed: int = 2014,
    keep: str = "min_id", quality_col: str | None = None,
) -> DataFrame:
    """The SemDeDup SCALE path — the paper's actual recipe: k-means
    the embeddings (spherical Lloyd via ``ivf_centroids``), then
    near-dup candidates only WITHIN each cell. Work drops from
    Θ(n²/B) tiles to Σ cell² ≈ n²/n_cells; the approximation is
    explicit and one-sided — a cross-cell near-dup pair is missed
    (the paper accepts this; tight duplicates co-assign almost
    surely, and recall rises with ``refine_iters``). Survivor policy
    as in ``dedup_semantic``."""
    from cuckoofilter_spark.operators.dedup import dedup_near

    C = ivf_centroids(
        emb_df, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
        seed=seed, refine_iters=refine_iters,
    )
    pairs = cosine_near_dup_pairs_celled(
        emb_df, C, id_col=id_col, vec_col=vec_col, threshold=threshold,
    )
    return dedup_near(
        emb_df, pairs, id_col, pair_cols=("id_a", "id_b"),
        keep=keep, quality_col=quality_col,
    )
