"""Headline benchmark — distributed sketch ops at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workload mirrors the reference's benchmark shape
(``benchmarks/bulk-insert-and-query.cc``: bulk add → lookups at mixed
hit rates → FPR) plus the companion sketches, run over (a) the
synthetic pre-tokenized sequence table (BASELINE.json ``input_hint``),
cached as Parquet per scale factor, and (b) the driver testdata
lineitem/orders for the semi-join pruning query.

Throughput figures (tokens/sec build, lookups/sec probe) land in the
JSON under "extra" for BASELINE.md tracking.
"""

from __future__ import annotations

import json
import os
import re
import time

import numpy as np

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# samples per row (spread discipline). 1 for expensive one-off scale
# steps (sf1/sf10) where the interesting signal is the plan shape,
# not the noise band.
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
# fingerprint bits of the q1 cuckoo build — the FPR bound row derives
# from this same constant so a retuned build cannot silently compare
# against a stale bound
BUILD_F = 12
BENCH_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")

N_DOCS = {0.001: 1_000, 0.01: 10_000, 0.1: 100_000}


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else 0.1


def tokens_path(spark, sf: float) -> str:
    from cuckoofilter_spark.sources.tokens import write_tokens_table

    n_docs = N_DOCS.get(sf, max(1000, int(sf * 1_000_000)))
    path = os.path.join(BENCH_CACHE, f"tokens_sf{sf}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_tokens_table(spark, path, n_docs, seed=42)
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.build import build_sketch_shards
    from cuckoofilter_spark.operators.merge import merge_shards_to_blob
    from cuckoofilter_spark.operators.probe import might_contain_udf
    from cuckoofilter_spark.operators.approx import (
        approx_distinct, approx_quantiles, cms_sketch,
    )
    from cuckoofilter_spark.operators.semijoin import filter_semi_join
    from cuckoofilter_spark.session import get_spark

    from cuckoofilter_spark.session import warm_python_workers

    sf = _sf_from_dir(SF_DIR)
    # Arrow-UDF stages keep a JVM feeder thread AND a python worker hot
    # per task slot; task.cpus=2 keeps total hot threads ≈ physical
    # cores instead of 2x-oversubscribing (measured ~2x slowdown).
    # showConsoleProgress off: the \r-rewritten stage lines interleave
    # the final JSON metric line on stdout and broke the driver's parse
    # in round 4 (BENCH_r04.json "parsed": null).
    extra = {"spark.ui.showConsoleProgress": "false"}
    if CPUS >= 16:
        extra["spark.task.cpus"] = "2"
    spark = get_spark(app="cuckoofilter-bench", cores=CPUS, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)  # exclude worker spawn/numpy cold-start
    tpath = tokens_path(spark, sf)
    tokens = spark.read.parquet(tpath)
    # one full-scan warm pass: at RUNS=1 (sf10) the first timed query
    # otherwise pays the entire cold OS page cache for the input alone
    # (measured: build_cuckoo 157 s vs the identical-plan semisort's
    # 67 s in the same process); n_tokens doubles as the warm scan
    # coalesce: F.size(NULL) is -1 under the legacy default and would
    # silently skew the tokens/s denominator
    n_tokens = tokens.agg(
        F.sum(F.coalesce(F.size("tokens"), F.lit(0)))
    ).collect()[0][0]

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    # box-phase tracer BEFORE the suite (round-7): the end-of-run
    # core_find tracer alone cannot tell whether an outlier row was a
    # mid-run phase swing; pre+post bracket the record (quiet ≈ 29-31
    # M/s, contended 17-26 — BENCH protocol note)
    def _tracer_mkeys() -> float:
        import numpy as _np

        from cuckoofilter_spark.core.cuckoo import CuckooFilter as _CF
        from cuckoofilter_spark.sources.keys import (
            disjoint_key_sets as _dk, mix_in as _mi,
        )

        _ = (_np.uint64(3) * _np.ones(8, dtype=_np.uint64)).sum()
        a, l = _dk(900_000, 500_000, seed=55)
        f = _CF(1_000_000, 12, seed=55)
        f.add_many(a)
        q = _mi(a, l, 0.5, seed=5)
        best = float("inf")
        for _i in range(3):
            t = time.time()
            f.contains_many(q)
            best = min(best, time.time() - t)
        return round(len(q) / best / 1e6, 1)

    extra["tracer_pre_mkeys_per_sec"] = _tracer_mkeys()

    spread: dict[str, dict] = {}

    def timed2(name, fn, n=RUNS):
        """Median-of-``n`` wall time for a Spark action (this shared VM
        shows >2x run-to-run CPU noise; the first run also warms
        caches). Returns (median_seconds, last_result) and records the
        full sample spread under extra["spread"][name] — so a
        cross-round delta in the headline (median) number can be judged
        against the same-process noise floor. The median is the honest
        headline (round-5 verdict item 7); min/max stay in spread."""
        samples, out = [], None
        for _ in range(n):
            t0 = time.time()
            out = fn()
            samples.append(time.time() - t0)
        ss = sorted(samples)
        spread[name] = {
            "min": round(ss[0], 3),
            "med": round(ss[len(ss) // 2], 3),
            "max": round(ss[-1], 3),
            "n": n,
        }
        return ss[len(ss) // 2], out

    # -- q1: bulk distributed cuckoo build over the token stream -------
    # median-of-n via timed2 (the first run also warms the OS page
    # cache for the parquet input; this sandbox shows >2x run-to-run
    # CPU noise, so the median is the headline and min/max go to
    # spread)
    def _q1():
        shards = build_sketch_shards(
            tokens, "tokens", kind="cuckoo", lineage=False,
            max_num_keys=1 << 21, bits_per_item=BUILD_F, seed=7,
            strategy="shuffle_distinct",
        )
        return merge_shards_to_blob(shards, dedup=True, fanout=16)

    queries["build_cuckoo"], blob = timed2("build_cuckoo", _q1)
    extra["build_tokens_per_sec"] = n_tokens / queries["build_cuckoo"]
    extra["n_tokens"] = int(n_tokens)

    # -- q2: probe 2M keys (~50% hit rate vs the 2^20 vocab) -----------
    probe = might_contain_udf(spark, blob)
    # warm pass (round-5 verdict item 6): the first probe after a
    # fresh broadcast pays blob ship + per-worker deserialize on every
    # python worker (measured 5.1 s vs 1.3 s steady-state at sf10) —
    # one tiny untimed probe pins the blob in each worker's UDF cache
    # so the timed rows measure probe throughput, not broadcast warmup
    spark.range(0, 1 << 14).select(probe(F.col("id")).alias("h")).agg(
        F.sum(F.col("h").cast("long"))
    ).collect()
    queries["probe_2m"], n_hits = timed2("probe_2m", lambda: (
        spark.range(0, 2 << 20)
        .select(F.col("id").alias("tok"))
        .select(probe("tok").alias("hit"))
        .agg(F.sum(F.col("hit").cast("long")))
        .collect()[0][0]
    ))
    extra["probe_lookups_per_sec"] = (2 << 20) / queries["probe_2m"]
    extra["probe_hits"] = int(n_hits)

    # -- q2a: probe 32M keys — the 2M row is fixed-overhead-bound
    # (scheduling + broadcast dominate), so it understates sustained
    # probe throughput by ~10x; this row shows both regimes in the
    # headline table (BENCH/scaling.json measures 25.5 M/s at 128M).
    queries["probe_32m"], n_hits32 = timed2("probe_32m", lambda: (
        spark.range(0, 32 << 20)
        .select(F.col("id").alias("tok"))
        .select(probe("tok").alias("hit"))
        .agg(F.sum(F.col("hit").cast("long")))
        .collect()[0][0]
    ))
    extra["probe32_lookups_per_sec"] = (32 << 20) / queries["probe_32m"]
    extra["probe32_hits"] = int(n_hits32)

    # Achieved DISTRIBUTED FPR vs the published bound (the north
    # metric's "achieved FPR-vs-bound ... on the table"): every
    # inserted key is a vocab id < 2^20, so ids in [2^20, 32M) are
    # true negatives BY CONSTRUCTION — every hit up there is a false
    # positive, no member count needed (filter .size would undercount
    # members whose (bucket, tag) collapsed in the set-mode merge and
    # bias the FPR upward). One untimed probe pass over the negative
    # range; bound = 2b/2^f from the same f the build used.
    _neg_hits = (
        spark.range(1 << 20, 32 << 20)
        .select(probe(F.col("id").alias("tok")).alias("hit"))
        .agg(F.sum(F.col("hit").cast("long")))
        .collect()[0][0]
    )
    _n_neg = (32 << 20) - (1 << 20)
    extra["distributed_fpr_pct"] = round(int(_neg_hits) / _n_neg * 100, 4)
    extra["distributed_fpr_bound_pct"] = round(
        100 * 2 * 4 / (1 << BUILD_F), 4
    )

    # -- q2b: semi-sorted (f=13, 12 bits/tag) build — ss-CF baseline row
    def _q2b():
        ss_shards = build_sketch_shards(
            tokens, "tokens", kind="semisort", lineage=False,
            max_num_keys=1 << 21, bits_per_item=13, seed=7,
            strategy="shuffle_distinct",
        )
        return merge_shards_to_blob(ss_shards, dedup=True, fanout=16)

    queries["build_semisort"], ss_blob = timed2("build_semisort", _q2b)
    extra["semisort_blob_bytes"] = len(ss_blob)

    # -- q3: bloom build over the same stream ---------------------------
    # bloom is distinct-insensitive (OR-idempotent inserts), so the
    # size+duplication-gated auto rule applies: local at sf0.1,
    # JVM pre-distinct at the sf10 step (same cutover as HLL/KMV)
    from cuckoofilter_spark.operators.approx import _distinct_strategy

    bloom_strategy = _distinct_strategy(tokens, "tokens", "auto")

    def _q3():
        bshards = build_sketch_shards(
            tokens, "tokens", kind="bloom", lineage=False,
            log_num_buckets=16, seed=7, strategy=bloom_strategy,
        )
        return merge_shards_to_blob(bshards, dedup=False, fanout=16)

    queries["build_bloom"], _ = timed2("build_bloom", _q3)

    # -- q4: HLL distinct tokens ----------------------------------------
    queries["hll_distinct"], extra["hll_estimate"] = timed2("hll_distinct",
        lambda: approx_distinct(tokens, "tokens", p=14, seed=7)
    )

    # -- q4b: KMV distinct (theta-family; set-algebra-capable) ----------
    from cuckoofilter_spark.operators.approx import kmv_sketch

    queries["kmv_distinct"], extra["kmv_estimate"] = timed2("kmv_distinct",
        lambda: float(kmv_sketch(tokens, "tokens", k=4096, seed=7)
                      .estimate())
    )

    # -- q5: count-min heavy hitters -------------------------------------
    def _q5():
        sk = cms_sketch(tokens, "tokens", eps=0.0001, delta=0.01, seed=7)
        return int(sk.query_many(np.arange(64, dtype=np.uint64)).max())

    queries["cms_build"], extra["cms_hot_token_max"] = timed2("cms_build", _q5)

    # -- q5b: Misra-Gries top vocab (round 5) — lower-bound complement
    # of the CMS row; same auto collapse on the token arrays
    from cuckoofilter_spark.operators.approx import mg_sketch

    def _q5b():
        sk = mg_sketch(tokens, "tokens", k=4096, seed=7)
        return int(len(sk.keys))

    queries["mg_topvocab"], extra["mg_tracked"] = timed2("mg_topvocab", _q5b)

    # -- q6: t-digest quantiles of n_tok ---------------------------------
    queries["tdigest_quantiles"], qs = timed2("tdigest_quantiles", lambda: approx_quantiles(
        tokens, "n_tok", [0.01, 0.5, 0.99], kind="tdigest", seed=7
    ))
    extra["n_tok_p50_est"] = float(qs[1])

    # -- q7: cuckoo-pruned semi-join on the driver testdata ---------------
    lineitem = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    queries["cf_semijoin"], cnt = timed2("cf_semijoin", lambda: filter_semi_join(
        lineitem, "l_orderkey",
        orders.filter(F.col("o_totalprice") > 150000), "o_orderkey",
        kind="cuckoo", exact=True,
    ).count())
    extra["semijoin_rows"] = int(cnt)

    # -- q7b/c/d: training-pipeline operators over documents ------------
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    from cuckoofilter_spark.operators.dedup import near_dup_pairs_minhash

    queries["minhash_dedup"], extra["minhash_pairs"] = timed2("minhash_dedup",
        lambda: near_dup_pairs_minhash(
            docs, "doc_id", "text", threshold=0.8
        ).count()
    )

    from cuckoofilter_spark.operators.text import with_text_stats

    queries["text_stats"], _ = timed2("text_stats",
        lambda: with_text_stats(docs).agg(F.sum("quality_milli")).collect()
    )

    # -- q7a1: Gopher rule gate (round 7) --------------------------------
    # seven-rule quality filter as one narrow JVM projection + tiny
    # per-source agg — the first-pass web-corpus gate; kept-count is
    # the determinism tripwire
    from cuckoofilter_spark.operators.text import gopher_stats

    queries["gopher"], extra["gopher_kept"] = timed2(
        "gopher",
        lambda: int(
            gopher_stats(docs, stopwords=["the", "a", "value", "table"])
            .agg(F.sum("n_kept")).collect()[0][0]
        ),
    )

    # -- q7a2: incremental ingest (round 7) ------------------------------
    # cross-corpus near-dedup: new batch (1/5 of the corpus) against
    # the rest — two fused kernel passes, two-sided skew-tiled band
    # join, per-side verify broadcast polarity
    from cuckoofilter_spark.operators.dedup import near_dup_pairs_crosscorpus

    queries["crosscorpus_dedup"], extra["crosscorpus_pairs"] = timed2(
        "crosscorpus_dedup",
        lambda: near_dup_pairs_crosscorpus(
            docs.filter(F.col("doc_id") % 5 == 0),
            docs.filter(F.col("doc_id") % 5 != 0),
            "doc_id", "text", threshold=0.8,
        ).count(),
    )

    # -- q7b0: substring-level dedup (round 7) ---------------------------
    # corpus-frequent 3-gram duplicated-span report: one kernel pass,
    # the collapsing 8-byte count scan, cuckoo gate below the
    # posexplode, candidate-only verify + window. The agg forces the
    # full per-doc report; total covered mass doubles as a
    # determinism tripwire across runs.
    from cuckoofilter_spark.operators.spans import duplicated_span_stats

    queries["dup_spans"], extra["dup_span_covered"] = timed2(
        "dup_spans",
        lambda: int(
            duplicated_span_stats(docs, "doc_id", "text", k=3, min_count=4)
            .agg(F.sum("covered")).collect()[0][0]
        ),
    )

    # -- q7b1: temperature data-mix resample (round 6) -------------------
    # one per-source aggregation (driver-side rate math) + broadcast
    # dim + explode fan-out; 2-epoch budget at tau=0.5 so the row
    # exercises BOTH integral copies and the fractional md5 draw
    from cuckoofilter_spark.operators.sampling import resample_mixture

    queries["mixture_resample"], extra["mixture_rows_out"] = timed2(
        "mixture_resample",
        lambda: resample_mixture(
            docs, "source", "doc_id", size_col="n_chars",
            temperature=0.5, target_frac=2.0, seed=17,
        ).count(),
    )

    # -- q7b2: corpus-shaping stage (round 3) ----------------------------
    # decontamination is the flagship pipeline use of the filter:
    # eval n-grams -> broadcast CF -> narrow corpus probe -> exact
    # verify join on candidates only
    from cuckoofilter_spark.operators.decontam import decontaminate

    queries["decontam"], extra["decontam_docs"] = timed2("decontam",
        lambda: decontaminate(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            "doc_id", "text", n=3, min_overlap=1,
        ).count()
    )

    # -- q7b3: novelty scoring (round 5) — same gate shape as decontam
    # but every doc gets an exact (n_total, n_seen) row
    from cuckoofilter_spark.operators.decontam import novelty_report

    queries["novelty"], extra["novelty_docs"] = timed2("novelty",
        lambda: novelty_report(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            "doc_id", "text", n=3,
        ).count()
    )
    spark.catalog.clearCache()  # novelty/eval persists are per-run

    from cuckoofilter_spark.operators.packing import (
        pack_documents, packing_stats,
    )
    from cuckoofilter_spark.operators.text import token_count_ws

    queries["pack_docs"], extra["pack_bins"] = timed2("pack_docs",
        lambda: int(
            packing_stats(
                pack_documents(
                    docs.withColumn("n_tok", token_count_ws("text")),
                    "doc_id", "n_tok", max_tokens=2048, n_streams=32,
                ),
                "n_tok",
            ).agg(F.sum("n_bins")).collect()[0][0]
        )
    )

    from cuckoofilter_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries["cosine_topk"], extra["cosine_rows"] = timed2("cosine_topk",
        lambda: cosine_topk(
            emb, emb.filter(F.col("vec_id") < 20), k=10
        ).count()
    )

    # -- q7g2: SemDeDup scale path (round 7) -----------------------------
    # IVF-celled semantic dedup: spherical-Lloyd cells then per-cell
    # slab-chunked GEMM pairs -> components -> keep-one; kept-count is
    # the determinism tripwire (given the fixed seed)
    from cuckoofilter_spark.operators.similarity import dedup_semantic_ivf

    queries["semantic_dedup"], extra["semantic_kept"] = timed2(
        "semantic_dedup",
        lambda: dedup_semantic_ivf(
            emb, threshold=0.44, n_cells=64, refine_iters=1, seed=7
        ).count(),
    )

    # -- q7e: simhash near-dup pairs (banded, skew-tiled) -----------------
    from cuckoofilter_spark.operators.dedup import near_dup_pairs_simhash

    queries["simhash_dedup"], extra["simhash_pairs"] = timed2("simhash_dedup",
        lambda: near_dup_pairs_simhash(
            docs, "doc_id", "text", max_hamming=3
        ).count()
    )

    # -- q7f: IVF approximate top-k over embeddings ------------------------
    from cuckoofilter_spark.operators.similarity import ivf_topk

    queries["ivf_topk"], extra["ivf_rows"] = timed2("ivf_topk", lambda: ivf_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=10, n_cells=64, nprobe=8
    ).count())

    # -- q7g: per-group mergeable HLL UDAF over events ---------------------
    from cuckoofilter_spark.operators.grouped import grouped_sketch_agg

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    queries["hll_by_group"], grows = timed2("hll_by_group", lambda: grouped_sketch_agg(
        events, "event_type", "user_id", kind="hll", p=14, seed=7
    ).collect())
    extra["hll_groups"] = len(grows)

    # -- q7h: per-group exact top-k via MG pruning (round-6: scale row
    # for grouped_top_k_exact — blob-only summary shuffle + candidate
    # semi-join + distributed certification). on_uncertified='exact':
    # the synthetic events tail goes FLAT at the sf10 step (hundreds
    # of users tied at the k-th count — no summary size can certify a
    # zero gap), so the row measures the honest certify-or-fallback
    # path: certified groups keep the pruned plan, flat-tail groups
    # pay the direct exact aggregation, result exact either way.
    from cuckoofilter_spark.operators.approx import grouped_top_k_exact

    queries["grouped_topk"], extra["grouped_topk_rows"] = timed2(
        "grouped_topk",
        lambda: grouped_top_k_exact(
            events, "event_type", "user_id", 10, seed=7,
            on_uncertified="exact",
        ).count(),
    )

    # -- q8: reference-shaped single-node microbench (conext-figure5 /
    # bulk-insert-and-query analog): core numpy kernels, no Spark —
    # directly comparable to BASELINE.md's single-machine numbers.
    from cuckoofilter_spark.core.cuckoo import CuckooFilter
    from cuckoofilter_spark.sources.keys import disjoint_key_sets, mix_in

    t0 = time.time()
    add_set, lookup_set = disjoint_key_sets(1_800_000, 1_000_000, seed=99)
    core = CuckooFilter(2_000_000, 12, seed=99)
    w = CuckooFilter(2_000_000, 12, seed=99)
    t1 = time.time()
    w.add_many(add_set)  # warm allocator/page-fault pass (also timed)
    warm_sec = time.time() - t1
    w.contains_many(lookup_set[:100_000])  # warm the SWAR probe kernels too
    t1 = time.time()
    core.add_many(add_set)
    add_sec = min(time.time() - t1, warm_sec)  # best-of-2 (VM noise)
    extra["core_add_mkeys_per_sec"] = len(add_set) / add_sec / 1e6
    finds = {}
    for rate in (0.0, 0.25, 0.5, 0.75, 1.0):
        q = mix_in(add_set, lookup_set, rate, seed=7)
        best = float("inf")
        for _ in range(2):  # best-of-2: the shared VM's CPU noise >2x
            t1 = time.time()
            hits = core.contains_many(q)
            best = min(best, time.time() - t1)
        finds[f"{int(rate * 100)}%"] = round(len(q) / best / 1e6, 2)
        if rate == 0.0:
            extra["core_fpr_pct"] = round(float(hits.mean()) * 100, 4)
        if rate == 1.0:
            assert bool(hits.all()), "false negative in core sweep"
    extra["core_find_mkeys_per_sec"] = finds
    extra["core_bits_per_item"] = round(core.bits_per_item, 2)
    # Statistics-printer parity (benchmarks/bulk-insert-and-query.cc:69-120):
    # optimal bits = log2(1/eps); wasted space = bits/item over optimal
    if extra["core_fpr_pct"] > 0:
        import math

        opt = math.log2(100.0 / extra["core_fpr_pct"])
        extra["core_optimal_bits_per_item"] = round(opt, 2)
        extra["core_wasted_space_pct"] = round(
            (core.bits_per_item / opt - 1) * 100, 1
        )
    queries["core_microbench"] = time.time() - t0

    # conext-table3 analog (capability metric, NOT part of the timed
    # total): fill until first refusal; reference reaches ~0.95 @ f=12
    fill = CuckooFilter(1 << 19, 12, seed=5)
    rng_keys = np.random.default_rng(5).integers(
        0, 2**64, 1 << 20, dtype=np.uint64
    )
    pos = 0
    while pos < len(rng_keys):
        st_codes = fill.add_many(rng_keys[pos:pos + 65536])
        pos += 65536
        if (st_codes != 0).any():
            break
    extra["core_fill_load_at_failure"] = round(fill.load_factor, 4)
    # table3 parity row: bits/item AT the achieved fill load
    # (reference: 12.60 bits/item at 0.95 load, f=12)
    extra["core_fill_bits_per_item"] = round(fill.bits_per_item, 2)

    # previous-round side-by-side: latest BENCH_r*.json committed by
    # the driver, so every round's numbers carry their predecessor
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prev_files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if prev_files:
        try:
            with open(prev_files[-1]) as fh:
                prev = json.load(fh)
            prev_parsed = prev.get("parsed", prev)
            extra["prev_round"] = {
                "file": os.path.basename(prev_files[-1]),
                "queries": prev_parsed.get("queries", {}),
                "total": prev_parsed.get("value"),
                "sf": prev_parsed.get("sf"),
            }
        except Exception:
            pass

    extra["spread"] = spread
    total = sum(queries.values())
    payload = {
        "metric": "sketch_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf,
        "extra": {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in extra.items()},
    }
    # Durable machine-readable record (round-4 verdict: the driver's
    # stdout tail-grep is fragile; this file is the authoritative copy).
    # The headline file only tracks the official sf0.1 step — runs at
    # other scales write last_run_sf{sf}.json instead, so an sf0.01
    # verify run or an sf10 scale run can never silently replace the
    # sf0.1 record (a mislabeled sf0.01 record was committed as the
    # headline once in round 6).
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "BENCH"), exist_ok=True)
    name = "last_run.json" if sf == 0.1 else f"last_run_sf{sf}.json"
    with open(os.path.join(here, "BENCH", name), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    spark.stop()
    # Sole final stdout line: emit AFTER spark.stop() so no executor
    # output can trail it, with a leading newline to clear any
    # half-written \r progress line. The line is MINIMAL (<=1KB): the
    # driver's tail-capture window is small and rounds 4-5 lost the
    # record to a 3.5KB line. Full extra/spread live in
    # BENCH/last_run.json (the authoritative on-disk copy).
    import sys

    minimal = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": payload["queries"],
        "sf": payload["sf"],
    }
    line = json.dumps(minimal, separators=(",", ":"))
    if len(line) > 1000:
        # Drop per-query detail before the total rather than emit an
        # unparseable tail; the on-disk record keeps everything.
        minimal.pop("queries")
        line = json.dumps(minimal, separators=(",", ":"))
    sys.stderr.flush()
    sys.stdout.write("\n" + line + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
