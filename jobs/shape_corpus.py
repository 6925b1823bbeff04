"""spark-submit entrypoint: end-to-end corpus shaping for training.

    spark-submit --py-files cuckoofilter_spark.zip jobs/shape_corpus.py \
        --input /data/documents --eval /data/benchmarks \
        --id doc_id --text text \
        --min-quality 400 --sample-rate 0.5 --holdout 0.01 \
        --max-tokens 2048 --streams 512 --output /out/shaped

The full pre-training pipeline, one declarative plan per stage so
Catalyst fuses the narrow ones into a single scan where possible:

1. exact dedup (md5 keep-min);
2. benchmark decontamination against ``--eval`` (CF gate + exact
   verify — flagged docs dropped, exact semantics);
3. PII redaction + quality/repetition gates (narrow projections);
4. deterministic Bernoulli thinning (``--sample-rate``) and
   hash-disjoint holdout tagging (``--holdout``);
5. token packing into ``--streams`` independent streams of
   ``--max-tokens`` bins.

Output layout: shaped rows (with ``is_holdout``, ``stream``,
``bin_id``) under ``<output>/data``; per-stage row counts as one JSON
line on stdout. Every stage is deterministic in (row identity, seed):
re-running the job reproduces byte-identical output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "jsonl"],
                    help="jsonl: enforced-schema corpus read with a "
                         "0.1%% corrupt-line gate (sources/textcorpus)")
    ap.add_argument("--eval", dest="eval_path", default=None,
                    help="eval/benchmark docs to decontaminate against")
    ap.add_argument("--id", dest="id_col", default="doc_id")
    ap.add_argument("--text", dest="text_col", default="text")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--min-overlap", type=int, default=1)
    ap.add_argument("--min-quality", type=int, default=0,
                    help="drop docs below this quality_milli (0..1000)")
    ap.add_argument("--max-top-word-frac-e4", type=int, default=10_000,
                    help="drop docs whose most frequent word exceeds "
                         "this e4 fraction (Gopher-style repetition gate)")
    ap.add_argument("--max-oov-e6", type=int, default=1_000_000,
                    help="drop docs whose out-of-vocabulary token rate "
                         "against the corpus frequent vocabulary "
                         "exceeds this 1e-6 fraction (mojibake / "
                         "wrong-language gate); 1000000 disables")
    ap.add_argument("--vocab-min-count", type=int, default=10,
                    help="frequency floor for the OOV gate's corpus "
                         "vocabulary (frequent_keys_filter)")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the seven-rule Gopher/MassiveText "
                         "quality gate (Rae et al. 2021 A1.1) before "
                         "the score-based gates")
    ap.add_argument("--gopher-stopwords", default=None,
                    help="comma-separated stopword list for the "
                         "Gopher r_stop rule (default: the published "
                         "8-word English list; set per corpus "
                         "language/domain)")
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument("--mix-by", default=None,
                    help="source/stratum column: replace uniform "
                         "thinning with the temperature data-mix "
                         "planner (sample_mixture over whitespace "
                         "token mass); exclusive with --sample-rate")
    ap.add_argument("--mix-temperature", type=float, default=1.0,
                    help="mixture temperature tau (<1 upweights tail "
                         "sources)")
    ap.add_argument("--mix-budget-frac", type=float, default=None,
                    help="token budget as a fraction of the corpus "
                         "(required with --mix-by)")
    ap.add_argument("--holdout", type=float, default=0.0)
    ap.add_argument("--holdout-by", default="id",
                    choices=["id", "content"],
                    help="holdout keying: 'id' hashes the doc id; "
                         "'content' hashes the exact-dedup fingerprint "
                         "so duplicate texts never straddle the split "
                         "(split_leakage_safe)")
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--streams", type=int, default=32)
    ap.add_argument("--seed", type=int, default=2014)
    ap.add_argument("--auto-scale-conf", action="store_true",
                    help="size shuffle partitions / scan splits from "
                         "the input's Catalyst size estimate "
                         "(session.scale_conf) instead of cluster "
                         "defaults")
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.decontam import decontaminate
    from cuckoofilter_spark.operators.dedup import dedup_exact
    from cuckoofilter_spark.operators.packing import pack_documents
    from cuckoofilter_spark.operators.sampling import (
        sample_hash, split_train_holdout,
    )
    from cuckoofilter_spark.operators.text import (
        quality_score_milli, redact_pii, token_count_ws,
        with_repetition_stats,
    )

    spark = SparkSession.builder.appName("shape-corpus").getOrCreate()
    t0 = time.time()
    # per-stage wall clock (round-7 verdict item 7): each stage's
    # count() is the action that executes it, so the marginal time
    # between counts IS that stage's wall time — including the lineage
    # recompute the lazy pipeline implies (stages are deliberately NOT
    # cached: production runs write once at the end, and caching would
    # report a pipeline nobody runs)
    stage_sec: dict[str, float] = {}
    _last = [t0]

    def _mark(name: str) -> None:
        now = time.time()
        stage_sec[name] = round(now - _last[0], 2)
        _last[0] = now
    if args.format == "jsonl":
        # count clean rows via the ingest stats (a bare count() on the
        # corrupt-filtered frame trips Spark's only-corrupt-column
        # restriction — see sources/textcorpus.py)
        from pyspark.sql import functions as _F

        from cuckoofilter_spark.sources.textcorpus import (
            corpus_ingest_stats, document_schema,
        )

        raw = (
            spark.read.schema(document_schema())
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(args.input)
        )
        stats = corpus_ingest_stats(raw)
        if stats["n_corrupt"] > 0.001 * max(stats["n_rows"], 1):
            raise SystemExit(
                f"corrupt JSONL fraction over gate: {stats}"
            )
        df = raw.filter(_F.col("_corrupt_record").isNull())             .drop("_corrupt_record")
        counts = {"rows_in": stats["n_rows"] - stats["n_corrupt"]}
    else:
        df = spark.read.parquet(args.input)
        counts = {"rows_in": df.count()}

    _mark("read")

    if args.auto_scale_conf:
        from cuckoofilter_spark.operators.approx import _plan_size_bytes
        from cuckoofilter_spark.session import scale_conf

        size = _plan_size_bytes(df)
        if size > 0:
            for k, v in scale_conf(size).items():
                spark.conf.set(k, v)
            counts["scale_conf_partitions"] = int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )

    # 1. exact dedup
    df = dedup_exact(df, args.id_col, args.text_col)
    counts["after_dedup"] = df.count()
    _mark("dedup")

    # 2. decontamination (exact — only flagged ids are dropped)
    if args.eval_path:
        ev = spark.read.parquet(args.eval_path)
        flagged = decontaminate(
            df, ev, args.id_col, args.text_col,
            n=args.ngram, min_overlap=args.min_overlap, seed=args.seed,
        ).select(args.id_col)
        df = df.join(flagged, args.id_col, "left_anti")
        counts["after_decontam"] = df.count()
        _mark("decontam")

    # 3a. Gopher rule gate (opt-in) — runs on RAW text before PII
    # redaction: the published rules are defined over the original
    # document, and redaction tokens would perturb word statistics
    if args.gopher:
        from cuckoofilter_spark.operators.text import gopher_filter

        sw = (
            [w.strip() for w in args.gopher_stopwords.split(",")
             if w.strip()]
            if args.gopher_stopwords else None
        )
        df = gopher_filter(df, args.text_col, stopwords=sw)
        counts["after_gopher"] = df.count()
        _mark("gopher")

    # 3. PII redaction + quality/repetition gates
    df = df.withColumn(args.text_col, redact_pii(args.text_col))
    if args.min_quality > 0:
        df = df.filter(
            quality_score_milli(args.text_col) >= args.min_quality
        )
    if args.max_top_word_frac_e4 < 10_000:
        df = with_repetition_stats(df, args.text_col).filter(
            F.col("top_word_frac_e4") <= args.max_top_word_frac_e4
        ).drop("n_words", "dup_word_frac_e4", "top_word_frac_e4",
               "dup_bigram_frac_e4")
    counts["after_quality"] = df.count()
    _mark("quality")

    # 3b. OOV gate: corpus frequent vocabulary (CMS floor -> cuckoo
    # filter, one-sided: truly-frequent words always in) scored per
    # document with the narrow probe counter — docs made mostly of
    # corpus-rare tokens (mojibake, binary spill, the wrong language)
    # drop out for the cost of two collapsing scans and a broadcast
    if args.max_oov_e6 < 1_000_000:
        from cuckoofilter_spark.operators.approx import (
            frequent_keys_filter,
        )
        from cuckoofilter_spark.operators.build import string_key_expr
        from cuckoofilter_spark.operators.probe import count_hits_udf
        from cuckoofilter_spark.operators.text import words_col

        wdf = df.select(
            F.explode(words_col(args.text_col)).alias("w")
        )
        blob = frequent_keys_filter(
            wdf, "w", args.vocab_min_count,
            cms_seed=args.seed + 3, filter_seed=args.seed + 3,
        )
        hits = count_hits_udf(spark, blob)
        toks = F.transform(words_col(args.text_col), string_key_expr)
        df = (
            df.withColumn("_nt", F.size(toks))
            .withColumn("_h", hits(toks))
            .filter(
                (F.col("_nt") == 0)
                | ((F.lit(1.0) - F.col("_h") / F.col("_nt")) * 1_000_000
                   <= args.max_oov_e6)
            )
            .drop("_nt", "_h")
        )
        counts["after_oov"] = df.count()
        _mark("oov")

    # 4. deterministic thinning (uniform or temperature mix) + holdout
    if args.mix_by:
        if args.mix_budget_frac is None:
            raise SystemExit("--mix-by requires --mix-budget-frac")
        if args.sample_rate < 1.0:
            raise SystemExit("--mix-by and --sample-rate are exclusive "
                             "(the mix IS the thinning)")
        from cuckoofilter_spark.operators.sampling import sample_mixture

        df = (
            df.withColumn("_mix_tok", token_count_ws(args.text_col))
        )
        # NULL mix-by rows have no stratum: the mixture join drops
        # them (unlike uniform --sample-rate, which keys on id) —
        # surface the loss explicitly instead of letting it hide
        # inside the budget thinning
        n_null = df.filter(F.col(args.mix_by).isNull()).count()
        if n_null:
            counts["mix_null_dropped"] = n_null
        df = sample_mixture(
            df, args.mix_by, args.id_col, size_col="_mix_tok",
            temperature=args.mix_temperature,
            target_frac=args.mix_budget_frac, seed=args.seed,
        ).drop("_mix_tok")
        counts["after_mix"] = df.count()
        _mark("mix")
    elif args.sample_rate < 1.0:
        df = sample_hash(df, args.id_col, args.sample_rate,
                         seed=args.seed)
    if args.holdout > 0.0:
        if args.holdout_by == "content":
            from cuckoofilter_spark.operators.sampling import (
                split_leakage_safe,
            )

            df = split_leakage_safe(df, args.text_col, args.holdout,
                                    seed=args.seed + 1)
        else:
            df = split_train_holdout(df, args.id_col, args.holdout,
                                     seed=args.seed + 1)
    counts["after_sample"] = df.count()
    _mark("sample_holdout")

    # 5. packing
    df = df.withColumn("_n_tok", token_count_ws(args.text_col))
    packed = pack_documents(
        df, args.id_col, "_n_tok", max_tokens=args.max_tokens,
        n_streams=args.streams, seed=args.seed + 2,
    ).withColumnRenamed("_n_tok", "n_tok")
    packed.write.mode("overwrite").parquet(f"{args.output}/data")

    out = spark.read.parquet(f"{args.output}/data")
    counts["rows_out"] = out.count()
    counts["n_bins"] = out.select("stream", "bin_id").distinct().count()
    _mark("pack_write")
    counts["sec"] = round(time.time() - t0, 2)
    counts["stage_sec"] = stage_sec
    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    sys.exit(main())
