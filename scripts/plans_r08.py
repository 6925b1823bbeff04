"""Capture .explain('formatted') for the bench query paths touched in
round 8 -> plans/r08/<name>_{before,after}.txt.

Usage: python scripts/plans_r08.py before|after [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r08")


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from cuckoofilter_spark.session import get_spark

    import bench as B

    tag = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    sf = B._sf_from_dir(SF_DIR)
    extra = {"spark.ui.showConsoleProgress": "false"}
    if CPUS >= 16:
        extra["spark.task.cpus"] = "2"
    spark = get_spark(app="plans-r08", cores=CPUS, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    tokens = spark.read.parquet(B.tokens_path(spark, sf))
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    lineitem = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))

    plans: dict[str, object] = {}

    def add(name, fn):
        if only and name not in only:
            return
        try:
            plans[name] = explain_str(fn())
        except Exception as e:  # pragma: no cover - capture tool
            plans[name] = f"ERROR capturing plan: {e!r}\n"

    # --- build family: the shard-build DataFrame (pre-merge)
    def _cuckoo_shards():
        from cuckoofilter_spark.operators.build import build_sketch_shards

        return build_sketch_shards(
            tokens, "tokens", kind="cuckoo", lineage=False,
            max_num_keys=1 << 21, bits_per_item=12, seed=7,
            strategy="shuffle_distinct",
        )
    add("build_cuckoo_shards", _cuckoo_shards)

    def _hll_shards():
        from cuckoofilter_spark.operators.approx import _distinct_strategy
        from cuckoofilter_spark.operators.build import build_sketch_shards

        return build_sketch_shards(
            tokens, "tokens", kind="hll", distinct=False, lineage=False,
            strategy=_distinct_strategy(tokens, "tokens", "auto"),
            p=14, seed=7,
        )
    add("hll_shards", _hll_shards)

    def _decontam():
        from cuckoofilter_spark.operators.decontam import decontaminate

        return decontaminate(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            "doc_id", "text", n=3, min_overlap=1,
        )
    add("decontam", _decontam)

    def _novelty():
        from cuckoofilter_spark.operators.decontam import novelty_report

        return novelty_report(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            "doc_id", "text", n=3,
        )
    add("novelty", _novelty)

    def _minhash():
        from cuckoofilter_spark.operators.dedup import near_dup_pairs_minhash

        return near_dup_pairs_minhash(docs, "doc_id", "text", threshold=0.8)
    add("minhash_pairs", _minhash)

    def _cosine():
        from cuckoofilter_spark.operators.similarity import cosine_topk

        return cosine_topk(emb, emb.filter(F.col("vec_id") < 20), k=10)
    add("cosine_topk", _cosine)

    def _semantic():
        from cuckoofilter_spark.operators.similarity import dedup_semantic_ivf

        return dedup_semantic_ivf(
            emb, threshold=0.44, n_cells=64, refine_iters=1, seed=7
        )
    add("semantic_dedup", _semantic)

    def _gopher():
        from cuckoofilter_spark.operators.text import gopher_stats

        return gopher_stats(docs, stopwords=["the", "a", "value", "table"])
    add("gopher", _gopher)

    def _text():
        from cuckoofilter_spark.operators.text import with_text_stats

        return with_text_stats(docs).agg(F.sum("quality_milli"))
    add("text_stats", _text)

    def _spans():
        from cuckoofilter_spark.operators.spans import duplicated_span_stats

        return duplicated_span_stats(docs, "doc_id", "text", k=3, min_count=4)
    add("dup_spans", _spans)

    def _semijoin():
        from cuckoofilter_spark.operators.semijoin import filter_semi_join

        return filter_semi_join(
            lineitem, "l_orderkey",
            orders.filter(F.col("o_totalprice") > 150000), "o_orderkey",
            kind="cuckoo", exact=True,
        )
    add("cf_semijoin", _semijoin)

    def _grouped_topk():
        from cuckoofilter_spark.operators.approx import _grouped_top_k_plan

        _, _, top = _grouped_top_k_plan(
            events, "event_type", "user_id", 10, 1024, 7,
        )
        return top
    add("grouped_topk", _grouped_topk)

    def _crosscorpus():
        from cuckoofilter_spark.operators.dedup import (
            near_dup_pairs_crosscorpus,
        )

        return near_dup_pairs_crosscorpus(
            docs.filter(F.col("doc_id") % 5 == 0),
            docs.filter(F.col("doc_id") % 5 != 0),
            "doc_id", "text", threshold=0.8,
        )
    add("crosscorpus", _crosscorpus)

    for name, text in plans.items():
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
