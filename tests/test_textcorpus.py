"""JSONL corpus source: enforced schema, corrupt-line accounting,
quality gate, compressed round-trip."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F


def _write_corpus(path):
    os.makedirs(path)
    lines = [
        '{"doc_id":"a","text":"hello world","lang":"en","source":"web"}',
        '{"doc_id":"b","text":"bonjour","lang":"fr","source":"web"}',
        "NOT JSON AT ALL {{{",
        '{"doc_id":"c","lang":"en","source":"web"}',  # missing text
    ]
    with gzip.open(os.path.join(path, "part-0.jsonl.gz"), "wt") as f:
        f.write("\n".join(lines))


def test_jsonl_read_stats_gate_roundtrip(spark, tmp_path):
    from cuckoofilter_spark.sources.textcorpus import (
        corpus_ingest_stats, document_schema, read_jsonl_corpus,
        write_jsonl_corpus,
    )

    src = str(tmp_path / "corpus")
    _write_corpus(src)

    raw = (
        spark.read.schema(document_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(src)
    )
    assert corpus_ingest_stats(raw) == {
        "n_rows": 4, "n_corrupt": 1, "n_null_text": 1,
    }

    clean = read_jsonl_corpus(spark, src)
    got = sorted((r.doc_id, r.text) for r in clean.collect())
    assert got == [("a", "hello world"), ("b", "bonjour"), ("c", None)]
    assert "_corrupt_record" not in clean.columns

    # quality gate: 1/4 corrupt > 10%
    with pytest.raises(ValueError, match="corrupt JSONL"):
        read_jsonl_corpus(spark, src, max_corrupt_frac=0.1)
    # generous gate passes
    read_jsonl_corpus(spark, src, max_corrupt_frac=0.5)

    # extra fields extend the enforced schema
    ext = read_jsonl_corpus(spark, src, extra_fields={"score": "double"})
    assert "score" in ext.columns

    # gzip JSONL round-trip
    out = str(tmp_path / "out")
    write_jsonl_corpus(clean.filter(F.col("text").isNotNull()), out)
    back = read_jsonl_corpus(spark, out)
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) \
        == ["a", "b"]
    assert any(f.endswith(".gz") for f in os.listdir(out)
               if f.startswith("part-"))


def test_shape_corpus_job_jsonl_input(spark, tmp_path):
    """jobs/shape_corpus.py accepts JSONL input in-process: the
    enforced-schema read feeds the same pipeline; stage counts stay
    monotone."""
    import json as _json
    import sys
    from io import StringIO

    from cuckoofilter_spark.sources.textcorpus import write_jsonl_corpus

    import jobs.shape_corpus as job

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang", "source") \
        .withColumn("doc_id", F.col("doc_id").cast("string"))
    src = str(tmp_path / "corpus_jsonl")
    write_jsonl_corpus(docs, src)

    out = str(tmp_path / "shaped")
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        rc = job.main([
            "--input", src, "--format", "jsonl",
            "--min-quality", "100", "--sample-rate", "0.9",
            "--holdout", "0.2", "--holdout-by", "content",
            "--max-tokens", "1024", "--streams", "4",
            "--output", out,
        ])
    finally:
        sys.stdout = old
    assert rc == 0
    stats = _json.loads(cap.getvalue().strip().splitlines()[-1])
    assert stats["rows_in"] == docs.count()
    assert (stats["rows_in"] >= stats["after_dedup"]
            >= stats["after_quality"] >= stats["after_sample"]
            == stats["rows_out"] > 0)
    # content-keyed holdout flag present and both sides populated
    shaped = spark.read.parquet(f"{out}/data")
    flags = {r[0] for r in shaped.select("is_holdout").distinct().collect()}
    assert flags == {True, False}


def test_shape_corpus_job_mixture_stage(spark, tmp_path):
    """--mix-by swaps uniform thinning for the temperature data-mix
    planner: stage counts stay monotone with an after_mix entry, the
    output keeps every source (τ=0.5 at a 0.5 budget never zeroes a
    stratum at this size), and --sample-rate is refused alongside."""
    import json as _json
    import sys
    from io import StringIO

    import pytest as _pt

    import jobs.shape_corpus as job

    out = str(tmp_path / "shaped_mix")
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        rc = job.main([
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--mix-by", "source", "--mix-temperature", "0.5",
            "--mix-budget-frac", "0.5",
            "--max-tokens", "1024", "--streams", "4",
            "--output", out,
        ])
    finally:
        sys.stdout = old
    assert rc == 0
    stats = _json.loads(cap.getvalue().strip().splitlines()[-1])
    assert (stats["rows_in"] >= stats["after_dedup"]
            >= stats["after_mix"] >= stats["after_sample"]
            == stats["rows_out"] > 0)
    assert stats["after_mix"] < stats["after_dedup"]  # budget bit
    shaped = spark.read.parquet(f"{out}/data")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert (shaped.select("source").distinct().count()
            == docs.select("source").distinct().count())
    with _pt.raises(SystemExit, match="exclusive"):
        job.main([
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--mix-by", "source", "--mix-budget-frac", "0.5",
            "--sample-rate", "0.5", "--output", out,
        ])
    with _pt.raises(SystemExit, match="requires"):
        job.main([
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--mix-by", "source", "--output", out,
        ])


def test_vocab_report_job(spark, tmp_path):
    """jobs/vocab_report.py in-process: top-words per group are the
    EXACT window answer, overlap pairs cover all group pairs, vocab
    sizes exist per group."""
    import json as _json
    import sys
    from io import StringIO

    import jobs.vocab_report as job

    out = str(tmp_path / "vocab_rep")
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        rc = job.main([
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--group", "source", "--top-k", "5", "--output", out,
        ])
    finally:
        sys.stdout = old
    assert rc == 0
    stats = _json.loads(cap.getvalue().strip().splitlines()[-1])
    n_groups = stats["groups"]
    assert n_groups >= 2
    assert stats["top_words"] == 5 * n_groups
    assert stats["overlap_pairs"] == n_groups * (n_groups - 1) // 2

    # exactness spot-check: group-1's top word by full count
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from cuckoofilter_spark.operators.text import words_col
    g0 = docs.select("source").orderBy("source").first()["source"]
    want = (
        docs.filter(F.col("source") == g0)
        .select(F.explode(words_col("text")).alias("w"))
        .groupBy("w").count().orderBy(F.desc("count"), "w")
        .first()
    )
    got = (
        spark.read.parquet(f"{out}/top_words")
        .filter((F.col("source") == g0) & (F.col("rank") == 1))
        .first()
    )
    assert got["n"] == want["count"]


def test_shape_corpus_job_oov_gate(spark, tmp_path):
    """The OOV gate stage: planted mojibake documents (tokens that
    appear nowhere else in the corpus) are dropped, ordinary documents
    survive, and the stage count lands between its neighbors."""
    import json as _json
    import sys
    from io import StringIO

    import jobs.shape_corpus as job

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    junk = spark.createDataFrame(
        [(900000 + i,
          " ".join(f"xqzj{i}w{j}" for j in range(40)),
          "und", "junk")
         for i in range(5)],
        "doc_id long, text string, lang string, source string",
    )
    src = str(tmp_path / "oov_src")
    docs.select("doc_id", "text", "lang", "source").unionByName(junk) \
        .write.parquet(src)

    out = str(tmp_path / "oov_shaped")
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        rc = job.main([
            "--input", src,
            "--max-oov-e6", "500000", "--vocab-min-count", "5",
            "--max-tokens", "1024", "--streams", "4",
            "--output", out,
        ])
    finally:
        sys.stdout = old
    assert rc == 0
    stats = _json.loads(cap.getvalue().strip().splitlines()[-1])
    assert stats["after_quality"] >= stats["after_oov"] > 0
    kept = {r.doc_id for r in
            spark.read.parquet(f"{out}/data").select("doc_id").collect()}
    assert not any(d >= 900000 for d in kept), "mojibake doc survived"
    # the bulk of the real corpus passes the 50% OOV gate
    assert stats["after_oov"] >= 0.9 * (stats["after_quality"] - 5)


def test_shape_corpus_job_is_deterministic(spark, tmp_path):
    """The job's headline claim: identical inputs + seed reproduce the
    identical shaped output (row set, including bin assignments)."""
    import jobs.shape_corpus as job

    src = "/root/testdata/sf0.001/documents.parquet"
    outs = []
    for tag in ("a", "b"):
        out = str(tmp_path / f"shaped_{tag}")
        rc = job.main([
            "--input", src, "--min-quality", "100",
            "--sample-rate", "0.8", "--holdout", "0.1",
            "--max-tokens", "1024", "--streams", "4", "--output", out,
        ])
        assert rc == 0
        rows = {tuple(r) for r in spark.read.parquet(f"{out}/data")
                .select("doc_id", "is_holdout", "stream", "bin_id",
                        "n_tok").collect()}
        outs.append(rows)
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_shape_corpus_gopher_stage(spark, tmp_path):
    """--gopher gates the pipeline with the rule filter: after_gopher
    appears between dedup and quality in the monotone chain, and the
    custom stopword list is honored (the default English list would
    keep zero synthetic docs)."""
    import json as _json
    import sys
    from io import StringIO

    import jobs.shape_corpus as job

    out = str(tmp_path / "shaped_gopher")
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        rc = job.main([
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--gopher", "--gopher-stopwords", "the,a,value,table",
            "--max-tokens", "1024", "--streams", "2",
            "--output", out,
        ])
    finally:
        sys.stdout = old
    assert rc == 0
    stats = _json.loads(cap.getvalue().strip().splitlines()[-1])
    assert (stats["rows_in"] >= stats["after_dedup"]
            >= stats["after_gopher"] >= stats["after_quality"]
            >= stats["after_sample"] == stats["rows_out"])
    assert 0 < stats["after_gopher"] < stats["after_dedup"]
