"""Round-8 parity: the fused Arrow text-stats kernel must be
bit-identical to the Column-expression reference form (which the
DuckDB oracles mirror)."""

import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("text-stats-parity")
        .getOrCreate()
    )
    yield s


EDGE_TEXTS = [
    "",
    " ",
    "   \t\n  ",
    "the quick brown fox",
    "le la les et est une phrase",
    "der die das und ist ein",
    "el los las y es una",
    "a#b ... c#d###",
    "...",
    "UPPER lower MiXeD",
    "word " * 200,
    "123 456 7.89 !!!",
    "\x0b\x0c\r\n mixed \t ws",
    "unicode éèê café naïve",
    "nbsp stays one word",  # unicode ws must NOT split (Java \\s)
    "tab\tsep\nnl\x0bvt\x0cff\rcr",
    "the the the the of of and and is is to to",
    "punct,,,;;;:::(((",
    "x" * 5000,
    "mixed the et der el is est ist es",
]


def test_fused_kernel_matches_column_form(spark, tmp_path):
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.text import (
        with_text_stats, with_text_stats_columns,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    edge = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)] + [(999, None)],
        "doc_id long, text string",
    )
    for df in (docs.select("doc_id", "text"), edge):
        a = {
            r["doc_id"]: r
            for r in with_text_stats(df, "text").collect()
        }
        b = {
            r["doc_id"]: r
            for r in with_text_stats_columns(df, "text").collect()
        }
        assert set(a) == set(b)
        for k in a:
            for c in ("n_words", "n_tokens_bpe", "n_punct",
                      "quality_milli", "pred_lang", "fingerprint"):
                assert a[k][c] == b[k][c], (k, c, a[k][c], b[k][c])
