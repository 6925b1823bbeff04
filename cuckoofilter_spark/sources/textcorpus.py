"""JSONL corpus ingestion — the interchange format LLM training data
actually arrives in.

Web-scale corpora (Common-Crawl derivatives, dataset dumps) ship as
(gzipped) JSON-Lines, one document object per line, with dirty lines
guaranteed at volume. This source reads them with an ENFORCED schema
(never schema inference — at 100 TB an inference pass is a full extra
scan, and a drifting field type silently corrupts every downstream
operator) and accounts for corruption explicitly instead of dropping
it silently.

Spark-native all the way down: the JSON reader is a columnar
DataSource (column pruning applies; gzip/zstd transparent via the
file codec), and corrupt rows ride Spark's PERMISSIVE mode into a
``_corrupt_record`` column rather than killing the job — the caller
decides whether 0.001% bad lines is a shrug or an upstream incident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# the de-facto minimal LLM-corpus document shape
DOCUMENT_FIELDS = [
    ("doc_id", "string"),
    ("text", "string"),
    ("lang", "string"),
    ("source", "string"),
]
_CORRUPT = "_corrupt_record"


def document_schema(extra_fields: dict[str, str] | None = None) -> StructType:
    """The enforced JSONL document schema + the corrupt-record sink
    column (PERMISSIVE mode requires it declared up front)."""
    fields = [
        StructField(n, StructType().fromDDL(f"x {t}")["x"].dataType, True)
        for n, t in DOCUMENT_FIELDS
    ]
    for n, t in (extra_fields or {}).items():
        fields.append(
            StructField(n, StructType().fromDDL(f"x {t}")["x"].dataType, True)
        )
    fields.append(StructField(_CORRUPT, StringType(), True))
    return StructType(fields)


def read_jsonl_corpus(
    spark: SparkSession, path: str, *,
    extra_fields: dict[str, str] | None = None,
    max_corrupt_frac: float | None = None,
) -> DataFrame:
    """Read a JSONL document corpus with enforced schema.

    Returns clean rows only (``_corrupt_record`` dropped). If
    ``max_corrupt_frac`` is given, first counts corrupt lines and
    raises when the corpus exceeds it — the explicit quality gate for
    pipelines that must not shrug off a broken upstream export. With
    it None the read stays single-pass (no counting action).

    Spark restriction to know: a bare ``count()`` on this frame fails
    with UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    column pruning would leave only the corrupt-record filter, which
    the JSON scan cannot answer without parsing. Any query touching a
    real column works; for pure counts use ``corpus_ingest_stats``
    (its aggregate references ``text``, so it parses)."""
    raw = (
        spark.read.schema(document_schema(extra_fields))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    if max_corrupt_frac is not None:
        stats = corpus_ingest_stats(raw)
        if stats["n_rows"] and (
            stats["n_corrupt"] > max_corrupt_frac * stats["n_rows"]
        ):
            raise ValueError(
                f"{stats['n_corrupt']}/{stats['n_rows']} corrupt JSONL "
                f"lines exceeds max_corrupt_frac={max_corrupt_frac} "
                f"at {path}"
            )
    return raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)


def corpus_ingest_stats(raw: DataFrame) -> dict:
    """One-aggregation ingest report over a PERMISSIVE read (pass the
    UNfiltered frame): total/corrupt/null-text row counts."""
    row = raw.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(_CORRUPT).isNotNull().cast("long")).alias("n_corrupt"),
        F.sum(
            (F.col(_CORRUPT).isNull() & F.col("text").isNull()).cast("long")
        ).alias("n_null_text"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in
            ("n_rows", "n_corrupt", "n_null_text")}


def write_jsonl_corpus(df: DataFrame, path: str, *,
                       compression: str = "gzip") -> None:
    """Write documents back out as (compressed) JSONL — the format the
    next pipeline in line expects."""
    df.write.mode("overwrite").option("compression", compression).json(path)
