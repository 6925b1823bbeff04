"""Table ingest: Iceberg first, Parquet fallback; TPC-H-ish testdata.

The production target is an Iceberg table of pre-tokenized training
sequences (``BASELINE.json`` ``input_hint``). This sandbox has no
Iceberg runtime jar, so ``read_tokens`` attempts the Iceberg format
and falls back to a Parquet directory with the identical schema —
the path exercised by tests (SURVEY.md §7). Either way the scan is a
columnar DataFrame source: predicate pushdown, column pruning, and
partition pruning all apply before a single byte crosses into Python.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def read_tokens(spark: SparkSession, location: str) -> DataFrame:
    """Load the tokens table: Iceberg table name/path, else Parquet dir."""
    try:
        return spark.read.format("iceberg").load(location)
    except Exception:
        return spark.read.parquet(location)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One of the driver-generated testdata tables (TESTDATA.md)."""
    if name not in TPCH_TABLES:
        raise KeyError(f"unknown table {name!r}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
