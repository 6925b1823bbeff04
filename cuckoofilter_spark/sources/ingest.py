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
    """Load the tokens table: Iceberg table name/path, else Parquet dir.

    Iceberg runtime requirement (pinned; no jar ships in this sandbox,
    so only the Parquet fallback is exercised here): Spark 4.x needs
    ``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13`` (>= 1.10.0,
    the first line with Spark 4 support; use the 3.5_2.12 artifact for
    Spark 3.5) on the driver/executor classpath — e.g.
    ``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0``
    plus a catalog config such as
    ``spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog``.
    With the jar present ``format("iceberg")`` resolves and this
    function returns the Iceberg scan (snapshot isolation + partition
    pruning); without it the DataSource lookup throws and the Parquet
    branch serves the identical schema."""
    try:
        return spark.read.format("iceberg").load(location)
    except Exception:
        return spark.read.parquet(location)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One of the driver-generated testdata tables (TESTDATA.md)."""
    if name not in TPCH_TABLES:
        raise KeyError(f"unknown table {name!r}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
