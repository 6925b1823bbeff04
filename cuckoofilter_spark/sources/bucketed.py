"""Bucketed-table layout — shuffle-free co-located joins at scale.

At 100 TB the exact-verify joins this library issues (semi-join
straggler removal, decontamination candidate verification, dedup
cluster resolution) are repeated against the same fact tables. Spark's
native bucketing pre-shuffles a table ONCE at write time: both sides
of an equi-join bucketed by the join key into the same bucket count
are already co-partitioned, so every subsequent join skips its
Exchange entirely — the amortization a pipeline that runs daily
against the same corpus wants (SURVEY.md §2.9 scans/sources row;
brief: "repartition()/bucketing for co-located joins").

Uses the session catalog's native parquet bucketing (no Hive
metastore, no derby files): ``saveAsTable`` with an explicit
``path`` creates an EXTERNAL table whose data lives where the caller
says; only the in-memory catalog entry is session-scoped, so
re-registering after a restart is one ``register_bucketed`` call.

Scale notes:
- pick ``num_buckets`` ≈ target parallelism of the downstream joins
  (buckets are the max join parallelism without AQE splitting);
- ``sort_col`` pre-sorts within buckets so the sort-merge join also
  skips its per-task Sort;
- bucket pruning: equality predicates on the bucket column read ONE
  bucket's files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, bucket_col: str, num_buckets: int, *,
    path: str, sort: bool = True, mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed external parquet table ``name`` at
    ``path``: hash-bucketed (and, by default, sorted) by
    ``bucket_col`` into ``num_buckets`` buckets.

    If ``name`` is already registered at a DIFFERENT external path,
    the stale catalog entry is dropped first — otherwise
    ``saveAsTable(mode='overwrite')`` would silently repoint the
    catalog and leave orphaned data files at the old location
    (round-5 advice). The old location's files are left for the
    caller (this function never deletes data it didn't write)."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    spark = df.sparkSession
    if mode == "overwrite" and spark.catalog.tableExists(name):
        import os

        loc = next(
            (r["data_type"] for r in
             spark.sql(f"DESCRIBE TABLE EXTENDED `{name}`").collect()
             if r["col_name"] == "Location"), None,
        )
        want = "file:" + os.path.abspath(path)
        if loc is not None and loc.rstrip("/") not in (
            want.rstrip("/"), os.path.abspath(path).rstrip("/"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    w = (
        df.write.format("parquet").mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)


def register_bucketed(
    spark: SparkSession, name: str, path: str, bucket_col: str,
    num_buckets: int, *, sort: bool = True,
) -> DataFrame:
    """(Re-)register an existing bucketed dataset written by
    ``write_bucketed`` under a fresh session catalog — the metadata is
    session-scoped, the data is not. Returns the table DataFrame."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    sorted_clause = f"SORTED BY (`{bucket_col}`) " if sort else ""
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    spark.sql(
        f"CREATE TABLE `{name}` ({cols}) USING parquet "
        f"CLUSTERED BY (`{bucket_col}`) {sorted_clause}"
        f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
    )
    return spark.table(name)


def bucketed_join_ready(spark: SparkSession, *names: str) -> bool:
    """True when native bucketing is on and every ``names`` table is
    registered — the preconditions for the co-located join plan."""
    if spark.conf.get("spark.sql.sources.bucketing.enabled") != "true":
        return False
    return all(spark.catalog.tableExists(n) for n in names)
