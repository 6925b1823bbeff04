"""Filesystem helpers that go through the Hadoop FileSystem API.

Streaming state directories must work wherever the DATA directories
work — ``s3a://``, ``hdfs://``, ``file:`` — so state listing/IO cannot
use driver-local ``os.listdir``/``open`` (a distributed URI would
silently resolve to an empty local path and, e.g., make a restarted
dedup stream probe an empty filter and re-emit cross-batch
duplicates). These helpers resolve paths with the SAME Hadoop
configuration Spark's own writers use, so state and data always land
on the same filesystem.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(conf), jpath


def list_dir_names(spark: SparkSession, path: str) -> list[str]:
    """Names of the direct children of ``path`` ([] if absent)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` on its own filesystem (False if it
    did not exist)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, True))
