"""Checkpoint / resume for sketch builds — per-partition lineage.

A build over 10^5 input splits WILL see task retries and job restarts;
the unit of recovery here is the shard row. Layout under a checkpoint
root:

    <root>/shards/            parquet: the partial-build output
                              (shard_id, kind, sketch, metrics, lineage)
    <root>/merge/round=K/     parquet: output of merge round K
    <root>/MANIFEST.json      build params + seed + input inventory +
                              completed stages

Every stage writes data first, then its manifest entry — a manifest
that names a stage implies the stage's files are complete (write-
ahead-manifest, the same contract Iceberg snapshots give us when the
runtime jar is present). ``lineage`` on every shard row lists the
exact input files that fed it, so a resumed/audited build can prove
coverage: union(lineage) == manifest inputs.
"""

from __future__ import annotations

import functools
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from cuckoofilter_spark.operators.build import SHARD_SCHEMA

MANIFEST = "MANIFEST.json"


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


def read_manifest(root: str) -> dict | None:
    p = _manifest_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _write_manifest(root: str, manifest: dict) -> None:
    os.makedirs(root, exist_ok=True)
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(root))  # atomic publish


def write_shards(shards: DataFrame, root: str, params: dict,
                 inputs: list[str]) -> dict:
    """Materialize the partial-build output + manifest."""
    path = os.path.join(root, "shards")
    shards.write.mode("overwrite").parquet(path)
    manifest = {
        "params": params,
        "inputs": sorted(inputs),
        "stages": {"shards": {"path": path, "ts": time.time()}},
        "version": 1,
    }
    _write_manifest(root, manifest)
    return manifest


def read_shards(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.schema(SHARD_SCHEMA).parquet(os.path.join(root, "shards"))


def checkpointed_build(
    spark: SparkSession, root: str, df: DataFrame, column: str, *,
    params: dict, rebuild: bool = False, **build_kwargs,
) -> DataFrame:
    """Partial build with resume: if the manifest says the shard stage
    completed with the same params, read it back instead of rebuilding.
    Param mismatch raises — silently reusing shards built with a
    different seed/geometry would corrupt the merge."""
    from cuckoofilter_spark.operators.build import build_sketch_shards

    man = read_manifest(root)
    if man and not rebuild and "shards" in man.get("stages", {}):
        if man["params"] != params:
            raise ValueError(
                f"checkpoint at {root} was built with {man['params']}, "
                f"requested {params}; pass rebuild=True to discard"
            )
        return read_shards(spark, root)
    shards = build_sketch_shards(df, column, **params, **build_kwargs)
    inputs = list(df.inputFiles()) if df.inputFiles() else []
    write_shards(shards, root, params, inputs)
    return read_shards(spark, root)


def checkpointed_tree_merge(
    spark: SparkSession, root: str, fanout: int = 16, dedup: bool = True,
) -> bytes:
    """Tree merge with per-round checkpoints; resumes from the highest
    completed round after a crash."""
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.merge import _merge_group

    man = read_manifest(root)
    if man is None or "shards" not in man.get("stages", {}):
        raise FileNotFoundError(f"no completed shard stage under {root}")
    rounds = {
        int(k.split("=")[1]): v
        for k, v in man["stages"].items()
        if k.startswith("merge/round=")
    }
    if rounds:
        start = max(rounds) + 1
        df = spark.read.schema(SHARD_SCHEMA).parquet(rounds[max(rounds)]["path"])
    else:
        start = 0
        df = read_shards(spark, root)
    n = df.count()
    rnd = start
    while n > 1:
        is_final = (n + fanout - 1) // fanout == 1
        # exactly ONE positional arg — applyInPandas switches to
        # (key, pdf) calling convention for 2-arg callables
        merge_single = functools.partial(
            _merge_group, dedup=dedup, final=is_final
        )

        df = (
            df.withColumn("shard_id", (F.col("shard_id") / fanout).cast("int"))
            .groupBy("shard_id")
            .applyInPandas(merge_single, SHARD_SCHEMA)
        )
        path = os.path.join(root, "merge", f"round={rnd}")
        df.write.mode("overwrite").parquet(path)
        df = spark.read.schema(SHARD_SCHEMA).parquet(path)
        man["stages"][f"merge/round={rnd}"] = {"path": path, "ts": time.time()}
        _write_manifest(root, man)
        n = (n + fanout - 1) // fanout
        rnd += 1
        if rnd > start + 20:
            raise RuntimeError("merge failed to converge")
    row = df.collect()[0]
    return bytes(row["sketch"])
