from cuckoofilter_spark.plans.checkpoint import (  # noqa: F401
    checkpointed_build, checkpointed_tree_merge, read_manifest,
    read_shards, write_shards,
)
