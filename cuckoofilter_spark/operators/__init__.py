from cuckoofilter_spark.operators.build import build_sketch_shards  # noqa: F401
from cuckoofilter_spark.operators.merge import merge_shards_to_blob, tree_merge  # noqa: F401
from cuckoofilter_spark.operators.probe import might_contain_udf  # noqa: F401
