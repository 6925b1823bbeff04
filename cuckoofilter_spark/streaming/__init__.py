from cuckoofilter_spark.streaming.sketch_stream import (  # noqa: F401
    run_streaming_sketch_build, streaming_distinct_by_key,
)
