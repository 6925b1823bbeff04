from cuckoofilter_spark.streaming.sketch_stream import (  # noqa: F401
    compact_dedup_state,
    run_streaming_decontam,
    run_streaming_dedup,
    run_streaming_dedup_sliding,
    run_streaming_ingest,
    run_streaming_sketch_build,
    streaming_distinct_by_key,
    streaming_session_sketch_by_key,
    streaming_sketch_by_key,
    streaming_windowed_sketch_by_key,
)
