from cuckoofilter_spark.sources.ingest import read_table, read_tokens  # noqa: F401
from cuckoofilter_spark.sources.tokens import synth_tokens_df, write_tokens_table  # noqa: F401
from cuckoofilter_spark.sources.bucketed import (  # noqa: F401
    bucketed_join_ready, register_bucketed, write_bucketed,
)
