"""Spark DataFrame operator surface — one import for pipeline authors.

Sketch lifecycle (build → merge → probe → delete), dedup (exact /
MinHash-LSH / SimHash / exact n-gram prefix-filter / cluster
resolution), similarity search (brute, LSH, IVF), text analysis, and
multimodal plumbing.
"""

from cuckoofilter_spark.operators.build import build_sketch_shards  # noqa: F401
from cuckoofilter_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_near,
    duplicate_clusters,
    exact_duplicate_groups,
    near_dup_pairs_minhash,
    near_dup_pairs_ngram,
    near_dup_pairs_simhash,
)
from cuckoofilter_spark.operators.delete import delete_from_shards  # noqa: F401
from cuckoofilter_spark.operators.approx import (  # noqa: F401
    approx_distinct,
    approx_quantiles,
    heavy_hitters,
)
from cuckoofilter_spark.operators.grouped import grouped_sketch_agg  # noqa: F401
from cuckoofilter_spark.operators.merge import (  # noqa: F401
    merge_shards_to_blob,
    tree_merge,
)
from cuckoofilter_spark.operators.multimodal import (  # noqa: F401
    extract_features,
    resize_media,
    sample_frames,
)
from cuckoofilter_spark.operators.probe import might_contain_udf  # noqa: F401
from cuckoofilter_spark.operators.semijoin import filter_semi_join  # noqa: F401
from cuckoofilter_spark.operators.similarity import (  # noqa: F401
    cosine_near_dup_pairs_blocked,
    cosine_topk,
    ivf_topk,
    lsh_ann_topk,
)
