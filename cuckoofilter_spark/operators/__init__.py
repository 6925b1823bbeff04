"""Spark DataFrame operator surface — one import for pipeline authors.

Sketch lifecycle (build → merge → probe → delete), dedup (exact /
MinHash-LSH / SimHash / exact n-gram prefix-filter / cluster
resolution / substring-level duplicated-span stats + span drop),
similarity search (brute, LSH, IVF), text analysis,
multimodal plumbing, and the corpus-shaping stage: deterministic
sampling / train-holdout splits, benchmark decontamination,
repetition quality stats, and token-bin packing.
"""

from cuckoofilter_spark.operators.build import build_sketch_shards  # noqa: F401
from cuckoofilter_spark.operators.dedup import (  # noqa: F401
    dedup_against_corpus,
    dedup_exact,
    dedup_near,
    duplicate_clusters,
    exact_duplicate_groups,
    near_dup_pairs_crosscorpus,
    near_dup_pairs_minhash,
    near_dup_pairs_ngram,
    near_dup_pairs_simhash,
    random_kernel_seed,
)
from cuckoofilter_spark.operators.delete import delete_from_shards  # noqa: F401
from cuckoofilter_spark.operators.approx import (  # noqa: F401
    approx_distinct,
    approx_overlap,
    approx_overlap_kmv,
    approx_quantiles,
    frequent_keys_filter,
    grouped_top_k_exact,
    heavy_hitters,
    heavy_hitters_mg,
    mg_sketch,
    overlap_matrix,
    top_k_exact,
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
from cuckoofilter_spark.operators.decontam import (  # noqa: F401
    decontaminate,
    eval_ngram_filter,
    novelty_report,
    overlap_report,
)
from cuckoofilter_spark.operators.packing import (  # noqa: F401
    pack_documents,
    pack_documents_firstfit,
    packing_stats,
)
from cuckoofilter_spark.operators.probe import (  # noqa: F401
    count_hits_udf,
    might_contain_udf,
    vocab_coverage,
)
from cuckoofilter_spark.operators.rollup import (  # noqa: F401
    rollup_sketch_table,
    sketch_time_table,
)
from cuckoofilter_spark.operators.spans import (  # noqa: F401
    drop_duplicated_spans,
    duplicated_span_stats,
    gram_table,
)
from cuckoofilter_spark.operators.sampling import (  # noqa: F401
    mixture_rates,
    resample_mixture,
    sample_bottom_k,
    sample_hash,
    sample_mixture,
    sample_stratified,
    sample_weighted,
    sample_weighted_bottom_k,
    split_leakage_safe,
    split_train_holdout,
)
from cuckoofilter_spark.operators.semijoin import (  # noqa: F401
    filter_anti_join,
    filter_semi_join,
)
from cuckoofilter_spark.operators.similarity import (  # noqa: F401
    cosine_near_dup_pairs_blocked,
    cosine_near_dup_pairs_celled,
    cosine_topk,
    dedup_semantic,
    dedup_semantic_ivf,
    ivf_topk,
    lsh_ann_topk,
)
