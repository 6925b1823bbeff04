"""Public Column-expression surface — one import for pipeline authors.

Everything here is a pure ``pyspark.sql.Column`` helper (JVM-side,
whole-stage codegen) re-exported from the operator modules, so a user
can write::

    from cuckoofilter_spark import functions as CF
    df.select(CF.token_count_ws("text"), CF.fingerprint_md5("text"))
"""

from cuckoofilter_spark.operators.sampling import (  # noqa: F401
    rate_threshold_hex,
    sample_hex_key,
)
from cuckoofilter_spark.operators.text import (  # noqa: F401
    BPE_ISH_RE,
    LANG_STOPWORDS,
    PUNCT_RE,
    bigrams_col,
    fingerprint_md5,
    fingerprint_rolling,
    fingerprint_rolling_sql,
    lang_id,
    lang_scores,
    normalize_text,
    pii_counts,
    punct_count,
    quality_score_milli,
    redact_pii,
    shingles_col,
    stopword_hits,
    token_count_bpe_ish,
    token_count_ws,
    words_col,
)

__all__ = [
    "BPE_ISH_RE", "LANG_STOPWORDS", "PUNCT_RE", "bigrams_col",
    "fingerprint_md5", "fingerprint_rolling", "fingerprint_rolling_sql",
    "lang_id", "lang_scores", "normalize_text", "punct_count",
    "pii_counts", "quality_score_milli", "rate_threshold_hex",
    "redact_pii", "sample_hex_key",
    "shingles_col", "stopword_hits", "token_count_bpe_ish",
    "token_count_ws", "words_col",
]
