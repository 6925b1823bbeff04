"""Text-analysis operators for training-data pipelines — JVM-side only.

Every function here returns Column expressions built from
``pyspark.sql.functions`` (whole-stage codegen, no Python in the hot
path): token counting, quality scoring, language-ID heuristic,
document fingerprinting. These are the per-document scalar features a
100 TB corpus pipeline computes in the same scan that feeds the
sketch builds — one pass, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword families for the n-gram/stopword LID
# heuristic. Deliberately small and ASCII so Spark and any SQL oracle
# tokenize identically.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "is", "to"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "los", "las", "y", "es", "una"],
}

PUNCT_RE = r"[^a-zA-Z0-9\s]"
BPE_ISH_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def words_col(text: str | Column) -> Column:
    """Whitespace tokenization (empty strings filtered)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")


def token_count_ws(text: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text))


def token_count_bpe_ish(text: str | Column) -> Column:
    """BPE-ish token count: alpha runs + single digits + punctuation —
    a cheap upper-bound proxy for byte-pair-encoded token counts."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def punct_count(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0))


def stopword_hits(text: str | Column, lang: str = "en") -> Column:
    """Number of word occurrences that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(words_col(text), lambda w: F.array_contains(sw, w)))


def quality_score_milli(text: str | Column) -> Column:
    """Deterministic 0..1000 quality score (integer — hash-stable):
    rewards reasonable length and stopword presence, penalizes
    punctuation soup. A toy of the Gopher/C4-style quality rules, but
    the real shape: pure column arithmetic, one scan, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    n_words = token_count_ws(c)
    len_score = F.least(F.lit(400), n_words * 4)  # saturates at 100 words
    sw_ratio = stopword_hits(c, "en") / F.greatest(n_words, F.lit(1))
    sw_score = F.least(F.lit(300), F.round(sw_ratio * 3000).cast("int"))
    punct_ratio = punct_count(c) / F.greatest(F.length(c), F.lit(1))
    punct_pen = F.least(F.lit(300), F.round(punct_ratio * 3000).cast("int"))
    return (len_score + sw_score - punct_pen + F.lit(300)).cast("int")


def lang_scores(text: str | Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, lang) for lang in LANG_STOPWORDS}


def lang_id(text: str | Column) -> Column:
    """Argmax of per-language stopword hits; ties break alphabetically;
    all-zero scores → 'und' (undetermined)."""
    scores = lang_scores(text)
    # alphabetical processing + strict > ⇒ alphabetically-first wins
    # ties (replicable as an ordered CASE WHEN s_x >= greatest(...) in SQL)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def normalize_text(text: str | Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint_md5(text: str | Column) -> Column:
    """Exact-dedup fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def shingles_col(text: str | Column, k: int = 3) -> Column:
    """Distinct word k-shingles as an array<string> (JVM-side)."""
    w = words_col(text)
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    # F.get is 0-based and null-safe (no ANSI out-of-bounds error)
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.get(w, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def with_text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach the full feature set in one projection."""
    return df.withColumns(
        {
            "n_words": token_count_ws(text),
            "n_tokens_bpe": token_count_bpe_ish(text),
            "n_punct": punct_count(text),
            "quality_milli": quality_score_milli(text),
            "pred_lang": lang_id(text),
            "fingerprint": fingerprint_md5(text),
        }
    )
