"""Text-analysis operators for training-data pipelines.

Every function here returns Column expressions built from
``pyspark.sql.functions`` (whole-stage codegen, no Python in the hot
path): token counting, quality scoring, language-ID heuristic,
document fingerprinting. These are the per-document scalar features a
100 TB corpus pipeline computes in the same scan that feeds the
sketch builds — one pass, no shuffle. The single exception is
``fingerprint_rolling`` — an Arrow-batched pandas UDF, because a
per-character Horner fold as a higher-order Column expression is
CodegenFallback (interpreted) and measured slower.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


ROLL_BASE = 31
ROLL_MOD = 1_000_000_007  # < 2^30 so every Horner term fits int64


def fingerprint_rolling(text: str | Column) -> Column:
    """Polynomial rolling-hash document fingerprint (Rabin-Karp form):
    ``h = fold(h*31 + codepoint) mod 1e9+7`` over the text.

    Arrow-batched pandas UDF computing the Horner sum vectorized per
    document (terms reduced mod p before summing — each term < 2^51,
    per-term mod keeps the accumulator < 2^45). Bit-for-bit equal to
    the ANSI-SQL ``list_reduce`` fold (the DuckDB oracle computes the
    SAME fingerprint), unlike md5 this is incrementally updatable —
    append a chunk by multiplying by 31^len(chunk).
    """
    c = F.col(text) if isinstance(text, str) else text

    @F.pandas_udf(LongType())
    def roll(s: pd.Series) -> pd.Series:
        # powers of the base mod p, up to the longest doc in the batch
        max_len = int(s.fillna("").str.len().max() or 0)
        pows_list = [1]
        for _ in range(max(0, max_len - 1)):
            pows_list.append((pows_list[-1] * ROLL_BASE) % ROLL_MOD)
        pows = np.array(pows_list, dtype=np.int64)
        out = np.zeros(len(s), dtype=np.int64)
        for i, txt in enumerate(s):
            if not txt:
                continue
            codes = np.fromiter(
                map(ord, txt), dtype=np.int64, count=len(txt)
            )
            terms = (codes * pows[len(txt) - 1::-1]) % ROLL_MOD
            out[i] = int(terms.sum() % ROLL_MOD)
        return pd.Series(out)

    return roll(c)


def fingerprint_rolling_sql(text: str | Column) -> Column:
    """The same rolling fingerprint as a pure Column expression
    (``aggregate`` higher-order fold) — CodegenFallback, so it is the
    PARITY/reference form, not the hot path; tests assert it equals
    the vectorized UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * ROLL_BASE + F.ascii(ch)) % ROLL_MOD,
    )


def _sliding_join(w: Column, k: int) -> Column:
    """All word k-grams (duplicates kept) via ``zip_with`` over shifted
    slices. Each slice/zip argument is evaluated ONCE PER ROW; the
    lambdas touch only their own lambda variables. The obvious
    ``transform(sequence(...), i -> get(w, i+j))`` form instead
    re-evaluates the full tokenization expression per ELEMENT access
    inside the interpreted higher-order lambda — O(words²) per
    document (measured 25× slower on the sf0.1 corpus)."""
    n = F.size(w)
    cur = w
    for j in range(1, k):
        # zip_with pads the shorter side with null; concat(x, null) is
        # null, so the k-1 tail slots drop in the final filter
        cur = F.zip_with(
            cur, F.slice(w, j + 1, F.greatest(n - j, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.filter(cur, lambda s: s.isNotNull())


def shingles_col(text: str | Column, k: int = 3) -> Column:
    """Distinct word k-shingles as an array<string> (JVM-side)."""
    w = words_col(text)
    return F.when(F.size(w) >= k, F.array_distinct(_sliding_join(w, k))) \
        .otherwise(F.array().cast("array<string>"))


def with_text_stats_columns(df: DataFrame, text: str = "text") -> DataFrame:
    """The full feature set as pure Column expressions — the
    REFERENCE form (and the shape the DuckDB oracles mirror). Each
    feature re-evaluates ``words_col`` inside interpreted higher-order
    lambdas, so the hot path is ``with_text_stats`` (fused Arrow
    kernel, bit-identical output — asserted in tests)."""
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


# Java-\s equivalents, compiled once per worker. Java regex \s (and
# Spark trim/normalize semantics) are ASCII-only: [ \t\n\x0b\f\r];
# Python's \s is Unicode, so every class below spells the six bytes
# out. Alternation order in _BPE_RE matches the JVM pattern —
# leftmost-first semantics agree between engines.
_PY_WS = " \t\n\x0b\f\r"
_PY_WS_RE = None
_PY_BPE_RE = None
_PY_PUNCT_RE = None


def _text_stats_row(t, stop_sets):
    """One document's (n_words, n_tokens_bpe, n_punct, quality_milli,
    pred_lang, fingerprint) — semantics bit-identical to
    ``with_text_stats_columns`` (see the round-8 parity test):

    - words: ``trim`` strips SPACES only (Spark ``trim``), split on
      Java ``\\s+``;
    - rounding: Spark ``round(double)`` is BigDecimal-HALF_UP over the
      double's shortest decimal repr — reproduced with ``decimal`` on
      ``repr(x)``;
    - length: both engines count codepoints; md5 of the
      lower+ws-collapsed text matches ``fingerprint_md5``."""
    import hashlib
    import re as _re
    from decimal import ROUND_HALF_UP, Decimal

    global _PY_WS_RE, _PY_BPE_RE, _PY_PUNCT_RE
    if _PY_WS_RE is None:
        _PY_WS_RE = _re.compile(f"[{_PY_WS}]+")
        _PY_BPE_RE = _re.compile(f"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9{_PY_WS}]")
        _PY_PUNCT_RE = _re.compile(f"[^a-zA-Z0-9{_PY_WS}]")

    def _round_half_up(x: float) -> int:
        return int(Decimal(repr(x)).quantize(0, ROUND_HALF_UP))

    words = [w for w in _PY_WS_RE.split(t.strip(" ")) if w]
    n_words = len(words)
    n_bpe = len(_PY_BPE_RE.findall(t))
    n_punct = len(_PY_PUNCT_RE.findall(t))
    wset = {}
    for w in words:
        wset[w] = wset.get(w, 0) + 1
    hits = {
        lang: sum(wset.get(s, 0) for s in sw)
        for lang, sw in stop_sets.items()
    }
    len_score = min(400, n_words * 4)
    sw_score = min(300, _round_half_up(hits["en"] / max(n_words, 1) * 3000))
    punct_pen = min(300, _round_half_up(n_punct / max(len(t), 1) * 3000))
    quality = len_score + sw_score - punct_pen + 300
    best_lang, best = "und", 0
    for lang in sorted(hits):
        if hits[lang] > best:
            best_lang, best = lang, hits[lang]
    norm = _PY_WS_RE.sub(" ", t.strip(" ").lower())
    fp = hashlib.md5(norm.encode("utf-8")).hexdigest()
    return n_words, n_bpe, n_punct, quality, best_lang, fp


def with_text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach the full feature set in one projection.

    Round 8 (guide §4.2): ONE Arrow-batched kernel computes all six
    features per document — the Column form re-evaluates the
    interpreted (CodegenFallback) ``words_col``/``filter`` lambdas
    once per feature per row and, on the single-row-group side
    tables, on one core. Output is bit-identical to
    ``with_text_stats_columns`` (parity test + the DuckDB oracle of
    ``text_stats_by_source``). fan_out: see the module helpers."""
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    from cuckoofilter_spark.session import fan_out

    stop_sets = {k: tuple(v) for k, v in LANG_STOPWORDS.items()}
    out_type = StructType([
        StructField("n_words", IntegerType()),
        StructField("n_tokens_bpe", IntegerType()),
        StructField("n_punct", IntegerType()),
        StructField("quality_milli", IntegerType()),
        StructField("pred_lang", StringType()),
        StructField("fingerprint", StringType()),
    ])

    @F.pandas_udf(out_type)
    def stats(s: pd.Series) -> pd.DataFrame:
        rows = []
        for t in s:
            if t is None:
                # JVM null semantics: size/regex features null;
                # quality_milli = 700 because LEAST/GREATEST skip
                # nulls (least(400, null)=400, least(300, null)=300
                # twice, +300); pred_lang falls through every WHEN to
                # 'und'; fingerprint null
                rows.append((None, None, None, 700, "und", None))
            else:
                rows.append(_text_stats_row(t, stop_sets))
        out = pd.DataFrame(
            rows,
            columns=["n_words", "n_tokens_bpe", "n_punct",
                     "quality_milli", "pred_lang", "fingerprint"],
        )
        for c in ("n_words", "n_tokens_bpe", "n_punct", "quality_milli"):
            out[c] = out[c].astype("Int32")
        return out

    df = fan_out(df)
    st = F.col("__ts")
    return (
        df.withColumn("__ts", stats(F.col(text)))
        .withColumns({
            "n_words": st["n_words"],
            "n_tokens_bpe": st["n_tokens_bpe"],
            "n_punct": st["n_punct"],
            "quality_milli": st["quality_milli"],
            "pred_lang": st["pred_lang"],
            "fingerprint": st["fingerprint"],
        })
        .drop("__ts")
    )


# ------------------------------------------------ repetition (Gopher-style)
# Quality-filter signals from the published Gopher/MassiveText rules
# (Rae et al. 2021, §A1.1): excessive word repetition marks boilerplate
# and spam. Fractions are fixed-point *10^4 ints so downstream
# comparisons (and the DuckDB oracle hash) never touch float identity.


def bigrams_col(text: str | Column) -> Column:
    """Word bigrams as array<string>, duplicates KEPT (repetition is
    the signal being measured). Same once-per-row slice/zip shape as
    ``_sliding_join`` — see its docstring for why not
    transform+get."""
    w = words_col(text)
    return F.when(F.size(w) >= 2, _sliding_join(w, 2)).otherwise(
        F.array().cast("array<string>")
    )


def top_word_count_udf():
    """Count of the most frequent word — the one repetition stat with
    no shuffle-free Column form (a per-element mode). The higher-order
    Column encoding is O(distinct · n) CodegenFallback per doc; this
    per-doc Counter is O(n) and stays a narrow pass (same measured
    justification as the MinHash UDF, operators/dedup.py)."""
    import pandas as pd
    from collections import Counter
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def top_count(s: pd.Series) -> pd.Series:
        return pd.Series([
            (Counter(a).most_common(1)[0][1] if a is not None and len(a)
             else 0)
            for a in s
        ], dtype="int64")

    return top_count


def _frac_e4(num: Column, den: Column) -> Column:
    return F.round(num * 10000 / F.greatest(den, F.lit(1))).cast("long")


def with_repetition_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach Gopher-style repetition features, one narrow projection:

    - ``dup_word_frac_e4``  — fraction of word occurrences that repeat
      an earlier occurrence (1 - distinct/total);
    - ``top_word_frac_e4``  — most-frequent-word share of all words;
    - ``dup_bigram_frac_e4`` — repeated-bigram occurrence fraction.

    All inputs computed JVM-side except the per-doc mode count (see
    ``top_word_count_udf``). Empty documents score 0 everywhere.
    fan_out: see ``with_text_stats``."""
    from cuckoofilter_spark.session import fan_out

    df = fan_out(df)
    w = words_col(text)
    bi = bigrams_col(text)
    top = top_word_count_udf()
    return df.withColumns(
        {
            "n_words": F.size(w),
            "dup_word_frac_e4": _frac_e4(
                F.size(w) - F.size(F.array_distinct(w)), F.size(w)
            ),
            "top_word_frac_e4": _frac_e4(top(w), F.size(w)),
            "dup_bigram_frac_e4": _frac_e4(
                F.size(bi) - F.size(F.array_distinct(bi)), F.size(bi)
            ),
        }
    )


# ------------------------------------------------------------ PII scrub
# C4/MassiveText-style pre-training hygiene: detect and redact
# personally-identifying strings before anything else sees the text.
# Patterns are deliberately restricted to the regex subset with
# identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
# character classes, bounded repetition, \b — no backrefs, no
# lookaround.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_ID_RE = r"\b\d{9,}\b"  # SSN/account-shaped digit runs
# International (+CC ...) and North-American ((xxx) / xxx-xxx-xxxx)
# phone shapes. Heuristic by design: a scrubber prefers recall.
PHONE_RE = (
    r"\+\d{1,3}[ .-]?\d{2,4}[ .-]?\d{3,4}[ .-]?\d{2,4}\b"
    r"|\(\d{3}\)[ .-]?\d{3}[ .-]?\d{4}\b"
    r"|\b\d{3}[.-]\d{3}[.-]\d{4}\b"
)
# Dotted-quad IPv4. Deliberately no 0-255 octet range check (that
# needs alternations whose leftmost-first behavior is harder to keep
# identical across engines); version strings like 10.2.3.4 match —
# acceptable for hygiene scrubbing, where recall beats precision.
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# IBAN: country code + 2 check digits + 11-30 alphanumerics (shortest
# real IBAN is 15 chars). Redacted BEFORE the long-digit pass so its
# digit tail can't be half-eaten by <ID>.
IBAN_RE = r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b"

# (name, pattern, redaction token) in REDACTION ORDER. Order is part
# of the contract: emails first (their local parts may contain digit
# runs), then the structured formats, the bare long-digit catch-all
# last so it only sees digits no earlier class claimed. Counts are
# computed per-class on the ORIGINAL text, so a +CC phone whose digit
# run also matches LONG_ID counts under both classes — redaction
# resolves the overlap by order, counting does not hide it.
PII_CLASSES = (
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ibans", IBAN_RE, "<IBAN>"),
    ("ips", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
    ("long_ids", LONG_ID_RE, "<ID>"),
)


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-document PII match counts, one column per class
    (``n_emails``, ``n_ibans``, ``n_ips``, ``n_phones``,
    ``n_long_ids``), each evaluated on the original text."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat, _ in PII_CLASSES
    }


def redact_pii(text: str | Column) -> Column:
    """Replace every PII match with its class placeholder token, in
    ``PII_CLASSES`` order. Pure Column expression (JVM regex,
    whole-stage codegen) — the redaction pass is a narrow projection
    at any corpus size."""
    out = F.col(text) if isinstance(text, str) else text
    for _, pat, token in PII_CLASSES:
        out = F.regexp_replace(out, pat, token)
    return out


def with_pii_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach PII counts + the redacted text in one projection.
    fan_out: see ``with_text_stats``."""
    from cuckoofilter_spark.session import fan_out

    df = fan_out(df)
    cols = dict(pii_counts(text))
    cols["redacted_text"] = redact_pii(text)
    return df.withColumns(cols)


# ------------------------------------------------ Gopher quality rules
# Rule-based document filter from the published Gopher/MassiveText
# recipe (Rae et al. 2021, appendix A1.1) — the standard first-pass
# web-corpus gate (also the shape FineWeb/Dolma use). Every rule is a
# pure-integer comparison (ratios cross-multiplied, never divided) so
# the Spark plan and the DuckDB oracle agree bit-for-bit, and every
# rule is a JVM Column expression — at 100 TB this is one narrow
# projection in the same scan that computes the other text features.

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

GOPHER_RULES = (
    "r_words", "r_mean_wl", "r_symbol", "r_bullet", "r_ellipsis",
    "r_alpha", "r_stop",
)


def _nonoverlap_count(c: Column, literal: str, width: int) -> Column:
    """Occurrences of a fixed substring (non-overlapping, leftmost —
    both engines' replace semantics)."""
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(literal), F.lit(""))))
        / width
    ).cast("long")


def gopher_flags(
    text: str | Column, *, stopwords: list[str] | None = None
) -> dict[str, Column]:
    """The seven deterministic Gopher rules as boolean Columns.

    * ``r_words``    — 50 ≤ word count ≤ 100 000
    * ``r_mean_wl``  — mean word length in [3, 10] chars
                       (3·n_words ≤ non-ws chars ≤ 10·n_words)
    * ``r_symbol``   — (#-count + '...'-count) / words ≤ 0.1
                       (DEVIATION from Rae et al. A1.1, which applies
                       0.1 to each symbol separately; the combined
                       form is slightly stricter — kept as the
                       oracle-matched contract since round 7)
    * ``r_bullet``   — ≤ 90% of non-blank lines start with a bullet
    * ``r_ellipsis`` — ≤ 30% of non-blank lines end with '...'
    * ``r_alpha``    — ≥ 80% of words contain an alphabetic char
    * ``r_stop``     — ≥ 2 of the ``stopwords`` present (default: the
      paper's 8-word English list; pass a corpus-appropriate list for
      other domains — the published rule is language-specific)

    Blank lines are excluded from the line rules on both engines
    (Spark ``split`` keeps trailing empties, DuckDB ``string_split``
    likewise — filtering empties makes the two identical AND is the
    intended semantics: blank lines aren't content)."""
    if stopwords is None:
        stopwords = GOPHER_STOPWORDS
    c = F.col(text) if isinstance(text, str) else text
    words = words_col(c)
    n_words = F.size(words).cast("long")
    nonws = F.length(F.regexp_replace(c, r"\s+", "")).cast("long")
    lines = F.filter(F.split(c, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[-*] "))
    ).cast("long")
    n_ell_lines = F.size(
        F.filter(lines, lambda l: F.endswith(F.rtrim(l), F.lit("...")))
    ).cast("long")
    n_hash = _nonoverlap_count(c, "#", 1)
    n_ell = _nonoverlap_count(c, "...", 3)
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    ).cast("long")
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stopwords]),
            lambda s: F.array_contains(words, s),
        )
    ).cast("long")
    return {
        "r_words": (n_words >= 50) & (n_words <= 100_000),
        "r_mean_wl": (3 * n_words <= nonws) & (nonws <= 10 * n_words),
        "r_symbol": 10 * (n_hash + n_ell) <= n_words,
        "r_bullet": 10 * n_bullet <= 9 * n_lines,
        "r_ellipsis": 10 * n_ell_lines <= 3 * n_lines,
        "r_alpha": 10 * n_alpha >= 8 * n_words,
        "r_stop": n_stop >= 2,
    }


def with_gopher_flags(
    df: DataFrame, text: str = "text", *,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Attach the seven rule booleans plus ``gopher_keep`` (AND of
    all) in one projection."""
    flags = gopher_flags(text, stopwords=stopwords)
    keep = F.lit(True)
    for r in GOPHER_RULES:
        keep = keep & flags[r]
    flags["gopher_keep"] = keep
    return df.withColumns(flags)


def gopher_filter(
    df: DataFrame, text: str = "text", *,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Rows passing all seven rules (flag columns not retained)."""
    return with_gopher_flags(df, text, stopwords=stopwords).filter(
        "gopher_keep"
    ).drop(
        *GOPHER_RULES, "gopher_keep"
    )


def gopher_stats(
    df: DataFrame, text: str = "text", by: str = "source", *,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-``by`` acceptance report: docs, kept, and per-rule fail
    counts — the corpus-curation dashboard row. One scan, one
    tiny-result aggregation (#groups = #sources)."""
    from cuckoofilter_spark.session import fan_out

    # fan_out (round 8): the seven rules are interpreted higher-order
    # filters; a single-row-group scan runs them on one core
    flagged = with_gopher_flags(fan_out(df), text, stopwords=stopwords)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("gopher_keep").cast("long")).alias("n_kept"),
    ] + [
        F.sum((~F.col(r)).cast("long")).alias(f"fail_{r[2:]}")
        for r in GOPHER_RULES
    ]
    return flagged.groupBy(by).agg(*aggs).orderBy(by)
