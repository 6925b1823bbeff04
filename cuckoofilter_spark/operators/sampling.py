"""Deterministic sampling — the selection half of a training-data
pipeline.

No reference counterpart (the reference is a membership-sketch
library; its harness only *generates* keys, ``benchmarks/random.h``)
— these are the pipeline operators a 100 TB corpus job needs around
the sketches: carve out a train/eval split, thin a source to a target
rate, draw a fixed-size uniform audit sample.

Design rules, all three load-bearing at scale:

1. **Hash-deterministic, never ``rand()``.** Every decision is a pure
   function of ``(key, seed)``: re-running the job, retrying a task,
   or adding executors yields the SAME sample (Spark may recompute
   any partition at any time — nondeterministic sampling silently
   breaks exactly-once semantics downstream). It also makes the ops
   oracle-checkable in any engine with ``md5``.
2. **Narrow plans.** Bernoulli/stratified sampling is a pure filter —
   no shuffle, predicate evaluated at the scan. ``sample_bottom_k``
   is the one exception and deliberately compiles to
   TakeOrderedAndProject (per-partition top-k, then a k-row reduce —
   never a global sort).
3. **Portable hash.** The sampling key is the first 15 hex chars of
   ``md5(value || '#' || seed)`` compared AS A STRING against a
   threshold: lowercase-hex string order == numeric order, so the
   exact same predicate runs in Spark and in the DuckDB oracle with
   no integer conversions. 15 hex chars = 60 bits ⇒ rate granularity
   2^-60.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HEX_DIGITS = 15  # 60 bits: fits in a signed 64-bit int with headroom
_SPACE = 16**HEX_DIGITS


def sample_hex_key(col: str | Column, seed: int = 0) -> Column:
    """The 60-bit sampling key as a 15-char lowercase-hex string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(f"#{seed}"))), 1, HEX_DIGITS
    )


def rate_threshold_hex(rate: float) -> str:
    """Hex threshold t such that P[key < t] == round(rate * 2^60)/2^60.

    rate == 1.0 returns ``"g"`` (ASCII-after every hex char) so the
    ``key < t`` predicate keeps ALL rows, including the 2^-60 corner
    key ``fff…f``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    n = int(round(rate * _SPACE))
    if n >= _SPACE:
        return "g"
    return format(n, f"0{HEX_DIGITS}x")


def stratum_key(source_col: str, key_col: str) -> Column:
    """The stratum-qualified sampling key ``source|key`` — shared by
    every per-stratum sampler so two strata drawing the same key stay
    independent AND all strata samplers agree on the hash contract
    (change it here, nowhere else)."""
    return F.concat(
        F.col(source_col).cast("string"), F.lit("|"),
        F.col(key_col).cast("string"),
    )


def _key_num(col: str | Column, seed: int) -> Column:
    """The 60-bit md5 draw as a numeric column (for thresholds that
    are data-derived doubles rather than literal rates)."""
    return F.conv(sample_hex_key(col, seed), 16, 10).cast("long")


def _num_threshold(x: Column) -> Column:
    """floor(x · 2^60) as a long — the numeric-threshold half of the
    ``_key_num`` comparison. ``floor`` is written out because
    double→int casts TRUNCATE in Spark but ROUND in DuckDB; floor is
    identical in both."""
    return F.floor(x * F.lit(float(_SPACE))).cast("long")


def sample_hash(
    df: DataFrame, key_col: str, rate: float, *, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``.

    A pure filter (no shuffle); the same key always lands on the same
    side for a given seed, so per-key idempotence survives retries and
    incremental re-runs. NULL keys are dropped (a NULL has no stable
    identity to sample on)."""
    return df.filter(sample_hex_key(key_col, seed) < rate_threshold_hex(rate))


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_frac: float, *, seed: int = 0,
    flag_col: str = "is_holdout",
) -> DataFrame:
    """Label a hash-disjoint holdout split: ``flag_col`` is true for
    ~``holdout_frac`` of keys. The guarantee that matters is
    DISJOINTNESS under growth: a key's side depends only on
    (key, seed), so no example ever migrates between train and
    holdout as the corpus is extended — the leakage-safety property a
    random split cannot give."""
    return df.withColumn(
        flag_col,
        sample_hex_key(key_col, seed) < rate_threshold_hex(holdout_frac),
    )


def split_leakage_safe(
    df: DataFrame, text_col: str, holdout_frac: float, *, seed: int = 0,
    flag_col: str = "is_holdout",
) -> DataFrame:
    """``split_train_holdout`` keyed on the exact-dedup FINGERPRINT
    (md5 of normalized text) instead of the document id: byte-identical
    duplicate documents always land on the SAME side, so a holdout
    example can never leak into train through a copy that got a
    different id — the contamination mode an id-keyed split cannot
    prevent on a crawled corpus. Same hash-deterministic, shuffle-free
    filter discipline as the id split; extendable corpora keep sides
    stable because the side is a pure function of (content, seed)."""
    from cuckoofilter_spark.operators.text import fingerprint_md5

    return df.withColumn(
        flag_col,
        sample_hex_key(fingerprint_md5(text_col), seed)
        < rate_threshold_hex(holdout_frac),
    )


def sample_stratified(
    df: DataFrame, strata_col: str, rates: dict[str, float],
    key_col: str, *, seed: int = 0, default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates — the "source mixture" op: thin
    each corpus source to its training-mix weight in one pass.

    ``rates`` maps stratum value -> keep rate; strata not listed get
    ``default_rate``. The rates table is a broadcast dim (strata
    counts are small by definition). ``key_col`` is the ROW identity
    the per-row decision hashes (stratum-qualified, so two strata
    sampling the same key stay independent) — it is required
    precisely because hashing the stratum itself would keep or drop
    whole strata atomically."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, rate_threshold_hex(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, _thresh string",
    )
    key = stratum_key(strata_col, key_col)
    out = (
        df.join(F.broadcast(dim), strata_col, "left")
        .withColumn(
            "_thresh",
            F.coalesce(F.col("_thresh"), F.lit(rate_threshold_hex(default_rate))),
        )
        .filter(sample_hex_key(key, seed) < F.col("_thresh"))
        .drop("_thresh")
    )
    return out


def mixture_rates(
    df: DataFrame, source_col: str, *, size_col: str | None = None,
    temperature: float = 1.0, target_frac: float,
    max_sources: int = 100_000,
) -> DataFrame:
    """Temperature-based per-source sampling rates — the data-mix
    planner of a multilingual/multi-source pretraining pipeline
    (the p_s ∝ n_s^τ reweighting of XLM-R/mT5: τ < 1 upweights tail
    sources relative to their natural share).

    Per source s with exact size n_s (sum of ``size_col``, or row
    count): weight_s = n_s^τ / Σ_t n_t^τ; the token budget is
    B = target_frac · Σn, and the keep rate is
    rate_s = min(1, B · weight_s / n_s). rate_s == 1 means the budget
    wants MORE than one epoch of s (upsampling) — a Bernoulli filter
    cannot replicate rows, so the rate clamps; the unclamped demand is
    surfaced as the ``epochs`` column, which ``resample_mixture``
    honors by emitting copies.

    Cross-engine exactness (the same discipline as the md5 string
    threshold above): every order-dependent float sum is removed —
    sizes aggregate as exact BIGINTs, and the temperature-scaled
    RELATIVE size is QUANTIZED to an integer grid
    (floor((n_s/Σn)^τ · 2^40)) before the normalizing sum, so Σ is
    integer-exact regardless of partition order. Scaling the RATIO
    (≤ 1) rather than the absolute size keeps every quantized value
    ≤ 2^40 — the sum cannot overflow a signed 64-bit long below 2^23
    sources (an absolute-size grid would saturate at n_s > 2^43 ≈
    9·10^12 size units and silently corrupt every rate exactly at the
    100 TB scale this module is for). τ = 0.5 uses sqrt(), which IEEE
    754 requires to be correctly rounded (bit-identical in any
    engine), unlike pow(). The remaining per-source arithmetic is a
    fixed-shape chain of IEEE mult/div on identical operands —
    bit-identical everywhere.

    One tiny map-side-combined groupBy — the ONLY job this operator
    runs (it is eager: the per-source totals collect to the driver,
    sources are few by definition, and the rate arithmetic happens
    there in the exact IEEE chain above); the result is a small local
    DataFrame the samplers broadcast — the fact table is aggregated
    once and never shuffled.

    Degenerate strata: NULL-source rows are EXCLUDED before the
    totals (round-7 ADVICE fix) — a NULL source has no stable stratum
    identity and the samplers' inner join can never emit its rows, so
    counting its mass into Σn would dilute every rate and silently
    undershoot ``target_frac``'s budget. With the filter, the budget
    is target_frac × (non-NULL mass) and is actually delivered;
    ``shape_corpus`` still surfaces the dropped-NULL count. A source
    whose total size is 0 (all ``size_col`` values NULL/0) is likewise
    excluded — it holds no budgetable mass and would otherwise divide
    by zero.

    Cardinality guard (round-7): the per-source totals collect to the
    driver — correct because mixture sources are few BY DEFINITION
    (languages, domains-of-origin, dataset names). Passing a
    high-cardinality column (e.g. web domain at 10^8 values) would
    OOM the driver, so the collect is capped at ``max_sources``
    (default 10^5 ≈ tens of MB) and raises loudly above it — the
    guard is a ``limit(max_sources+1)`` on the aggregate itself, so
    it costs no extra scan and never ships more than the cap."""
    if not 0.0 < target_frac:
        raise ValueError(f"target_frac must be > 0, got {target_frac}")
    size = (
        F.col(size_col).cast("long") if size_col is not None else F.lit(1)
    )
    rows = (
        df.filter(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(size).alias("n_size"),
        )
        .filter(F.col("n_size") > 0)
        .limit(max_sources + 1)
        .collect()
    )
    if len(rows) > max_sources:
        raise ValueError(
            f"mixture_rates: > {max_sources} distinct non-empty values in "
            f"{source_col!r} — this column is not a mixture stratum (rates "
            "collect one row per source to the driver). Use a coarser "
            "source column, or raise max_sources deliberately."
        )
    # Driver-side rate arithmetic over the (tiny) per-source totals,
    # in plain python floats — IEEE doubles with the exact operand
    # values and operation order of the SQL oracle, so the results
    # are bit-identical to an engine running the same chain. Integer
    # sums stay python ints (arbitrary precision: exact at any scale).
    import math

    tot_size = sum(r["n_size"] for r in rows)
    tot_d = float(tot_size)
    powis = []
    for r in rows:
        ratio = float(r["n_size"]) / tot_d
        p = math.sqrt(ratio) if temperature == 0.5 else math.pow(
            ratio, float(temperature)
        )
        powis.append(int(math.floor(p * float(1 << 40))))
    tot_powi = sum(powis)
    out = []
    for r, powi in zip(rows, powis):
        weight = float(powi) / float(tot_powi)
        epochs = (
            float(target_frac) * tot_d * weight / float(r["n_size"])
        )
        out.append((
            r[source_col], int(r["n_rows"]), int(r["n_size"]),
            weight, epochs, min(1.0, epochs),
        ))
    schema = T.StructType([
        df.schema[source_col],
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_size", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("epochs", T.DoubleType(), False),
        T.StructField("rate", T.DoubleType(), False),
    ])
    return df.sparkSession.createDataFrame(out, schema)


def sample_mixture(
    df: DataFrame, source_col: str, key_col: str, *,
    size_col: str | None = None, temperature: float = 1.0,
    target_frac: float | None = None, seed: int = 0,
    rates: DataFrame | None = None,
) -> DataFrame:
    """Apply a temperature mixture: thin each source to its
    ``mixture_rates`` keep rate with the usual hash-deterministic
    Bernoulli filter. Pass a precomputed ``rates`` frame to reuse one
    plan across jobs (it must carry ``source_col`` and ``rate``).

    Plan shape at 100 TB: the rates dim is a tiny aggregate of the
    fact table (map-side combine, ~#sources rows), broadcast back —
    the fact side is scanned twice (once to weigh, once to filter)
    but never shuffled; the per-row decision is the same
    stratum-qualified 60-bit md5 filter as ``sample_stratified``.
    The kept set is a pure function of (source sizes, key, seed):
    retries, re-runs, and cluster resizes reproduce it exactly."""
    if rates is None:
        if target_frac is None:
            raise ValueError("pass target_frac (or a precomputed rates frame)")
        rates = mixture_rates(
            df, source_col, size_col=size_col,
            temperature=temperature, target_frac=target_frac,
        )
    dim = rates.select(
        source_col,
        _num_threshold(F.col("rate")).alias("_thresh_num"),
    )
    return (
        df.join(F.broadcast(dim), source_col, "inner")
        .filter(
            _key_num(stratum_key(source_col, key_col), seed)
            < F.col("_thresh_num")
        )
        .drop("_thresh_num")
    )


def resample_mixture(
    df: DataFrame, source_col: str, key_col: str, *,
    size_col: str | None = None, temperature: float = 1.0,
    target_frac: float | None = None, seed: int = 0,
    rates: DataFrame | None = None, copy_col: str = "copy",
) -> DataFrame:
    """The full mixture resampler: where ``sample_mixture`` clamps at
    one epoch, this one UPSAMPLES — every row of source s is emitted
    floor(epochs_s) times plus one more with probability
    frac(epochs_s), so the expected emitted size of s is exactly
    epochs_s · n_s = budget · weight_s. This is how a τ<1 mix actually
    feeds training: tail sources repeat (epochs > 1), head sources
    thin (epochs < 1 degenerates to the Bernoulli filter).
    ``copy_col`` (0-based repeat index) distinguishes the copies
    downstream (e.g. for per-epoch shuffling salts). Downstream ops
    that require a UNIQUE row id (``pack_documents``' order key, any
    keyed dedup) must use a composite — ``concat_ws('#', key, copy)``
    — since copies share the original key by design.

    Same determinism contract as every sampler here: the copy count
    is a pure function of (source sizes, key, seed) — the fractional
    copy reuses the stratum-qualified 60-bit md5 draw. Plan shape:
    broadcast dim join + JVM-side ``explode(sequence(...))`` fan-out —
    no shuffle, no Python; output size is the only thing that grows,
    and it grows by design (it IS the resampled corpus)."""
    if rates is None:
        if target_frac is None:
            raise ValueError("pass target_frac (or a precomputed rates frame)")
        rates = mixture_rates(
            df, source_col, size_col=size_col,
            temperature=temperature, target_frac=target_frac,
        )
    dim = rates.select(
        source_col,
        F.floor(F.col("epochs")).cast("long").alias("_full"),
        _num_threshold(
            F.col("epochs") - F.floor(F.col("epochs"))
        ).alias("_frac_thresh"),
    )
    key_num = _key_num(stratum_key(source_col, key_col), seed)
    n_copies = F.col("_full") + (key_num < F.col("_frac_thresh")).cast("long")
    # Spark's sequence() infers step -1 when start > stop, so a plain
    # sequence(0, n_copies - 1) at n_copies == 0 would emit [0, -1]
    # instead of nothing — guard with an empty array (explode drops it)
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0).cast("long"), n_copies - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.join(F.broadcast(dim), source_col, "inner")
        .withColumn(copy_col, F.explode(copies))
        .drop("_full", "_frac_thresh")
    )


def sample_bottom_k(
    df: DataFrame, key_col: str, k: int, *, seed: int = 0
) -> DataFrame:
    """Fixed-size uniform sample without replacement: the k smallest
    md5 keys. Distribution-identical to reservoir sampling (any
    injective uniform priority order gives a uniform k-subset) but
    deterministic and embarrassingly parallel: Spark compiles the
    sort+limit to TakeOrderedAndProject — each task keeps a local
    k-heap and only k rows per partition reach the driver-side
    reduce; there is NO global sort and NO full shuffle. Ties (60-bit
    collisions) break on the key itself for cross-engine determinism."""
    pri = sample_hex_key(key_col, seed)
    return (
        df.withColumn("_pri", pri)
        .orderBy(F.col("_pri"), F.col(key_col))
        .limit(k)
        .drop("_pri")
    )


def sample_weighted(
    df: DataFrame, key_col: str, weight_col: str | Column, *,
    seed: int = 0,
) -> DataFrame:
    """Per-row Bernoulli keep with probability ``weight`` (clamped to
    [0,1]) — quality-weighted corpus thinning: keep probability
    proportional to a quality/importance score, still deterministic
    per (key, seed) and still a pure narrow filter.

    Exactness note for the cross-engine oracle: the 60-bit integer
    key is compared against ``floor(weight * 2^60)`` — ``floor`` is
    written out explicitly because double→int casts TRUNCATE in Spark
    but ROUND in DuckDB; floor is identical in both."""
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    thresh = _num_threshold(
        F.least(F.greatest(wc.cast("double"), F.lit(0.0)), F.lit(1.0))
    )
    return df.filter(_key_num(key_col, seed) < thresh)


def sample_weighted_bottom_k(
    df: DataFrame, key_col: str, weight_col: str | Column, k: int, *,
    seed: int = 0,
) -> DataFrame:
    """Fixed-size WEIGHTED sample without replacement (Efraimidis &
    Spirakis 2006): priority = -ln(u)/w with u the key's uniform md5
    draw; the k smallest priorities are a weighted-uniform k-subset.
    The quality-weighted audit sample: heavier documents more likely
    in, still deterministic per (key, seed) and still
    TakeOrderedAndProject (per-partition heaps, no global sort).

    Rows with weight <= 0 or NULL are never sampled. NOT in the
    SQL-oracle contract: the priority involves ln() and float
    division, whose last-ulp behavior is not guaranteed identical
    across engines — near-ties could order differently, so this op is
    pytest-verified (distribution + determinism) rather than
    hash-matched."""
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (F.conv(sample_hex_key(key_col, seed), 16, 10).cast("double")
         + F.lit(1.0)) / F.lit(float(_SPACE))  # u in (0, 1]
    pri = -F.log(u) / wc.cast("double")
    return (
        df.filter(wc.isNotNull() & (wc > 0))
        .withColumn("_pri", pri)
        .orderBy(F.col("_pri"), F.col(key_col))
        .limit(k)
        .drop("_pri")
    )
