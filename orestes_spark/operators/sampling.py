"""Deterministic sampling / data-mixing operators for training-data
pipelines.

Sampling at 100 TB must be (a) a single map-side filter — no shuffle,
no global state, no RNG whose result depends on partitioning — and
(b) reproducible across engines and re-runs. Both operators here hash
the *row identity* (md5, portable) rather than calling a random(): the
same document keeps/drops identically on every run, every engine, any
partitioning, and the sample composes with retries/incremental reruns
(the property Spark's `df.sample` does not give you across jobs).

Mixture planning (domain/language reweighting toward a target token
share) is a tiny aggregate over corpus statistics — the planner output
feeds the sampler's per-stratum rates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Hash granularity for sample thresholds: rates are quantized to
# 1/10_000 so the keep predicate is an exact integer comparison on
# both engines (no float-boundary flips).
_BUCKETS = 10_000


def hash_prefix_long(col: Column, salt: str) -> Column:
    """The raw portable hash: md5 of the salted value, first 8 hex
    chars parsed base-16 — a uniform value in [0, 2^32) that fits a
    LONG exactly and parses identically on both engines (Spark
    conv(_,16,10), DuckDB CAST('0x'||_)). ONE home for the
    portable-hash contract: _hash_bucket mods it down, and every
    consumer (sampling buckets, winnowing fingerprints) and oracle
    twin mirrors exactly this expression."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _hash_bucket(id_col: Column, salt: str, buckets: int = _BUCKETS) -> Column:
    """Uniform [0, buckets) bucket: hash_prefix_long mod buckets."""
    return hash_prefix_long(id_col, salt) % buckets


def _hash_u53(id_col: Column, salt: str) -> Column:
    """Uniform u = (2h+1)/2^53 in (0, 1) from the salted md5 — 13 hex
    chars = 52 bits, so 2h+1 < 2^53 is an exactly-representable odd
    integer and the division by 2^53 is exact. The _hash_bucket
    companion for CONTINUOUS noise (Gumbel-top-k); ``hash_u53_sql``
    is its DuckDB twin — the two must stay byte-equivalent, which is
    why they live here as the one home of the contract (review
    finding r9: the expression had been inlined at two call sites)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")).cast("binary")),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    return (2 * h + 1).cast("double") / F.lit(9007199254740992.0)


def hash_u53_sql(id_expr: str, salt: str) -> str:
    """DuckDB expression text twin of ``_hash_u53`` (same bits)."""
    return (
        "CAST(2 * CAST('0x' || substr(md5('"
        + salt
        + ":' || "
        + id_expr
        + "), 1, 13) AS BIGINT) + 1 AS DOUBLE) / 9007199254740992.0"
    )


def deterministic_stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "samp",
) -> DataFrame:
    """Keep each row with probability rates[stratum] — deterministically,
    by id hash, as a pure map-side filter (one scan, zero shuffles,
    reproducible under any partitioning)."""
    thresh: Column = F.lit(int(round(default_rate * _BUCKETS)))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * _BUCKETS)))
        ).otherwise(thresh)
    return df.where(_hash_bucket(F.col(id_col), salt) < thresh)


def stratified_topk(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    k: int,
    salt: str = "topk",
    oversample: float = 8.0,
    max_strata: int = 10_000,
) -> DataFrame:
    """Exact k-per-stratum deterministic sample: the min(n, k) rows
    with the SMALLEST salted id hashes per stratum, plus their 1-based
    ``pos`` in hash order — the fixed-size companion of the rate-based
    deterministic_stratified_sample (eval sets, per-domain audits,
    few-shot pools want "exactly k docs per source", not a rate).

    Identical to ``row_number() OVER (PARTITION BY stratum ORDER BY
    hash, id) <= k`` — but NOT executed that way: at corpus scale that
    window sorts every stratum in full. Instead a per-stratum hash
    threshold (~oversample·k/n of the hash range, from one count
    aggregate) prefilters to ~oversample·k survivor rows per stratum
    BEFORE the rank window, so the sort input is sample-sized, not
    corpus-sized. The prefilter is exact whenever >= min(n, k)
    survivors remain (the k smallest hashes all sit below any
    threshold that admits k rows); the shortfall probability at
    oversample=8 is Chernoff-negligible, and a post-check compares
    per-stratum picked counts against min(n, k) and re-ranks ONLY
    starved strata with the filter off — so the output equals the
    plain-window semantics unconditionally, never probabilistically.

    ``max_strata`` mirrors temperature_mixture_plan: per-stratum
    thresholds collect one row per stratum; a high-cardinality column
    raises loudly before materializing."""
    import math

    if k <= 0:
        raise ValueError(f"k must be >= 1, got {k}")
    per = df.groupBy(F.col(strata_col).alias("_stratum")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    rows = per.limit(max_strata + 1).collect()
    if len(rows) > max_strata:
        raise ValueError(
            f"stratified_topk collected more than max_strata={max_strata}"
            f" distinct values of {strata_col!r}: strata are"
            " sources/languages (dozens), not a high-cardinality key"
        )
    full = 1 << 32
    thresh = {
        r["_stratum"]: full
        if r["_n"] <= oversample * k
        else int(math.ceil(full * oversample * k / r["_n"]))
        for r in rows
    }
    expected = {r["_stratum"]: min(r["_n"], k) for r in rows}

    def ranked(src: DataFrame) -> DataFrame:
        w = Window.partitionBy(strata_col).orderBy(
            hash_prefix_long(F.col(id_col), salt), F.col(id_col)
        )
        return src.withColumn("pos", F.row_number().over(w)).where(
            F.col("pos") <= k
        )

    tcol: Column = F.lit(full)
    for s, t in sorted(thresh.items()):
        tcol = F.when(F.col(strata_col) == s, F.lit(t)).otherwise(tcol)
    picked = ranked(
        df.where(hash_prefix_long(F.col(id_col), salt) < tcol)
    ).localCheckpoint(eager=False)  # round-12: the got collect materializes it
    got = {
        r["_stratum"]: r["_got"]
        for r in picked.groupBy(F.col(strata_col).alias("_stratum"))
        .agg(F.count(F.lit(1)).alias("_got"))
        .collect()
    }
    starved = [s for s, want in expected.items() if got.get(s, 0) < want]
    if not starved:
        return picked
    # Exactness fallback: re-rank ONLY the starved strata unfiltered.
    redo = ranked(df.where(F.col(strata_col).isin(starved)))
    return picked.where(~F.col(strata_col).isin(starved)).unionByName(redo)


def mixture_plan(
    docs: DataFrame,
    strata_col: str,
    token_count: Column,
    target_shares: dict[str, float],
) -> DataFrame:
    """Per-stratum downsampling plan toward a target token mixture:
    (stratum, n_docs, n_tokens, sample_rate) where sample_rate =
    min(1, target_share · total_budget / stratum_tokens) and
    total_budget = Σ tokens · the shares' coverage. One aggregate +
    one single-row cross join (broadcast by construction) — corpus
    scale cost is the token count scan."""
    share: Column = F.lit(None).cast("double")
    for stratum, s in sorted(target_shares.items()):
        share = F.when(F.col("stratum") == stratum, F.lit(s)).otherwise(share)
    per = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("_total"))
    # A stratum with no target share gets rate 0.0 — coalesce BEFORE
    # the least(): both engines' least() skips NULL arguments, so a
    # NULL share would otherwise fall through to rate 1.0.
    share = F.coalesce(share, F.lit(0.0))
    return per.crossJoin(F.broadcast(total)).select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.round(
            F.least(F.lit(1.0), share * F.col("_total") / F.col("n_tokens")), 6
        ).alias("sample_rate"),
    )


def temperature_mixture_plan(
    docs: DataFrame,
    strata_col: str,
    token_count: Column,
    temperature: float,
    max_strata: int = 10_000,
) -> DataFrame:
    """Temperature-scaled mixture plan — the multilingual-pretraining
    sampling-temperature knob (XLM-R/mT5): target share_s ∝ p_s^(1/T)
    where p_s is the stratum's natural token share. T=1 keeps natural
    proportions, T→∞ approaches uniform; in between it up-weights
    low-resource strata without letting them dominate. Unlike
    ``mixture_plan`` (explicit target shares) the targets here are
    DERIVED from the measured distribution, so the operator pairs a
    corpus-scale token count with one bounded driver step.

    Determinism: pow is transcendental, so — the DSIR codebook
    discipline — the per-stratum math runs ONCE on the driver over the
    collected aggregate (bounded by the stratum count, never corpus
    rows): weights nano-quantized half-away-from-zero and
    integer-summed (float-sum order never crosses engines), shares and
    rates derived with the exact op order the DuckDB twin uses —
    CPython and DuckDB share libm, so pow agrees bit-for-bit (the
    proven dsir ln precedent). Output: (stratum, n_docs, n_tokens,
    share, sample_rate), full-precision (identical bits need no
    rounding); feed ``sample_rate`` to
    deterministic_stratified_sample to execute the plan.

    Rates are max-renormalized (round-10 ADVICE): a raw per-stratum
    rate is share_s / p_s (the up/down-weight factor), and for any
    T > 1 the most up-weighted stratum's raw rate EXCEEDS 1 — a
    per-stratum ``min(1.0, ...)`` cap would silently execute a
    mixture that deviates from the p^(1/T) targets while the ``share``
    column still reported them. Dividing every raw rate by the MAX
    raw rate instead pins the most up-weighted stratum at exactly 1.0
    and scales the rest proportionally, so executing the plan yields
    token counts ∝ share at the largest corpus size feasible without
    upsampling (realized_tokens_s = rate_s·n_tokens_s ∝ share_s).

    ``max_strata`` (round-10): the per-stratum math collects one row
    per stratum to the driver — correct for mixture strata (dozens of
    languages/domains), a silent OOM for a caller that passes a
    high-cardinality column (doc ids, URLs). Count is checked BEFORE
    materializing; over the cap raises loudly."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    expo = 1.0 / float(temperature)
    per = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(token_count).alias("n_tokens")
    )
    rows = per.limit(max_strata + 1).collect()
    if len(rows) > max_strata:
        raise ValueError(
            f"temperature_mixture_plan collected more than max_strata="
            f"{max_strata} distinct values of {strata_col!r}: mixture"
            " strata are languages/domains (dozens), not a"
            " high-cardinality key — pass a coarser column, or raise"
            " max_strata if the cardinality is genuinely intended"
        )
    # A stratum contributing zero (or NULL — all token counts null)
    # tokens has nothing to sample and no defined share: drop it from
    # the plan rather than dividing by it (review finding r9; the SQL
    # twin filters n_tokens > 0 identically).
    rows = [r for r in rows if r["n_tokens"]]
    if not rows:
        return docs.sparkSession.createDataFrame(
            [],
            "stratum STRING, n_docs BIGINT, n_tokens BIGINT, share DOUBLE, sample_rate DOUBLE",
        )
    total = sum(r["n_tokens"] for r in rows)
    wq = {
        r["stratum"]: int(
            Decimal(math.pow(r["n_tokens"] / total, expo) * 1e9).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        for r in rows
    }
    sw = sum(wq.values())
    # raw rate = share / natural share; ÷ max keeps proportions exact
    # with the largest stratum pinned at 1.0 (no upsampling). Op order
    # mirrors the DuckDB twin exactly — every step is one IEEE op.
    raw = {r["stratum"]: wq[r["stratum"]] / sw * total / r["n_tokens"] for r in rows}
    max_raw = max(raw.values())
    out = [
        (
            r["stratum"],
            r["n_docs"],
            r["n_tokens"],
            wq[r["stratum"]] / sw,
            raw[r["stratum"]] / max_raw,
        )
        for r in rows
    ]
    return docs.sparkSession.createDataFrame(
        out, "stratum STRING, n_docs BIGINT, n_tokens BIGINT, share DOUBLE, sample_rate DOUBLE"
    )


def mixture_sample(
    docs: DataFrame,
    id_col: str,
    strata_col: str,
    token_count: Column,
    target_shares: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Execute a mixture plan: compute per-stratum rates from the
    corpus (mixture_plan) and APPLY them as deterministic id-hash
    thresholds in the same pass — the complete domain-reweighting
    step, from measured token distribution to a reproducible sampled
    corpus. Returns the kept rows with ``sample_rate`` attached.

    Scale shape: one token-count aggregate (tiny result, broadcast
    back), then a map-side hash filter over the corpus — no shuffle
    of the corpus itself, reproducible under any partitioning or
    retry. The data-dependent rate works as an exact threshold
    because it is quantized to 6 dp identically on both engines
    before the ×10000 integer comparison."""
    plan = mixture_plan(docs, strata_col, token_count, target_shares)
    # Collision-safe internal names: the caller's frame may already
    # hold a 'stratum' (or even be stratified ON 'stratum') or a
    # 'sample_rate' column; unqualified join-backs would then be
    # ambiguous or silently duplicated.
    plan = plan.select(
        F.col("stratum").alias("_mix_stratum"), F.col("sample_rate").alias("_mix_rate")
    )
    joined = docs.join(F.broadcast(plan), docs[strata_col] == F.col("_mix_stratum"))
    thresh = F.round(F.col("_mix_rate") * _BUCKETS).cast("long")
    return (
        joined.where(_hash_bucket(docs[id_col], salt) < thresh)
        .drop("_mix_stratum")
        .withColumnRenamed("_mix_rate", "sample_rate")
    )


def _shard_of(id_col: Column, salt: str, n_shards: int) -> Column:
    """Deterministic shard from the salted-md5 of the id (same portable
    parse as _hash_bucket, modulo the shard count)."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias("shard")


def deterministic_shuffle(
    df: DataFrame, id_col: str, n_shards: int = 64, salt: str = "shuf"
) -> DataFrame:
    """Reproducible global shuffle for training-example ordering:
    every row gets a (shard, pos) — shard from the salted id hash,
    pos by hash order within the shard. Changing the salt is a fresh
    epoch permutation; the same salt replays identically on any
    engine, partitioning, or retry.

    Scale shape: the only movement is one hash-partitioned exchange
    into n_shards groups; within-shard ordering is a per-partition
    sort, never a global one. Pick n_shards ≈ cluster cores × k so
    each shard's row_number window is one bounded task (at 100 TB:
    tens of thousands of shards, not 64)."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")).cast("binary"))
    out = df.select(
        F.col(id_col), _shard_of(F.col(id_col), salt, n_shards), h.alias("_h")
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return out.select(id_col, "shard", F.row_number().over(w).alias("pos"))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    budget: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Greedy contiguous sequence packing: assign each document to the
    training batch (bin) in which its tokens *start*, packing id-order
    runs of documents into fixed token budgets. bin_id =
    (tokens-before-this-doc) div budget over the shard-local id order
    — the standard approximation for building fixed-length training
    examples without splitting the stream across workers.

    Packing is shard-local by construction (a cumulative sum never
    crosses shards), so the window is a bounded per-partition pass —
    no global ordering exists anywhere in the plan. All arithmetic is
    integer (token counts, integer div), hence engine-exact."""
    out = df.select(
        F.col(id_col),
        _shard_of(F.col(id_col), salt, n_shards),
        token_count.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        cum_before.alias("_cum"),
    ).select(
        id_col, "shard", "n_tokens", F.expr(f"_cum div {budget}").alias("bin_id")
    )


def select_within_budget(
    docs: DataFrame,
    order_cols,
    cost_col: str,
    budget: int,
    cumsum_col: str = "cum_cost",
) -> DataFrame:
    """Budget-constrained corpus selection: take rows in ``order_cols``
    order (best first — a quality ranking) while the INCLUSIVE running
    sum of ``cost_col`` (tokens/chars/bytes) stays ≤ ``budget`` — "fill
    a 10B-token budget with the best documents", the final assembly
    step of a training-data pipeline. Greedy-prefix semantics: a row
    is selected iff every better-ranked row plus itself fits.

    Distributed via plans.ranking.with_global_cumsum (range-partitioned
    two-phase running sum) — no single-partition window, so the
    selection scales to corpus-sized inputs."""
    from orestes_spark.plans.ranking import with_global_cumsum

    out = with_global_cumsum(docs, list(order_cols), cost_col, cumsum_col=cumsum_col)
    return out.where(F.col(cumsum_col) <= budget)


def cap_per_group(
    df: DataFrame, group_col: str, order_cols: list[Column], n: int
) -> DataFrame:
    """Per-group row cap — the web-pipeline "domain cap": no single
    source/domain may contribute more than ``n`` documents, keeping
    the corpus from being swamped by one crawler-friendly site.
    ``order_cols`` decides WHICH n survive (quality-first ordering
    keeps the best copies, the C4-family policy). One row_number
    window per group: a single shuffle on the group key; the sort is
    per-group and streams, so a mega-domain costs its own sort, never
    a global one."""
    if n < 1:
        raise ValueError(f"cap must be >= 1: {n}")
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    fractions: tuple[float, float] = (0.8, 0.1),
    salt: str = "split",
) -> DataFrame:
    """Assign every row a named split — 'train' / 'val' / 'test' — by
    the salted id hash. fractions = (train, val); test takes the rest.

    The core held-out-set primitive of a training pipeline: because
    membership is a pure function of the row id, the split is stable
    across re-runs, engines, partitionings and INCREMENTAL ARRIVALS —
    a document ingested next month lands in the same split it would
    have landed in today, so eval sets never silently absorb training
    data. Map-side only: zero shuffles, composes with any downstream
    plan."""
    t_train = int(round(fractions[0] * _BUCKETS))
    t_val = t_train + int(round(fractions[1] * _BUCKETS))
    b = _hash_bucket(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(b < t_train, "train").when(b < t_val, "val").otherwise("test"),
    )


def _dsir_toks(
    df: DataFrame, id_col: str, text_col: str, bigrams: bool, total: bool = False
) -> DataFrame:
    """(_id, tok) feature stream for DSIR: whitespace unigrams, plus
    space-joined bigrams when ``bigrams`` (the paper's default set).
    ``total=True`` keeps one (id, NULL) row for docs whose
    tokenization yields no array at all (NULL text) — the outer
    explode lets a TOTAL-coverage scorer aggregate every doc in one
    pass instead of joining verdicts back onto a distinct-id frame."""
    from orestes_spark.operators.dedup import bind, normalize_text

    split_expr = F.split(normalize_text(F.col(text_col)), r"\s+")
    explode = F.explode_outer if total else F.explode
    if not bigrams:
        return df.select(
            F.col(id_col).alias("_id"), explode(split_expr).alias("tok")
        )

    def feats(tk: Column) -> Column:
        m = F.size(tk)
        bg = F.when(
            m >= 2,
            F.zip_with(
                F.slice(tk, 1, m - 1),
                F.slice(tk, 2, m - 1),
                lambda a, c: F.concat_ws(" ", a, c),
            ),
        )
        return F.concat(tk, F.coalesce(bg, F.array()))

    return df.select(
        F.col(id_col).alias("_id"), explode(bind(split_expr, feats)).alias("tok")
    )


def dsir_weight_table(
    target: DataFrame,
    raw: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 4096,
    salt: str = "dsir",
    bigrams: bool = False,
) -> DataFrame:
    """The DSIR codebook: (bucket, wq) with wq = the nano-quantized
    ln(p_target(bucket)/p_raw(bucket)) of two add-one-smoothed hashed
    multinomials — the per-bucket log-ratios every DSIR consumer
    weights tokens with. Factored out of ``dsir_logratio_weights``
    (round-9) so the streaming quality gate can FREEZE it once at
    store setup (the frozen-quantizer pattern) instead of recounting a
    growing corpus per batch. Driver-side ln + integer quantization
    per the module's cross-engine recipe; the collected state is two
    ``buckets``-bounded count maps, never corpus rows."""
    bucket = _hash_bucket(F.col("tok"), salt, buckets).alias("bucket")
    t_counts = {
        r["bucket"]: r["c"]
        for r in _dsir_toks(target, id_col, text_col, bigrams)
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    c_counts = {
        r["bucket"]: r["c"]
        for r in _dsir_toks(raw, id_col, text_col, bigrams)
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    return _wq_table(target.sparkSession, t_counts, c_counts, buckets)


def _wq_table(spark, t_counts: dict, c_counts: dict, buckets: int) -> DataFrame:
    """The driver-side ln + nano-quantization step of
    ``dsir_weight_table``, factored out (round-12) so the one-pass
    dual-codebook trainer below shares it verbatim."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    d_t, d_c = sum(t_counts.values()), sum(c_counts.values())

    def wq(b: int) -> int:
        p_t = (t_counts.get(b, 0) + 1) / (d_t + buckets)
        p_c = (c_counts.get(b, 0) + 1) / (d_c + buckets)
        # nano-quantized, ties away from zero — DuckDB round()'s rule
        return int(
            Decimal(math.log(p_t / p_c) * 1e9).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    return spark.createDataFrame(
        [(b, wq(b)) for b in range(buckets)], "bucket LONG, wq LONG"
    )


def dsir_weight_tables(
    target: DataFrame,
    raw: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 4096,
    salt: str = "dsir",
) -> tuple[DataFrame, DataFrame]:
    """BOTH DSIR codebooks — (unigram, unigram+bigram feature sets) —
    from ONE tokenize pass per side (round-12, guide §1.2: don't
    re-read what one pass computes). The bigram feature stream is a
    strict superset of the unigram stream (``_dsir_toks`` concats
    unigrams ++ bigrams), and the two codebooks hash with the SAME
    salt/buckets, so one (bucket, is_unigram) count per side yields
    both count maps: unigram = the is_unigram slice, bigram = the
    whole thing. is_unigram = the feature contains no space —
    whitespace-split unigrams can never contain one, concat_ws
    bigrams always do. Counts (and therefore every wq) are
    byte-identical to two separate ``dsir_weight_table`` calls, which
    remains the single-codebook reference path."""
    bucket = _hash_bucket(F.col("tok"), salt, buckets).alias("bucket")
    is_uni = (~F.col("tok").contains(" ")).alias("u")

    def counts(df: DataFrame) -> tuple[dict, dict]:
        uni: dict[int, int] = {}
        bi: dict[int, int] = {}
        for r in (
            _dsir_toks(df, id_col, text_col, bigrams=True)
            .select(bucket, is_uni)
            .groupBy("bucket", "u")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ):
            bi[r["bucket"]] = bi.get(r["bucket"], 0) + r["c"]
            if r["u"]:
                uni[r["bucket"]] = uni.get(r["bucket"], 0) + r["c"]
        return uni, bi

    t_uni, t_bi = counts(target)
    c_uni, c_bi = counts(raw)
    spark = target.sparkSession
    return (
        _wq_table(spark, t_uni, c_uni, buckets),
        _wq_table(spark, t_bi, c_bi, buckets),
    )


def dsir_logratio_weights(
    docs: DataFrame,
    target: DataFrame | None,
    id_col: str,
    text_col: str,
    buckets: int = 4096,
    salt: str = "dsir",
    bigrams: bool = False,
    weights: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed-n-gram distribution is —
    weight(doc) = Σ_features ln(p_target(bucket)/p_raw(bucket)) under
    two add-one-smoothed multinomials over ``buckets`` hashed
    features. ``bigrams=False`` uses unigram features and outputs
    (id, n_tokens, dsir_logratio); ``bigrams=True`` is the paper's
    default feature set — unigrams AND bigrams — and outputs
    (id, n_feats, dsir_logratio), n_feats = 2·tokens − 1 per doc.
    Every doc in ``docs`` gets a row; selection composes downstream
    (top-k, threshold, or ``select_within_budget`` in weight order).

    Determinism across engines is ENGINEERED around one hard fact:
    JVM log() and libm ln() disagree in the last ulp on ~2-5% of
    arguments (measured), so no distributed plan may ever evaluate
    ln. Instead the per-bucket log-ratios are computed ONCE on the
    driver in Python (bit-identical to DuckDB's ln — same libm),
    quantized to integer nano-units with half-away-from-zero rounding
    (DuckDB round()'s rule), and broadcast back as a ``buckets``-row
    table; every distributed step is exact integer arithmetic
    (counts, one weighted integer sum per doc) with ONE final
    round(·/1e9, 6) display step. This is the same driver-side
    codebook pattern as pq_codebooks — the collected state is two
    ``buckets``-bounded count tables, never corpus-sized.

    Scale shape: two token-count aggregations (map-side combined, 
    output bounded by ``buckets``), one broadcast join of the weight
    table onto the raw token stream, one groupBy(id). No shuffle
    carries more than |corpus tokens| rows, nothing is quadratic,
    and the weight table is ~64 KiB at the default 4096 buckets."""
    corpus_toks = _dsir_toks(docs, id_col, text_col, bigrams).select(
        "_id", _hash_bucket(F.col("tok"), salt, buckets).alias("bucket")
    )
    # ``weights``: a precomputed dsir_weight_table — the persisted-
    # codebook shape (train once, read by every consumer); ``target``
    # may be None then. Must have been built with the SAME buckets/
    # salt/bigrams or the hashes will not line up.
    if weights is None and target is None:
        raise ValueError(
            "dsir_logratio_weights: pass target (to train) or weights (pretrained)"
        )
    wdf = (
        weights
        if weights is not None
        else dsir_weight_table(
            target, docs, id_col, text_col, buckets=buckets, salt=salt, bigrams=bigrams
        )
    )
    return (
        corpus_toks.join(F.broadcast(wdf), "bucket")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("wq").alias("_s"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").cast("long").alias("n_feats" if bigrams else "n_tokens"),
            F.round(F.col("_s") / 1e9, 6).alias("dsir_logratio"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame | None,
    id_col: str,
    text_col: str,
    n: int,
    buckets: int = 4096,
    salt: str = "dsir",
    noise_salt: str = "gumbel",
    bigrams: bool = False,
    weights: DataFrame | None = None,
) -> DataFrame:
    """The RESAMPLING step of DSIR (Xie et al. 2023) that
    ``dsir_logratio_weights`` stops short of: deterministically select
    the ``n`` documents of a target-sized subset with probability
    proportional to their importance weight, via Gumbel-top-k — take
    the top n by ``logweight + Gumbel(0,1)`` (Vieira 2014's
    equivalence: exactly a weighted sample WITHOUT replacement of
    size n).

    Determinism across engines, extending the module's recipes to
    per-row noise: the Gumbel is ``-ln(-ln(u))`` of a hash-derived
    uniform u = (2h+1)/2^53 (h = 52 bits of md5(noise_salt:id) — the
    _hash_bucket idiom), with BOTH ln's computed by detmath's
    fixed-precision series over IEEE +,-,*,/ only, which Spark and
    DuckDB evaluate bit-identically (measured: 0 mismatches across
    200k values, |error| < 1.5e-12 vs libm). Noise depends only on
    (noise_salt, id), so the sample is reproducible across runs,
    engines, partitionings, and is weight-monotone: raising one doc's
    weight while others hold can only pull it INTO the sample.

    Scale shape: the weights pipeline's two bounded aggs + broadcast
    join, then a pure map-side noise expression and a global top-n —
    Spark executes orderBy().limit(n) as TakeOrderedAndProject
    (per-partition top-n, single merge of n-row partials), never a
    full sort/shuffle of the corpus. Output: (id, n_tokens|n_feats,
    dsir_logratio, gumbel_key), key rounded for display; selection
    uses full precision with id as the final tie-break."""
    from orestes_spark import detmath

    n_col = "n_feats" if bigrams else "n_tokens"
    w = dsir_logratio_weights(
        docs, target, id_col, text_col, buckets=buckets, salt=salt, bigrams=bigrams,
        weights=weights,
    )
    scored = w.withColumn("_u", _hash_u53(F.col(id_col), noise_salt))
    scored = detmath.apply_steps_spark(scored, detmath.gumbel_steps("_u", "_g"))
    scored = scored.withColumn("_key", F.col("dsir_logratio") + F.col("_g"))
    return (
        scored.orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(int(n))
        .select(
            id_col,
            n_col,
            "dsir_logratio",
            F.round(F.col("_key"), 6).alias("gumbel_key"),
        )
    )
