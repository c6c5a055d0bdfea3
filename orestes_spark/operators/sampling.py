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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hash granularity for sample thresholds: rates are quantized to
# 1/10_000 so the keep predicate is an exact integer comparison on
# both engines (no float-boundary flips).
_BUCKETS = 10_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform [0, 10000) bucket from md5 of the salted id — the first
    8 hex chars parsed base-16 (fits a LONG exactly; both engines
    parse identically: Spark conv(_,16,10), DuckDB CAST('0x'||_))."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


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
