"""Deterministic sampling / mixture planning tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from orestes_spark.operators import sampling


def test_stratified_sample_deterministic_and_calibrated(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)], "doc_id LONG, lang STRING"
    )
    out = sampling.deterministic_stratified_sample(df, "doc_id", "lang", {"en": 0.5})
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b  # reproducible, not RNG
    kept_en = out.where("lang = 'en'").count()
    assert 400 <= kept_en <= 600  # ~50% of 1000, hash-uniform
    assert out.where("lang = 'de'").count() == 1000  # default rate 1.0


def test_stratified_sample_is_map_side_only(spark):
    """The sample must be a pure filter: no Exchange in the plan."""
    df = spark.createDataFrame([(1, "en")], "doc_id LONG, lang STRING")
    plan = (
        sampling.deterministic_stratified_sample(df, "doc_id", "lang", {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_deterministic_shuffle_is_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id LONG")
    out = sampling.deterministic_shuffle(df, "doc_id", n_shards=8).collect()
    assert len(out) == 500
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # same salt replays identically; a different salt reorders
    again = sampling.deterministic_shuffle(df, "doc_id", n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = sampling.deterministic_shuffle(df, "doc_id", n_shards=8, salt="epoch2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_pack_sequences_bins_match_cumsum(spark):
    rows = [(i, "tok " * (10 + i % 50)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    out = sampling.pack_sequences(df, "doc_id", toks, budget=100, n_shards=4).collect()
    assert len(out) == 300
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in docs:
            assert r["bin_id"] == cum // 100, (shard, r)
            cum += r["n_tokens"]
        # bins are contiguous from 0 within the shard
        bins = sorted({r["bin_id"] for r in docs})
        assert bins[0] == 0 and bins == list(range(len(bins)))


def test_mixture_plan_rates(spark):
    # 'a' has 10x the tokens of 'b': equal target shares must
    # downsample 'a' and leave 'b' uncapped (rate 1.0).
    rows = [(i, "a", "tok " * 100) for i in range(10)] + [(100 + i, "b", "tok " * 10) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    plan = {
        r["stratum"]: r
        for r in sampling.mixture_plan(df, "lang", toks, {"a": 0.5, "b": 0.5}).collect()
    }
    assert plan["a"]["n_docs"] == 10 and plan["b"]["n_docs"] == 10
    assert plan["a"]["sample_rate"] < 1.0
    assert plan["b"]["sample_rate"] == 1.0
    # unknown stratum (no target share) → rate 0.0
    plan2 = sampling.mixture_plan(df, "lang", toks, {"a": 1.0}).collect()
    assert {r["stratum"]: r["sample_rate"] for r in plan2}["b"] == 0.0


def test_pack_sequences_property_matches_python_model(spark):
    """Hypothesis: random token counts (incl. zero and over-budget
    docs) — bin assignment must equal the pure-Python cumsum model,
    with shards recomputed from the same md5 derivation."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
        nsh=st.integers(min_value=2, max_value=4),
    )
    def check(toks, nsh):
        rows = [(i, t) for i, t in enumerate(toks)]
        df = spark.createDataFrame(rows, "doc_id LONG, nt LONG")
        out = sampling.pack_sequences(df, "doc_id", F.col("nt"), budget=100, n_shards=nsh)
        got = {r["doc_id"]: (r["shard"], r["bin_id"]) for r in out.collect()}

        def shard_of(i):
            return int(hashlib.md5(f"pack:{i}".encode()).hexdigest()[:8], 16) % nsh

        cum: dict[int, int] = {}
        for i, t in rows:  # doc_id order == id order within shard
            s = shard_of(i)
            before = cum.get(s, 0)
            assert got[i] == (s, before // 100), (i, t, got[i], s, before)
            cum[s] = before + t

    check()


def test_mixture_sample_applies_plan_rates(spark):
    """mixture_sample keeps over-represented strata at ~their computed
    rate, keeps starved strata entirely, and is bit-reproducible."""
    from pyspark.sql import functions as F

    from orestes_spark.operators import sampling

    rows = [(i, "big" if i < 900 else "small", "w " * 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    kept = sampling.mixture_sample(df, "doc_id", "lang", toks, {"big": 0.5, "small": 0.5})
    out = {r["lang"]: r["cnt"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # small is under target (10% of tokens, target 50%) -> rate 1.0, all kept
    assert out["small"] == 100
    # big is over target: rate = 0.5*1000/900 ≈ 0.5556 -> roughly half kept
    assert 450 <= out["big"] <= 560
    # deterministic: a second run is identical
    out2 = {r["lang"]: r["cnt"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert out == out2


def test_select_within_budget_greedy_prefix(spark):
    """Exact greedy-prefix semantics vs a Python model, including the
    boundary row that exactly fills the budget and the one after it."""
    import random

    from pyspark.sql import functions as F

    from orestes_spark.operators import sampling

    rng = random.Random(9)
    rows = [(i, float(rng.randint(0, 100)), rng.randint(10, 99)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id LONG, score DOUBLE, cost LONG")
    budget = 3000
    out = {r["doc_id"]: r["cum_cost"] for r in sampling.select_within_budget(
        df, [F.col("score").desc(), F.col("doc_id")], "cost", budget
    ).collect()}

    acc, expected = 0, {}
    for i, score, cost in sorted(rows, key=lambda r: (-r[1], r[0])):
        acc += cost
        if acc > budget:
            break
        expected[i] = acc
    assert out == expected and 0 < len(expected) < 200


def test_train_val_test_split_partitions_and_replays(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    out = sampling.train_val_test_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    n = sum(counts.values())
    assert n == 4000
    # hash split tracks the 80/10/10 target within a loose band
    assert abs(counts["train"] / n - 0.8) < 0.05
    assert abs(counts["val"] / n - 0.1) < 0.03
    # deterministic replay: same ids -> identical assignment
    again = sampling.train_val_test_split(df, "doc_id")
    assert out.exceptAll(again).count() == 0
    # map-side only: no exchange in the assignment plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """DSIR sanity: docs drawn from the target's vocabulary score a
    HIGHER log-ratio than off-distribution docs; every corpus doc
    gets a row; token counts are with-multiplicity."""
    from orestes_spark.operators.sampling import dsir_logratio_weights

    tvoc = "alpha beta gamma delta epsilon zeta eta theta"
    target = spark.createDataFrame(
        [(100 + i, tvoc) for i in range(5)], "doc_id LONG, text STRING"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta alpha beta"),     # target-like
            (2, "xray yankee zulu quebec victor whiskey"), # off-distribution
            (3, "alpha xray beta yankee"),                 # mixed
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in dsir_logratio_weights(corpus, target, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_tokens"] == 6 and rows[2]["n_tokens"] == 6 and rows[3]["n_tokens"] == 4
    assert rows[1]["dsir_logratio"] > rows[3]["dsir_logratio"] > rows[2]["dsir_logratio"]
    assert rows[1]["dsir_logratio"] > 0 > rows[2]["dsir_logratio"]


def test_dsir_weight_tables_match_single_codebook_trainer(spark):
    """Round-12: the one-pass dual-codebook trainer must reproduce
    BOTH dsir_weight_table codebooks wq-for-wq (unigram slice from
    the tagged bigram stream == the standalone unigram count),
    including null-text and single-token docs."""
    from orestes_spark.operators.sampling import (
        dsir_weight_table,
        dsir_weight_tables,
    )

    target = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha"), (3, None)],
        "doc_id LONG, text STRING",
    )
    raw = spark.createDataFrame(
        [(10, "alpha beta beta gamma delta"), (11, "zulu"), (12, "x y")],
        "doc_id LONG, text STRING",
    )
    uni, bi = dsir_weight_tables(target, raw, "doc_id", "text", buckets=64)
    ref_uni = dsir_weight_table(target, raw, "doc_id", "text", buckets=64, bigrams=False)
    ref_bi = dsir_weight_table(target, raw, "doc_id", "text", buckets=64, bigrams=True)
    for got, ref in ((uni, ref_uni), (bi, ref_bi)):
        g = {r["bucket"]: r["wq"] for r in got.collect()}
        e = {r["bucket"]: r["wq"] for r in ref.collect()}
        assert g == e


def test_dsir_bigram_features_counted_and_phrase_sensitive(spark):
    """bigrams=True emits n_feats = 2*tokens - 1 and separates docs
    that share the target's unigrams but scramble its phrases."""
    from orestes_spark.operators.sampling import dsir_logratio_weights

    target = spark.createDataFrame(
        [(100 + i, "new york city hall meeting") for i in range(5)],
        "doc_id LONG, text STRING",
    )
    corpus = spark.createDataFrame(
        [
            (1, "new york city hall meeting"),   # exact phrase order
            (2, "hall new meeting city york"),   # same unigrams, no bigrams
        ],
        "doc_id LONG, text STRING",
    )
    rows = {
        r["doc_id"]: r
        for r in dsir_logratio_weights(
            corpus, target, "doc_id", "text", bigrams=True
        ).collect()
    }
    assert rows[1]["n_feats"] == 9 and rows[2]["n_feats"] == 9
    assert rows[1]["dsir_logratio"] > rows[2]["dsir_logratio"]
    # unigram mode cannot tell them apart
    uni = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_logratio_weights(corpus, target, "doc_id", "text").collect()
    }
    assert uni[1] == uni[2]


def test_dsir_resample_reproducible_and_weight_monotone(spark):
    """Round-9 (verdict #4): the resampling step. (a) Reproducible —
    two runs select the identical set with identical keys. (b)
    Weight-monotone — noise depends only on (noise_salt, id), so
    making ONE left-out doc's text more target-like can only pull it
    INTO the sample, never eject it by luck."""
    from orestes_spark.operators.sampling import dsir_resample

    tvoc = "alpha beta gamma delta epsilon zeta eta theta"
    target = spark.createDataFrame(
        [(1000 + i, tvoc) for i in range(5)], "doc_id LONG, text STRING"
    )
    # 30 corpus docs: 15 target-like, 15 off-distribution
    corpus_rows = [(i, tvoc) for i in range(15)] + [
        (i, "xray yankee zulu quebec victor whiskey") for i in range(15, 30)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id LONG, text STRING")

    pick = lambda df: {r["doc_id"]: r["gumbel_key"] for r in df.collect()}
    s1 = pick(dsir_resample(corpus, target, "doc_id", "text", n=10))
    s2 = pick(dsir_resample(corpus, target, "doc_id", "text", n=10))
    assert s1 == s2 and len(s1) == 10
    # weight wins on average: the target-like half dominates the sample
    assert sum(1 for d in s1 if d < 15) >= 8

    # (b) monotonicity: take a NOT-selected off-distribution doc, make
    # its text target-like, and re-sample — it must now score a higher
    # key (same noise), and every previously-selected doc that it does
    # not displace stays selected.
    out = next(d for d in range(15, 30) if d not in s1)
    bumped_rows = [(d, t) if d != out else (d, tvoc) for d, t in corpus_rows]
    bumped = spark.createDataFrame(bumped_rows, "doc_id LONG, text STRING")
    s3 = pick(dsir_resample(bumped, target, "doc_id", "text", n=10))
    assert out in s3
    assert len(set(s1) - set(s3)) <= 1  # at most the one displaced doc


def test_detmath_ln_bit_identical_to_duckdb(spark):
    """The recipe the resampler rides on: detmath's IEEE-only ln/Gumbel
    evaluates BIT-identically on Spark and DuckDB over hash uniforms,
    and tracks libm's Gumbel to ~1e-12."""
    import math
    import struct

    import duckdb

    from orestes_spark import detmath

    N = 3000
    base = spark.range(N).selectExpr(
        "id",
        "CAST(conv(substr(md5(concat('g:', CAST(id AS STRING))), 1, 13), 16, 10) AS BIGINT) AS h",
    ).selectExpr("id", "CAST(2*h + 1 AS DOUBLE) / 9007199254740992.0 AS u")
    steps = detmath.gumbel_steps("u", "g")
    got = {
        r["id"]: (r["u"], r["g"])
        for r in detmath.apply_steps_spark(base, steps).select("id", "u", "g").collect()
    }
    inner = (
        "SELECT id, CAST(2*h + 1 AS DOUBLE) / 9007199254740992.0 AS u FROM ("
        "SELECT range AS id, CAST('0x' || substr(md5('g:' || range), 1, 13) AS BIGINT) AS h "
        f"FROM range({N}))"
    )
    duck = duckdb.sql(
        f"SELECT id, u, g FROM {detmath.wrap_steps_sql(inner, steps)}"
    ).fetchall()
    assert len(duck) == N
    for i, u, g in duck:
        su, sg = got[i]
        assert struct.pack("<d", su) == struct.pack("<d", u)
        assert struct.pack("<d", sg) == struct.pack("<d", g)
        assert abs(sg - (-math.log(-math.log(u)))) < 1e-9


def test_temperature_mixture_plan_limits_and_monotonicity(spark):
    """T=1 reproduces natural shares; larger T moves shares toward
    uniform (low-resource stratum strictly gains); rates stay in
    (0, 1] and the plan is deterministic across runs."""
    from orestes_spark.operators.sampling import temperature_mixture_plan

    docs = spark.createDataFrame(
        [(i, "en", "w " * 90) for i in range(9)]
        + [(100, "sw", "w " * 10)],
        "doc_id LONG, lang STRING, text STRING",
    )
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))

    def shares(t):
        return {
            r["stratum"]: (r["share"], r["sample_rate"])
            for r in temperature_mixture_plan(docs, "lang", toks, t).collect()
        }

    s1 = shares(1.0)  # natural token shares: en 810/820, sw 10/820
    assert abs(s1["en"][0] - 810 / 820) < 1e-6 and abs(s1["sw"][0] - 10 / 820) < 1e-6
    # natural mix: keep (essentially) all — the nano-quantized weights
    # put rates within 1e-9 of 1, not exactly 1
    assert s1["en"][1] > 1 - 1e-6 and s1["sw"][1] > 1 - 1e-6
    s3, s100 = shares(3.0), shares(100.0)
    assert s1["sw"][0] < s3["sw"][0] < s100["sw"][0]  # low-resource gains with T
    assert abs(s100["sw"][0] - 0.5) < 0.02            # T->inf: uniform
    assert s3["en"][1] < 1.0  # the dominant stratum is downsampled at T=3
    assert shares(3.0) == s3  # deterministic


def test_temperature_mixture_plan_realized_mixture_matches_shares(spark):
    """Round-10 ADVICE: the old per-stratum min(1.0, ...) cap silently
    executed a mixture that deviated from the p^(1/T) targets (every
    up-weighted stratum capped for T>1 while 'share' reported the
    target). Max-renormalized rates must make the realized token mix
    (rate·n_tokens) proportional to share EXACTLY, with the most
    up-weighted stratum pinned at rate 1.0."""
    from orestes_spark.operators.sampling import temperature_mixture_plan

    docs = spark.createDataFrame(
        [(i, "en", "w " * 90) for i in range(9)]
        + [(100, "sw", "w " * 10), (101, "de", "w " * 30)],
        "doc_id LONG, lang STRING, text STRING",
    )
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    rows = {r["stratum"]: r for r in temperature_mixture_plan(docs, "lang", toks, 3.0).collect()}
    # sw is the most up-weighted (smallest natural share): rate exactly 1
    assert rows["sw"]["sample_rate"] == 1.0
    assert all(0 < r["sample_rate"] <= 1.0 for r in rows.values())
    # realized tokens ∝ share, same constant across strata
    ratios = {
        s: r["sample_rate"] * r["n_tokens"] / r["share"] for s, r in rows.items()
    }
    vals = list(ratios.values())
    assert all(abs(v - vals[0]) / vals[0] < 1e-9 for v in vals), ratios


def test_temperature_mixture_plan_strata_cardinality_guard(spark):
    """A high-cardinality strata column must raise loudly instead of
    collecting unbounded rows to the driver (round-10 watch-item)."""
    import pytest

    from orestes_spark.operators.sampling import temperature_mixture_plan

    docs = spark.range(50).selectExpr(
        "id AS doc_id", "CAST(id AS STRING) AS url", "'a b c' AS text"
    )
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    with pytest.raises(ValueError, match="max_strata"):
        temperature_mixture_plan(docs, "url", toks, 2.0, max_strata=10)
    # at or under the cap it works
    assert temperature_mixture_plan(docs, "url", toks, 2.0, max_strata=50).count() == 50


def test_temperature_mixture_plan_drops_zero_token_strata(spark):
    """A stratum with zero (or all-NULL) tokens has nothing to sample
    and no defined share: it is dropped from the plan instead of
    dividing by it (the SQL twin filters n_tokens > 0 identically)."""
    from orestes_spark.operators.sampling import temperature_mixture_plan

    docs = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "xx", ""), (3, "yy", None)],
        "doc_id LONG, lang STRING, text STRING",
    )
    toks = F.when(
        F.length(F.trim(F.col("text"))) > 0,
        F.size(F.split(F.trim(F.col("text")), r"\s+")),
    ).otherwise(F.lit(0))
    rows = temperature_mixture_plan(docs, "lang", toks, 2.0).collect()
    assert {r["stratum"] for r in rows} == {"en"}
    assert rows[0]["share"] == 1.0


def test_stratified_topk_matches_plain_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from orestes_spark.operators import sampling

    rows = [(i, "big" if i % 3 else "small") for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id LONG, src STRING")
    got = sampling.stratified_topk(d, "doc_id", "src", 10)
    w = Window.partitionBy("src").orderBy(
        sampling.hash_prefix_long(F.col("doc_id"), "topk"), F.col("doc_id")
    )
    want = (
        d.withColumn("pos", F.row_number().over(w)).where(F.col("pos") <= 10)
    )
    assert sorted(map(tuple, got.select("src", "doc_id", "pos").collect())) == sorted(
        map(tuple, want.select("src", "doc_id", "pos").collect())
    )
    # deterministic across invocations
    again = sampling.stratified_topk(d, "doc_id", "src", 10)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))


def test_stratified_topk_starved_fallback_is_exact(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from orestes_spark.operators import sampling

    d = spark.createDataFrame(
        [(i, "only") for i in range(500)], "doc_id LONG, src STRING"
    )
    # oversample so tiny the prefilter threshold admits ~0 rows —
    # forces the starved-strata re-rank; output must still equal the
    # plain-window semantics exactly.
    got = sampling.stratified_topk(d, "doc_id", "src", 25, oversample=0.01)
    w = Window.partitionBy("src").orderBy(
        sampling.hash_prefix_long(F.col("doc_id"), "topk"), F.col("doc_id")
    )
    want = d.withColumn("pos", F.row_number().over(w)).where(F.col("pos") <= 25)
    assert sorted(map(tuple, got.select("doc_id", "pos").collect())) == sorted(
        map(tuple, want.select("doc_id", "pos").collect())
    )


def test_stratified_topk_small_stratum_keeps_all(spark):
    from orestes_spark.operators import sampling

    d = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id LONG, src STRING"
    )
    got = sampling.stratified_topk(d, "doc_id", "src", 5)
    assert got.count() == 3  # min(n, k) per stratum


def test_stratified_topk_cardinality_guard(spark):
    import pytest as _pytest

    from orestes_spark.operators import sampling

    d = spark.createDataFrame(
        [(i, str(i)) for i in range(30)], "doc_id LONG, src STRING"
    )
    with _pytest.raises(ValueError, match="max_strata"):
        sampling.stratified_topk(d, "doc_id", "src", 2, max_strata=10)
