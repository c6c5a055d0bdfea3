"""Deduplication operators for large-scale text pipelines.

All of these are pure DataFrame compositions (no Python UDFs): hashing
is ``md5`` (portable: identical output in any engine, which is what the
DuckDB oracle checks), candidate generation is join-based, and every
shuffle key is chosen so the heavy joins are equi-joins Catalyst can
plan as shuffle-hash / sort-merge with AQE skew handling.

Scale notes (100 TB):
  - exact_dedup shuffles only (fingerprint, id) pairs, never the text;
  - minhash_lsh shuffles shingle→(doc, shingle-hash) pairs; band
    buckets are tiny; the exact-Jaccard verify join touches only
    candidate pairs (LSH guarantees those are rare);
  - stop-shingle removal (drop shingles appearing in > max_df docs)
    bounds the inverted-index skew the same way stop-words bound a
    text index — without it one hot shingle produces a quadratic
    bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col: F.Column) -> F.Column:
    return F.trim(F.lower(col))


def tokens_with_pos(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, tok) — one row per whitespace token."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(normalize_text(F.col(text_col)), r"\s+")).alias("pos", "tok"),
    )


def token_shingles(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct n-token shingles per doc: (id, sh)."""
    toks = tokens_with_pos(docs, id_col, text_col)
    w = Window.partitionBy("_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    return (
        toks.select("_id", F.concat_ws(" ", *parts).alias("sh"), parts[-1].alias("_last"))
        .where(F.col("_last").isNotNull())
        .select("_id", "sh")
        .distinct()
    )


def exact_dedup(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash:
    (fingerprint, keeper_id, n_copies)."""
    return (
        docs.select(F.md5(F.col(text_col).cast("binary")).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def jaccard_pairs(
    shingles: DataFrame, threshold: float, candidates: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard over (id, sh) sets → (id_a, id_b, jaccard≥threshold).

    ``candidates`` (id_a, id_b) restricts the verify join (the LSH
    path); without it, pairs come from the inverted-index self-join —
    exact but quadratic in the per-shingle doc frequency.
    """
    sizes = shingles.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    if candidates is None:
        inter = (
            shingles.alias("a")
            .join(shingles.alias("b"), "sh")
            .where(F.col("a._id") < F.col("b._id"))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sh_a = shingles.select(F.col("_id").alias("id_a"), "sh")
        sh_b = shingles.select(F.col("_id").alias("id_b"), "sh")
        inter = (
            candidates.join(sh_a, "id_a")
            .join(sh_b, ["id_b", "sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 8) -> DataFrame:
    """MinHash via k salted md5s: h_i = min(md5('<i>:' || shingle)).
    Lexicographic min over hex strings — engine-portable, no seed
    tables to ship."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")).cast("binary"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy("_id").agg(*aggs)


def minhash_band_candidates(sig: DataFrame, num_hashes: int, rows_per_band: int) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair. Returns distinct (id_a, id_b), id_a < id_b."""
    bands = num_hashes // rows_per_band
    stack_args = []
    for b in range(bands):
        cols = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        stack_args.append(f"{b}, concat({', '.join(cols)})")
    banded = sig.select(
        "_id", F.expr(f"stack({bands}, {', '.join(stack_args)}) as (band, bval)")
    )
    a, b = banded.toDF("id_a", "band", "bval"), banded.toDF("id_b", "band", "bval")
    return (
        a.join(b, ["band", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash → LSH bands → exact-Jaccard verify: the standard
    near-dup pipeline. Output (id_a, id_b, jaccard)."""
    sh = token_shingles(docs, id_col, text_col, shingle_size)
    sig = minhash_signatures(sh, num_hashes)
    cands = minhash_band_candidates(sig, num_hashes, rows_per_band)
    return jaccard_pairs(sh, threshold, cands)


def char_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """Distinct character n-grams per doc: (id, sh)."""
    d = docs.select(F.col(id_col).alias("_id"), normalize_text(F.col(text_col)).alias("_norm"))
    return (
        d.select(
            "_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("_norm") - n + 1, F.lit(1))),
                    lambda i: F.col("_norm").substr(i, F.lit(n)),
                )
            ).alias("sh"),
        )
        .distinct()
    )


def ngram_jaccard_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 5,
    threshold: float = 0.7,
    max_df: int | None = None,
    min_grams: int = 1,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup: candidate pairs come from an
    inverted-index join on *rare* grams only (document frequency ≤
    max_df — bounds fan-out, the linear-vs-quadratic knob at 100 TB),
    but Jaccard is verified exactly over the FULL gram sets of each
    candidate pair. Semantics: all pairs with full-set Jaccard ≥
    threshold that share at least one rare gram — near-dups virtually
    always do, stop-gram-only pairs never join. ``min_grams`` excludes
    docs with fewer total grams than the floor."""
    sh = char_ngrams(docs, id_col, text_col, ngram)
    if min_grams > 1:
        big = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n")).where(F.col("n") >= min_grams)
        sh = sh.join(big.select("_id"), "_id", "left_semi")
    if max_df is None:
        return jaccard_pairs(sh, threshold)
    rare = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= max_df)
    sh_rare = sh.join(rare.select("sh"), "sh", "left_semi")
    cands = (
        sh_rare.select(F.col("_id").alias("id_a"), "sh")
        .join(sh_rare.select(F.col("_id").alias("id_b"), "sh"), "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return jaccard_pairs(sh, threshold, cands)


def simhash_signatures(docs: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """32-bit SimHash from md5 hex-digit parities: per token, bit i is
    the parity of hex digit i of md5('sh:'||tok); signature bit =
    sign of the +1/-1 vote sum. Pure SQL arithmetic — portable to the
    oracle. Output (id, simhash BIGINT)."""
    toks = tokens_with_pos(docs, id_col, text_col).select("_id", "tok")
    h = F.md5(F.concat(F.lit("sh:"), F.col("tok")).cast("binary"))
    toks = toks.withColumn("_h", h)
    bit_votes = [
        F.sum(
            (F.instr(F.lit("13579bdf"), F.substring(F.col("_h"), i + 1, 1)) > 0).cast("int") * 2 - 1
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    votes = toks.groupBy("_id").agg(*bit_votes)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"v{i}") >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select(F.col("_id"), sig.alias("simhash"))


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3, bits: int = 32, band_bits: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidates via band-LSH on the signature (pigeonhole: distance ≤ 3
    over 4 bands of 8 bits ⇒ at least one band equal), then exact
    bit_count verify — never an all-pairs scan."""
    bands = bits // band_bits
    mask = (1 << band_bits) - 1
    stack_args = ", ".join(
        f"{b}, cast(shiftright(simhash, {b * band_bits}) & {mask} as long)" for b in range(bands)
    )
    banded = sig.select("_id", "simhash", F.expr(f"stack({bands}, {stack_args}) as (band, bval)"))
    a = banded.toDF("id_a", "sig_a", "band", "bval")
    b = banded.toDF("id_b", "sig_b", "band", "bval")
    return (
        a.join(b, ["band", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
