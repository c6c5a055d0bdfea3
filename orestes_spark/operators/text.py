"""Text-analysis operators: language ID, quality scoring, token
counting, fingerprinting. All pure built-in SQL functions (codegen'd,
no Python in the loop) and engine-portable for oracle checking.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from orestes_spark.operators.dedup import normalize_text

# Marker stop-words per language for the n-gram/stop-word language-ID
# heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "des", "est"],
    "es": ["el", "los", "las", "y", "es", "una"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def _tokens(text_col: F.Column) -> F.Column:
    return F.split(normalize_text(text_col), r"\s+")


def token_count(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.size(_tokens(F.col(text_col))).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_scores(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / avg-token-length / stopword-ratio heuristics — the gate
    columns an LLM-data pipeline filters on."""
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(F.length(F.regexp_replace(text_col, " ", "")) * 1.0 / n_tokens, 6).alias("avg_token_len"),
        F.round(F.size(F.filter(toks, lambda x: F.array_contains(stop, x))) * 1.0 / n_tokens, 6).alias(
            "stopword_ratio"
        ),
    )


def lang_scores(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang, score): marker-word hit count per candidate language."""
    toks = _tokens(F.col(text_col))
    frames = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        frames.append(
            docs.select(
                F.col(id_col).alias("_id"),
                F.lit(lang).alias("lang"),
                F.size(F.filter(toks, lambda x: F.array_contains(marker_arr, x))).alias("score"),
            )
        )
    return reduce(DataFrame.unionAll, frames)


def lang_id(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Argmax language with deterministic tiebreak (score desc, lang
    asc). Output (id, pred_lang, score)."""
    scores = lang_scores(docs, id_col, text_col)
    w = Window.partitionBy("_id").orderBy(F.col("score").desc(), F.col("lang"))
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("_id").alias(id_col), F.col("lang").alias("pred_lang"), "score")
    )


def fingerprints(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprints: md5 of whitespace-normalized text plus the
    min-shingle rolling fingerprint (robust to trailing edits).

    ``norm``/``toks`` are materialized as columns BEFORE the
    higher-order transform: an expression referenced inside a lambda is
    re-evaluated per array element (no common-subexpression elimination
    across the lambda boundary), which made the naive version O(tokens²)
    regex splits — 17× slower at sf0.1."""
    norm = F.regexp_replace(normalize_text(F.col(text_col)), r"\s+", " ")
    staged = docs.select(F.col(id_col), norm.alias("_norm"), F.split(norm, " ").alias("_toks"))
    toks = F.col("_toks")
    # min over md5s of 3-token shingles — a 1-hash MinHash
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))
    shingle_hashes = F.transform(
        idx,
        lambda i: F.md5(F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]).cast("binary")),
    )
    return staged.select(
        F.col(id_col),
        F.md5(F.col("_norm").cast("binary")).alias("fingerprint"),
        F.array_min(shingle_hashes).alias("shingle_fingerprint"),
    )
