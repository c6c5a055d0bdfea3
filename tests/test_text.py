"""Text-analysis operator tests."""

from __future__ import annotations

import pytest

from orestes_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog sat in a house of cards"),
        (2, "der hund und die katze ist nicht das problem"),
        (3, "le chat et les chiens est la maison des amis"),
        (4, "el gato y los perros es una casa de cartas"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_lang_id(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs, "doc_id", "text").collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es"}


def test_token_count(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs, "doc_id", "text").collect()}
    assert got[1] == 11 and got[2] == 9


def test_quality_scores(docs):
    rows = {r["doc_id"]: r for r in text.quality_scores(docs, "doc_id", "text").collect()}
    r1 = rows[1]
    # "the" x2, "and", "a", "in", "of" → 6 stopwords of 11 tokens
    assert r1["stopword_ratio"] == pytest.approx(round(6 / 11, 6))
    assert r1["avg_token_len"] == pytest.approx(3.0)


def test_fingerprints_whitespace_invariant(spark):
    a = spark.createDataFrame(
        [(1, "hello world foo bar baz"), (2, "hello   world\tfoo bar baz")],
        "doc_id LONG, text STRING",
    )
    rows = text.fingerprints(a, "doc_id", "text").collect()
    fps = {r["doc_id"]: (r["fingerprint"], r["shingle_fingerprint"]) for r in rows}
    assert fps[1] == fps[2]
