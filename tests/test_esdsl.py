"""ES-DSL translator unit tests against an in-memory tags table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orestes_spark import esdsl

ROWS = [
    {"host": "a", "pop": "d"},
    {"host": "b", "pop": "e"},
    {"host": "c", "pop": "d", "extra": "1"},
    {"host": "a", "pop": "f"},
]


@pytest.fixture(scope="module")
def tags_df(spark):
    return spark.createDataFrame([(t,) for t in ROWS], "tags MAP<STRING,STRING>")


def matched(tags_df, query):
    rows = tags_df.where(esdsl.translate(query)).collect()
    return sorted(tuple(sorted(r["tags"].items())) for r in rows)


def expect(query_result, indices):
    exp = sorted(tuple(sorted(ROWS[i].items())) for i in indices)
    assert query_result == exp


def test_match_all(tags_df):
    expect(matched(tags_df, {"match_all": {}}), range(4))
    expect(matched(tags_df, None), range(4))


def test_term(tags_df):
    expect(matched(tags_df, {"term": {"host": "a"}}), [0, 3])


def test_terms(tags_df):
    expect(matched(tags_df, {"terms": {"pop": ["d", "e"]}}), [0, 1, 2])


def test_bool(tags_df):
    q = {"bool": {"must": [{"term": {"host": "a"}}], "must_not": [{"term": {"pop": "f"}}]}}
    expect(matched(tags_df, q), [0])
    q = {"bool": {"should": [{"term": {"host": "b"}}, {"term": {"pop": "f"}}]}}
    expect(matched(tags_df, q), [1, 3])


def test_must_not_missing_field_matches(tags_df):
    # rows without 'extra' must survive must_not on 'extra'
    q = {"bool": {"must_not": [{"term": {"extra": "1"}}]}}
    expect(matched(tags_df, q), [0, 1, 3])


def test_range_exists_prefix_wildcard(tags_df):
    expect(matched(tags_df, {"range": {"host": {"gte": "b"}}}), [1, 2])
    expect(matched(tags_df, {"exists": {"field": "extra"}}), [2])
    expect(matched(tags_df, {"missing": {"field": "extra"}}), [0, 1, 3])
    expect(matched(tags_df, {"prefix": {"pop": "d"}}), [0, 2])
    expect(matched(tags_df, {"wildcard": {"host": "?"}}), range(4))
    expect(matched(tags_df, {"wildcard": {"pop": "[d]"}}), [])  # literal, not regex


def test_filtered_wrapper_and_legacy(tags_df):
    expect(matched(tags_df, {"filtered": {"filter": {"term": {"host": "a"}}}}), [0, 3])
    expect(matched(tags_df, {"not": {"term": {"host": "a"}}}), [1, 2])
    expect(matched(tags_df, {"and": [{"term": {"host": "a"}}, {"term": {"pop": "d"}}]}), [0])
    expect(matched(tags_df, {"or": [{"term": {"host": "b"}}, {"term": {"host": "c"}}]}), [1, 2])


def test_implicit_top_level_and(tags_df):
    expect(matched(tags_df, {"term": {"host": "a"}, "prefix": {"pop": "d"}}), [0])


def test_unsupported_raises():
    with pytest.raises(esdsl.UnsupportedDslError):
        esdsl.translate({"fuzzy": {"host": "a"}})
    with pytest.raises(esdsl.UnsupportedDslError):
        esdsl.translate({"range": {"host": {"weird": 1}}})


def test_flat_resolver(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id INT, name STRING")
    r = esdsl.flat_resolver(df.columns)
    assert df.where(esdsl.translate({"term": {"id": 1}}, r)).count() == 1
    # unknown field resolves to NULL, not an error (A3 semantics)
    assert df.where(esdsl.translate({"exists": {"field": "nope"}}, r)).count() == 0
