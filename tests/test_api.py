"""API-layer tests mirroring the reference's http-api.spec response
shapes."""

from __future__ import annotations

import pytest

from orestes_spark.api import ApiError, handle_request

START = 1_700_000_000_000


@pytest.fixture()
def loaded(engine):
    pts = [
        {"time": START + i, "value": float(i), "host": "ab"[i % 2]} for i in range(10)
    ]
    assert handle_request(engine, "write", pts) == {"errors": []}
    return engine


def test_read_shape(loaded):
    out = handle_request(loaded, "read", {"query": {"term": {"host": "a"}}, "start": 0, "end": START + 100})
    assert set(out) == {"series"}
    (s,) = out["series"]
    assert s["tags"] == {"host": "a"}
    assert s["points"] == [[START + i, float(i)] for i in range(0, 10, 2)]


def test_count_shape_and_agg_validation(loaded):
    out = handle_request(loaded, "read", {"aggregations": [{"type": "count"}], "end": START + 100})
    assert sorted((s["tags"]["host"], s["count"]) for s in out["series"]) == [("a", 5), ("b", 5)]
    with pytest.raises(ApiError) as e:
        handle_request(loaded, "read", {"aggregations": [{"type": "avg"}]})
    assert e.value.status == 400


def test_series_and_select_distinct_shapes(loaded):
    out = handle_request(loaded, "series", {})
    assert sorted(t["host"] for t in out["series"]) == ["a", "b"]
    combos = handle_request(loaded, "select_distinct", {"keys": ["host", "nope"]})
    assert sorted((c["host"], c["nope"]) for c in combos) == [("a", None), ("b", None)]
    with pytest.raises(ApiError):
        handle_request(loaded, "select_distinct", {})


def test_write_error_shape(engine):
    out = handle_request(engine, "write", [{"value": 1}])
    assert out["errors"][0]["error"] == 'missing required keys: ["time"]'


def test_delete_and_errors(loaded):
    out = handle_request(loaded, "delete", {"keep_days": 0})
    assert out["ok"] and out["dropped_buckets"]
    with pytest.raises(ApiError) as e:
        handle_request(loaded, "read", {"query": {"fuzzy": {"host": "a"}}})
    assert e.value.status == 400
    with pytest.raises(ApiError) as e:
        handle_request(loaded, "nope", {})
    assert e.value.status == 404
