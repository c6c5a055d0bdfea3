"""Multimodal plumbing tests (decode is stubbed; the Spark shapes are
real)."""

from __future__ import annotations

import hashlib

import pytest

from orestes_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "another payload"), (3, "x")],
        "doc_id LONG, text STRING",
    )
    return multimodal.attach_fake_binary(docs, "doc_id", "text")


def test_schema_and_checksum(media):
    out = multimodal.extract_metadata(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert rows[1]["checksum"] == hashlib.md5(b"hello world").hexdigest()
    w, h, d = multimodal.fake_decode_meta(b"hello world")
    assert (rows[1]["width"], rows[1]["height"], rows[1]["duration_ms"]) == (w, h, d)
    assert 0 <= rows[1]["width"] < 1024


def test_binary_column_not_in_meta_output(media):
    assert "content" not in multimodal.extract_metadata(media).columns


def test_frame_sample_counts(media):
    frames = multimodal.frame_sample(media, every_ms=1000)
    rows = frames.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_ts_ms"]))
    for mid, fs in by_id.items():
        fs.sort()
        assert fs[0] == (0, 0)
        assert all(ts == idx * 1000 for idx, ts in fs)


def test_real_decode_is_gated():
    try:
        import PIL  # noqa: F401

        pytest.skip("codec present in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_resize_replaces_content_deterministically(spark):
    from orestes_spark.operators import multimodal

    docs = spark.createDataFrame([(1, "hello"), (2, "world")], "doc_id LONG, text STRING")
    media = multimodal.attach_fake_binary(docs, "doc_id", "text")
    out = {r["media_id"]: r for r in multimodal.resize(media, 32, 24).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert (r["width"], r["height"]) == (32, 24)
        assert len(bytes(r["content"])) == 32 * 24 * 3
    again = {r["media_id"]: bytes(r["content"]) for r in multimodal.resize(media, 32, 24).collect()}
    assert {k: bytes(v["content"]) for k, v in out.items()} == again  # reproducible
    other = {r["media_id"]: bytes(r["content"]) for r in multimodal.resize(media, 8, 8).collect()}
    assert other[1] != again[1]  # size participates in the derivation


def test_feature_extract_matches_python_kernel(spark):
    from orestes_spark.operators import multimodal

    docs = spark.createDataFrame([(7, "some text")], "doc_id LONG, text STRING")
    media = multimodal.attach_fake_binary(docs, "doc_id", "text")
    rows = multimodal.feature_extract(media, dims=16).collect()
    assert len(rows) == 16
    got = [r["feature"] for r in sorted(rows, key=lambda r: r["dim"])]
    assert got == multimodal.fake_feature_vec("some text".encode(), 16)
