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
