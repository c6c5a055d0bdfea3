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


def test_wav_decode_roundtrip_real(spark):
    """synth_wav builds GENUINE RIFF/WAVE PCM; decode_audio parses it
    with the stdlib and recovers every parameter, with peak/rms
    computed from the actual samples (both exactly amp for the
    no-zero-crossing square wave)."""
    docs = spark.createDataFrame(
        [(1, "first audio doc"), (2, "second one")], "doc_id LONG, text STRING"
    )
    media = multimodal.attach_wav_binary(docs, "doc_id", "text")
    payloads = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert payloads[1][:4] == b"RIFF" and payloads[1][8:12] == b"WAVE"
    rows = {r["media_id"]: r for r in multimodal.wav_metadata(media).collect()}
    for mid, text in ((1, "first audio doc"), (2, "second one")):
        amp, rate, n_frames, _ = multimodal._wav_params(text)
        r = rows[mid]
        assert r["framerate"] == rate and r["n_frames"] == n_frames
        assert r["peak"] == amp and r["rms"] == amp
        assert r["n_bytes"] == len(payloads[mid]) == 44 + 2 * n_frames
        assert r["duration_ms"] == n_frames * 1000 // rate
        assert (r["channels"], r["sampwidth"]) == (1, 2)
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3\x03mp3 payloads need a codec lib")


def test_ppm_decode_roundtrip_and_real_resize(spark):
    """synth_ppm builds a genuine P6; decode_image parses header and
    pixel plane; resize_ppm is a REAL nearest-neighbor kernel whose
    output decodes to the target dims with source-sampled pixels; the
    resize operator dispatches P6 to it."""
    docs = spark.createDataFrame([(1, "an image doc")], "doc_id LONG, text STRING")
    media = multimodal.attach_ppm_binary(docs, "doc_id", "text")
    payload = bytes(media.collect()[0]["content"])
    m = multimodal.decode_image(payload)
    w, h, pattern = multimodal._ppm_params("an image doc")
    assert (m["width"], m["height"], m["maxval"]) == (w, h, 255)
    assert sum(m["pixels"]) == sum(pattern) * (3 * w * h // 16)
    meta = multimodal.ppm_metadata(media).collect()[0]
    assert meta["pixel_sum"] == sum(m["pixels"])
    assert meta["n_bytes"] == len(payload)
    # real resize through the operator (P6 dispatch)
    out = multimodal.resize(media, 8, 4).collect()[0]
    rm = multimodal.decode_image(bytes(out["content"]))
    assert (rm["width"], rm["height"]) == (8, 4)
    for y in range(4):
        for x in range(8):
            sx, sy = x * w // 8, y * h // 4
            assert (
                rm["pixels"][(y * 8 + x) * 3 : (y * 8 + x) * 3 + 3]
                == m["pixels"][(sy * w + sx) * 3 : (sy * w + sx) * 3 + 3]
            )


def test_bmp_header_decode():
    """A hand-built BITMAPINFOHEADER BMP decodes its dimensions from
    the little-endian struct — the third stdlib-parseable format."""
    import struct

    w, h, bpp = 17, 9, 24
    header = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + struct.pack(
        "<IiiHH", 40, w, -h, 1, bpp
    ) + b"\x00" * 24
    m = multimodal.decode_image(header)
    assert m == {"format": "bmp", "width": w, "height": h, "bpp": bpp}


def test_ppm_two_byte_maxval_refused():
    """Review round-10: maxval > 255 means 2-byte samples (PPM spec);
    decoding it as 1-byte samples would silently halve and misread the
    plane — refuse like the WAV path refuses sampwidth != 2."""
    import pytest

    payload = b"P6\n2 2\n65535\n" + bytes(24)
    with pytest.raises(NotImplementedError, match="2-byte samples"):
        multimodal.decode_image(payload)
