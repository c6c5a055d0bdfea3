"""Multimodal columns: images/audio/video as opaque BINARY + typed
metadata, processed with Arrow-batched pandas transforms.

The container has no image/audio codecs, so the decode kernels are
STUBS: ``decode_image``/``decode_audio`` raise NotImplementedError
unless a codec library is importable, and ``fake_decode_meta`` provides
a deterministic md5-derived stand-in so the Spark-side plumbing —
schema, ``mapInPandas`` batch shape, partition behavior — is real and
testable end-to-end.

Scale notes: binary payloads ride through Arrow record batches;
``mapInPandas`` processes a partition as an iterator of batches so one
oversized image can't OOM the worker (batch size bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``). Decode is
per-row-independent → no shuffle at all; metadata extraction keeps
the binary column out of the output projection so downstream stages
never carry the payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id LONG, modality STRING, mime STRING, content BINARY"
)

META_SCHEMA = (
    "media_id LONG, modality STRING, mime STRING, n_bytes LONG, "
    "checksum STRING, width INT, height INT, duration_ms LONG"
)


def attach_fake_binary(docs: DataFrame, id_col: str, text_col: str, modality: str = "image") -> DataFrame:
    """Deterministic fake payload (utf-8 of the text) — stands in for a
    real binary column so the pipeline is drivable without codecs."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.col(text_col).cast("binary").alias("content"),
    )


def decode_image(content: bytes):  # pragma: no cover - stub
    """Real decode, gated on a codec library being present.

    Container audit (round 3, 2026-08): PIL, cv2, and imageio all
    remain unavailable (`import` raises ModuleNotFoundError), so this
    stays an honest environment stub; the Spark-side plumbing (schema,
    Arrow batching, partitioning) is real and oracle-tested via
    fake_decode_meta."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires a codec library (PIL) not present in this "
            "container; use fake_decode_meta for plumbing tests"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(content))


def fake_decode_meta(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: md5-derived (width, height,
    duration_ms). Matches the SQL-expressible oracle."""
    h = hashlib.md5(content).hexdigest()
    width = int(h[:4], 16) % 1024
    height = int(h[4:8], 16) % 1024
    duration = int(h[8:12], 16)
    return width, height, duration


def extract_metadata(media: DataFrame) -> DataFrame:
    """(media_id, modality, mime, n_bytes, checksum, width, height,
    duration_ms) via mapInPandas — the binary column is dropped from
    the output so downstream stages don't carry payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            meta = content.map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "mime": pdf["mime"],
                    "n_bytes": content.map(len).astype("int64"),
                    "checksum": content.map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": meta.map(lambda m: m[0]).astype("int32"),
                    "height": meta.map(lambda m: m[1]).astype("int32"),
                    "duration_ms": meta.map(lambda m: m[2]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, META_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling stub: emits (media_id, frame_idx, frame_ts_ms)
    rows derived from the fake duration — the explode/partition shape of
    a real frame sampler, without codecs."""
    meta = extract_metadata(media)
    return meta.select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.floor(F.col("duration_ms") / every_ms).cast("int")),
                lambda i: i * every_ms,
            )
        ).alias("frame_idx", "frame_ts_ms"),
    )


def fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a resize kernel: md5-chained pseudo
    pixels seeded by (content, target size), capped at 4 KiB so tests
    stay light. A real kernel drops in behind the same signature."""
    block = hashlib.md5(content + f":{width}x{height}".encode()).digest()
    n = min(width * height * 3, 4096)
    out = bytearray()
    while len(out) < n:
        block = hashlib.md5(block).digest()
        out.extend(block)
    return bytes(out[:n])


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Batch resize via mapInPandas: content is replaced by the resized
    payload (decode stubbed — fake_resize), target dims become columns.
    Per-row independent → no shuffle; payloads stream through bounded
    Arrow batches exactly like extract_metadata."""
    schema = (
        "media_id LONG, modality STRING, mime STRING, width INT, height INT, content BINARY"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "mime": pdf["mime"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "content": pdf["content"].map(lambda b: fake_resize(b, width, height)),
                }
            )

    return media.mapInPandas(batches, schema)


def fake_feature_vec(content: bytes, dims: int = 16) -> list[int]:
    """Deterministic md5-derived feature vector (one byte per dim,
    dims ≤ 16) — the oracle-expressible stand-in for an image/audio
    embedding model."""
    if not 1 <= dims <= 16:
        raise ValueError("dims must be in [1, 16]")
    h = hashlib.md5(content).hexdigest()
    return [int(h[2 * i : 2 * i + 2], 16) for i in range(dims)]


def feature_extract(media: DataFrame, dims: int = 16) -> DataFrame:
    """Feature extraction via mapInPandas: (media_id, dim, feature) —
    exploded so downstream joins/aggregates (and the driver's
    canonicalizer) never handle array cells. The model call is stubbed
    (fake_feature_vec); the Arrow batch shape, schema, and explode are
    the real pipeline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = pdf["content"].map(lambda b: fake_feature_vec(b, dims))
            flat = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].repeat(dims).reset_index(drop=True),
                    "dim": list(range(1, dims + 1)) * len(pdf),
                    "feature": [x for v in vecs for x in v],
                }
            )
            yield flat.astype({"media_id": "int64", "dim": "int32", "feature": "int32"})

    return media.mapInPandas(batches, "media_id LONG, dim INT, feature INT")
