"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct. The Spark-side machinery — schema, Arrow batch shape,
mapInPandas signature, partition behavior — is real and tested; the actual
codec work is stubbed behind ``_decode_image`` because this container ships
no image/audio libraries: with PIL/ffmpeg present, only that function body
changes (drop-in), nothing in the plan does.

Decode stub contract: deterministic pseudo-features derived from the bytes
(magic sniff, length, xxhash-based fake dimensions) so tests can assert
exact values end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("media_kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_MAGIC = [
    (b"%PDF", "pdf"),
    (b"%SHEET", "sheet"),
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"<!DO", "html"),
    (b"<htm", "html"),
]

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def sniff_kind(payload: bytes) -> str:
    for magic, kind in _MAGIC:
        if payload[: len(magic)] == magic:
            return kind
    return "bin"


def _decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Image decode: real PIL branch when the library is importable
    (drop-in — nothing in the plan changes), else a deterministic stub.

    Stub contract (this container ships no image libs): dimensions + an
    8-dim feature derived from a sha256 of the payload, so plumbing tests
    have exact expected values. An undecodable payload under PIL degrades
    to the stub rather than failing the task (row-level containment)."""
    if HAVE_PIL:  # pragma: no cover - not present in this container
        import io

        try:
            img = PIL.Image.open(io.BytesIO(payload))
            width, height = img.size
            # 8-dim feature: mean pixel intensity of an 8-slice column split
            # on the greyscale thumbnail (deterministic, resampling fixed)
            thumb = img.convert("L").resize((8, 8), PIL.Image.BILINEAR)
            cols = list(thumb.getdata())
            feature = [
                round(sum(cols[i::8]) / (8 * 255.0), 6) for i in range(8)
            ]
            return width, height, feature
        except Exception:
            pass  # malformed image → deterministic stub below
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feature = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, feature


def _media_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for url, payload in zip(pdf["url"], pdf["html"]):
            data = bytes(payload) if payload is not None else b""
            kind = sniff_kind(data)
            width = height = None
            feature = None
            if kind in ("png", "jpeg", "gif"):
                width, height, feature = _decode_image(data)
            rows.append((url, len(data), kind, width, height, feature))
        yield pd.DataFrame(
            rows,
            columns=["url", "n_bytes", "media_kind", "width", "height", "feature"],
        )


def media_metadata(pages: DataFrame) -> DataFrame:
    """pages(url, html, …) → typed media metadata. One mapInPandas pass;
    binary stays in Arrow buffers end to end (no base64 round-trips — the
    reference's encodeImageToBase64 exists only to feed HTTP APIs,
    node-zerox/src/utils/image.ts:13-15; a columnar engine never needs it)."""
    return pages.select("url", "html").mapInPandas(
        _media_iter, schema=MEDIA_META_SCHEMA
    )
