"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the decode step is
STUBBED: `decode_media` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derives
metadata from the bytes. The Spark-side plumbing — schema, batch
iteration, partitioning — is real and tested; swapping in PIL/ffmpeg
is a one-function change.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source_uri", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha256 string, "
    "width int, height int, duration_ms long"
)


def _fake_decode(content: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions/duration derived from the
    content digest — stable across runs, engines, and partitionings."""
    digest = hashlib.sha256(content).digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    dur = int.from_bytes(digest[2:4], "big") if media_type in ("audio", "video") else 0
    return w, h, dur


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched
    ``mapInPandas``. Real decoding is STUBBED (no codecs in this
    environment); ``fake=True`` runs the deterministic fake decoder
    through the identical plumbing."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not available in this "
            "container; run with fake=True to exercise the pipeline"
        )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                w, h, dur = _fake_decode(content, r["media_type"])
                rows.append(
                    (
                        int(r["media_id"]),
                        r["media_type"],
                        len(content),
                        hashlib.sha256(content).hexdigest(),
                        w,
                        h,
                        dur,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "n_bytes", "sha256",
                    "width", "height", "duration_ms",
                ],
            )

    return df.select("media_id", "media_type", "content").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter for testing: treat document text bytes as opaque media
    content (utf-8), exercising the binary-column path end-to-end."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("string").alias("source_uri"),
        ).alias("meta"),
    )
