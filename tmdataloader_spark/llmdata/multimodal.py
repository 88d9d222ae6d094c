"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

Codec availability is environment-dependent, so every operator has
two paths through the SAME mapInPandas seam:

- ``fake=True`` (default in this container): a deterministic fake
  decoder derives metadata/payloads from the content digest — stable
  across runs, engines, and partitionings, so the plumbing (schema,
  batch iteration, partitioning, 1→N frame explode) is fully tested
  without codecs.
- ``fake=False``: REAL decoding — PIL (Pillow) when importable (any
  format it knows); when PIL is absent the vendored from-scratch PNG
  codec (functions/png.py, stdlib zlib + numpy) covers the PNG
  subset, so the real path runs on real bytes even in this
  codec-less container. Video frame extraction stays an honest
  ``NotImplementedError`` — it needs ffmpeg, which has no
  Python-only fallback.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _pil_image():
    """Pillow's Image module, or None when Pillow is absent (the
    vendored pure-Python PNG codec then covers the PNG subset)."""
    try:
        from PIL import Image

        return Image
    except ImportError:  # pragma: no cover - environment-dependent
        return None


def _image_size(content: bytes) -> tuple[int, int] | None:
    """(width, height) of real image bytes, or None when undecodable.
    PIL when importable (any format it knows); otherwise the vendored
    PNG codec (functions/png.py) — header-only parse, no inflate."""
    import io

    Image = _pil_image()
    if Image is not None:
        try:
            with Image.open(io.BytesIO(content)) as im:
                return im.size
        except Exception:
            return None
    from tmdataloader_spark.functions import png

    try:
        return png.png_size(content)
    except Exception:
        return None


def _resize_bytes(content: bytes, width: int, height: int) -> bytes | None:
    """Decode → bilinear resize → PNG re-encode, or None when
    undecodable. PIL path for any format it knows; the vendored codec
    handles the PNG subset when Pillow is absent."""
    import io

    Image = _pil_image()
    if Image is not None:
        try:
            with Image.open(io.BytesIO(content)) as im:
                buf = io.BytesIO()
                im.resize((width, height)).save(buf, format="PNG")
                return buf.getvalue()
        except Exception:
            return None
    from tmdataloader_spark.functions import png

    try:
        arr = png.decode_png(content)
        return png.encode_png(png.resize_bilinear(arr, width, height))
    except Exception:
        return None

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


def fake_decode_columns(
    content_col: str = "content", media_type_col: str = "media_type"
) -> list:
    """The deterministic fake-decode metadata as pure JVM columns
    (``sha2``/``length``/``conv(substring(...))`` — whole-stage
    codegen, mirrors ``_fake_decode`` bit-for-bit). Shared by
    ``decode_media(fake=True)`` and the one-scan ``text_signals``
    projection so the two gates can never drift apart."""
    content = F.coalesce(F.col(content_col), F.lit(b""))
    sha = F.sha2(content, 256)
    byte = lambda pos: F.conv(F.substring(sha, pos, 2), 16, 10).cast("int")  # noqa: E731
    return [
        F.length(content).cast("long").alias("n_bytes"),
        sha.alias("sha256"),
        (F.lit(64) + byte(1) % 192).alias("width"),
        (F.lit(64) + byte(3) % 192).alias("height"),
        F.when(
            F.col(media_type_col).isin("audio", "video"),
            F.conv(F.substring(sha, 5, 4), 16, 10).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("duration_ms"),
    ]


def decode_media(df: DataFrame, fake: bool = True, use_arrow: bool = False) -> DataFrame:
    """Decode/feature-extract media rows.

    - ``fake=True, use_arrow=False`` (default): the deterministic fake
      metadata is fully expressible JVM-side (``sha2``, ``length``,
      ``conv(substring(...))``) — no Python in the hot path, whole-stage
      codegen end to end.
    - ``use_arrow=True``: the same output through the Arrow-batched
      ``mapInPandas`` plumbing a REAL codec would use (vectorized over
      the batch, not row-at-a-time) — this is the integration point
      where PIL/ffmpeg plugs in.
    - ``fake=False``: REAL decode — PIL reads image dimensions when
      importable; without PIL the vendored pure-Python PNG codec
      (functions/png.py) covers the PNG subset, so this path runs in
      codec-less CI on real bytes.  Audio rows are header-probed by
      the vendored RIFF/WAVE parser (functions/wav.py) for a real
      duration_ms the same way.  Rows whose bytes none of those can
      parse (or video media, which would need ffmpeg) get NULL
      width/height/duration_ms; n_bytes/sha256 are always computed."""
    if not fake:

        def real_batches(it):
            import pandas as pd

            from tmdataloader_spark.functions.wav import wav_duration_ms

            for pdf in it:
                contents = [
                    bytes(c) if c is not None else b"" for c in pdf["content"]
                ]
                widths, heights, durations = [], [], []
                for c, mtype in zip(contents, pdf["media_type"]):
                    size = _image_size(c) if mtype == "image" and c else None
                    widths.append(size[0] if size else None)
                    heights.append(size[1] if size else None)
                    durations.append(
                        wav_duration_ms(c) if mtype == "audio" and c else None
                    )
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].astype("int64"),
                        "media_type": pdf["media_type"],
                        "n_bytes": [len(c) for c in contents],
                        "sha256": [hashlib.sha256(c).hexdigest() for c in contents],
                        "width": pd.array(widths, dtype="Int32"),
                        "height": pd.array(heights, dtype="Int32"),
                        "duration_ms": pd.array(durations, dtype="Int64"),
                    }
                )

        return df.select("media_id", "media_type", "content").mapInPandas(
            real_batches, schema=DECODED_SCHEMA
        )
    if not use_arrow:
        return df.select("media_id", "media_type", *fake_decode_columns())

    def batches(it):
        import pandas as pd

        for pdf in it:
            contents = [
                bytes(c) if c is not None else b"" for c in pdf["content"]
            ]
            decoded = [
                _fake_decode(c, t) for c, t in zip(contents, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) for c in contents],
                    "sha256": [hashlib.sha256(c).hexdigest() for c in contents],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "duration_ms": [d[2] for d in decoded],
                }
            )

    return df.select("media_id", "media_type", "content").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize plumbing: (media_id, media_type, content) → same schema
    with resized content and target dims. Arrow-batched ``mapInPandas``
    — the batch loop is where PIL's ``Image.resize`` plugs in; the
    fake kernel emits a deterministic digest-derived payload of
    ``width·height`` bytes so tests can assert sizes and stability.

    ``fake=False``: decodes each image, resizes to (width, height)
    with bilinear resampling, re-encodes as PNG — via PIL when
    importable, else the vendored PNG codec (functions/png.py);
    undecodable rows pass through with NULL content."""
    if not fake:

        def real_batches(it):
            import pandas as pd

            for pdf in it:
                out = []
                for c in pdf["content"]:
                    b = bytes(c) if c is not None else b""
                    out.append(_resize_bytes(b, width, height) if b else None)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].astype("int64"),
                        "media_type": pdf["media_type"],
                        "content": out,
                        "width": width,
                        "height": height,
                    }
                )

        return df.select("media_id", "media_type", "content").mapInPandas(
            real_batches,
            schema="media_id long, media_type string, content binary, width int, height int",
        )
    n_out = width * height

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = []
            for c in pdf["content"]:
                b = bytes(c) if c is not None else b""
                digest = hashlib.sha256(b + f":{width}x{height}".encode()).digest()
                out.append((digest * (n_out // len(digest) + 1))[:n_out])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "content": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "media_type", "content").mapInPandas(
        batches,
        schema="media_id long, media_type string, content binary, width int, height int",
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 32, fake: bool = True
) -> DataFrame:
    """Frame sampling plumbing: one video row → one row per sampled
    frame (media_id, frame_idx, ts_ms, frame). The 1→N batch shape is
    the ``mapInPandas`` equivalent of a UDTF explode — where ffmpeg
    frame extraction plugs in. The fake kernel derives the frame count
    from the fake-decoded duration and each frame payload from
    sha256(content ‖ idx) — deterministic across partitionings.

    ``fake=False`` stays stubbed: frame extraction needs ffmpeg (PIL
    cannot demux video), which has no Python-only fallback."""
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg (PIL cannot demux video); "
            "run with fake=True to exercise the 1->N batch plumbing"
        )

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for mid, mtype, c in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                if mtype != "video":
                    continue
                b = bytes(c) if c is not None else b""
                _, _, dur = _fake_decode(b, "video")
                n = min(max_frames, max(1, dur // every_ms))
                for i in range(n):
                    ids.append(int(mid))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(hashlib.sha256(b + f":frame:{i}".encode()).digest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.select("media_id", "media_type", "content").mapInPandas(
        batches, schema="media_id long, frame_idx int, ts_ms long, frame binary"
    )


AUDIO_PROBE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, audio_format int, "
    "channels int, sample_rate int, bits_per_sample int, n_frames long, "
    "duration_ms long"
)


def probe_audio(df: DataFrame) -> DataFrame:
    """REAL audio metadata for audio ``binary`` columns: one row per
    input row with the RIFF/WAVE header fields (format code, channel
    count, sample rate, bit depth, frame count, duration) parsed by
    the vendored functions/wav.py — the audio twin of the PNG real
    decode, runnable in codec-less CI.  Non-audio rows and bytes the
    parser rejects (non-WAV containers — ffmpeg territory) degrade to
    NULL metadata, never an error.  Arrow-batched ``mapInPandas``:
    the header parse touches only the first few dozen bytes per row,
    so the batch loop is allocation-bound, not decode-bound."""

    def batches(it):
        import pandas as pd

        from tmdataloader_spark.functions.wav import wav_info

        for pdf in it:
            rows = {
                k: []
                for k in (
                    "audio_format",
                    "channels",
                    "sample_rate",
                    "bits_per_sample",
                    "n_frames",
                    "duration_ms",
                )
            }
            contents = [
                bytes(c) if c is not None else b"" for c in pdf["content"]
            ]
            for c, mtype in zip(contents, pdf["media_type"]):
                info = None
                if mtype == "audio" and c:
                    try:
                        info = wav_info(c)
                    except ValueError:
                        info = None
                rows["audio_format"].append(info.audio_format if info else None)
                rows["channels"].append(info.channels if info else None)
                rows["sample_rate"].append(info.sample_rate if info else None)
                rows["bits_per_sample"].append(
                    info.bits_per_sample if info else None
                )
                rows["n_frames"].append(info.n_frames if info else None)
                rows["duration_ms"].append(info.duration_ms if info else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) for c in contents],
                    "audio_format": pd.array(rows["audio_format"], dtype="Int32"),
                    "channels": pd.array(rows["channels"], dtype="Int32"),
                    "sample_rate": pd.array(rows["sample_rate"], dtype="Int32"),
                    "bits_per_sample": pd.array(
                        rows["bits_per_sample"], dtype="Int32"
                    ),
                    "n_frames": pd.array(rows["n_frames"], dtype="Int64"),
                    "duration_ms": pd.array(rows["duration_ms"], dtype="Int64"),
                }
            )

    return df.select("media_id", "media_type", "content").mapInPandas(
        batches, schema=AUDIO_PROBE_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, media_type string, sample_rate int, duration_ms long, "
    "rms double, peak double, zero_crossing_rate double"
)


def audio_features(df: DataFrame) -> DataFrame:
    """Signal-level features from REAL audio bytes — the step after
    ``probe_audio`` that a training-data pipeline filters on
    (silence/clipping screens, energy-based quality buckets): per
    audio row, RMS level, peak level, and zero-crossing rate of the
    decoded waveform, plus sample_rate/duration_ms from the header.

    Samples decode via the vendored WAV codec (functions/wav.py) and
    normalize to [−1, 1] by the dtype's full scale before measuring,
    so an 8-bit and a 16-bit render of the same signal score the
    same.  Multi-channel audio is averaged to mono first (the usual
    mixdown).  All three features are NumPy-vectorized per row inside
    an Arrow-batched ``mapInPandas`` and 6dp-rounded; rows the codec
    rejects (non-WAV audio, non-audio media) come back with NULL
    features, never an error.

    100 TB shape: embarrassingly parallel per-row work, no shuffle;
    the decode touches each payload once and holds one waveform at a
    time per batch row."""

    def batches(it):
        import numpy as np
        import pandas as pd

        from tmdataloader_spark.functions.wav import decode_wav

        full_scale = {8: 128.0, 16: 32768.0, 24: 8388608.0, 32: 2147483648.0}
        for pdf in it:
            out = {
                k: []
                for k in (
                    "sample_rate",
                    "duration_ms",
                    "rms",
                    "peak",
                    "zero_crossing_rate",
                )
            }
            for c, mtype in zip(pdf["content"], pdf["media_type"]):
                b = bytes(c) if c is not None else b""
                info = samples = None
                if mtype == "audio" and b:
                    try:
                        info, samples = decode_wav(b)
                    except ValueError:
                        info = samples = None
                if info is None or samples.size == 0:
                    for k in out:
                        out[k].append(None)
                    continue
                if info.audio_format == 1:
                    offset = 128.0 if info.bits_per_sample == 8 else 0.0
                    x = (samples.astype(np.float64) - offset) / full_scale[
                        info.bits_per_sample
                    ]
                else:
                    x = samples.astype(np.float64)
                mono = x.mean(axis=1)
                crossings = (
                    int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if len(mono) > 1
                    else 0
                )
                out["sample_rate"].append(info.sample_rate)
                out["duration_ms"].append(info.duration_ms)
                out["rms"].append(round(float(np.sqrt(np.mean(mono**2))), 6))
                out["peak"].append(round(float(np.max(np.abs(mono))), 6))
                out["zero_crossing_rate"].append(
                    round(crossings / max(len(mono) - 1, 1), 6)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                    "rms": pd.array(out["rms"], dtype="Float64"),
                    "peak": pd.array(out["peak"], dtype="Float64"),
                    "zero_crossing_rate": pd.array(
                        out["zero_crossing_rate"], dtype="Float64"
                    ),
                }
            )

    return df.select("media_id", "media_type", "content").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
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
