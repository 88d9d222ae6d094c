"""Minimal from-scratch RIFF/WAVE header parser + PCM codec —
stdlib ``struct`` + numpy only, no audio library.

Exists so the multimodal ``fake=False`` real-decode path
(llmdata/multimodal.py) can return REAL sample-rate/duration for
audio ``binary`` columns in codec-less environments, the way the
vendored PNG codec (functions/png.py) gives image columns real
dimensions: ffmpeg reads every container where installed, but WAV is
header-parseable in a few dozen lines, so CI exercises real bytes →
metadata → samples instead of skipping.  Frame sampling for video
containers stays honestly stubbed (that genuinely needs ffmpeg).

Scope (raises ``ValueError`` outside it, callers treat that as
"undecodable" exactly like corrupt bytes):

- canonical RIFF little-endian layout with ``fmt `` and ``data``
  chunks in any order, unknown chunks skipped (word-aligned);
- audio formats 1 (integer PCM, 8/16/24/32-bit) and 3 (IEEE float
  32/64-bit) for sample decode; ``wav_info`` itself reports any
  format code's header faithfully;
- RF64/compressed formats (ADPCM, mu-law, MP3-in-WAV) are out of
  scope — ffmpeg territory.

The format layout follows the public RIFF/WAVE specification
(Microsoft/IBM 1991 multimedia programming interface); no code is
derived from any existing codec.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


def is_wav(data: bytes) -> bool:
    return (
        len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"WAVE"
    )


@dataclass(frozen=True)
class WavInfo:
    audio_format: int  # 1 = integer PCM, 3 = IEEE float
    channels: int
    sample_rate: int
    bits_per_sample: int
    n_frames: int  # samples per channel

    @property
    def duration_ms(self) -> int:
        return int(round(self.n_frames * 1000 / self.sample_rate))


def _chunks(data: bytes):
    """Yield (chunk_id, payload) for each top-level RIFF sub-chunk.

    Chunks are word-aligned: an odd-sized payload is followed by one
    pad byte that is not part of the declared size."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = bytes(data[pos : pos + 4])
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = bytes(data[pos + 8 : pos + 8 + size])
        if len(payload) != size:
            raise ValueError("truncated WAV chunk")
        yield cid, payload
        pos += 8 + size + (size & 1)


def wav_info(data: bytes) -> WavInfo:
    """Parse the header: (format, channels, sample_rate, bits,
    n_frames) without touching the sample bytes beyond the data
    chunk's declared size."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream (bad signature)")
    fmt = None
    data_size = None
    for cid, payload in _chunks(data):
        if cid == b"fmt " and fmt is None:
            if len(payload) < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif cid == b"data" and data_size is None:
            data_size = len(payload)
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data_size is None:
        raise ValueError("missing data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if channels <= 0 or sample_rate <= 0:
        raise ValueError("nonsensical fmt chunk")
    if block_align <= 0:
        block_align = channels * max(bits, 8) // 8
    return WavInfo(
        audio_format=audio_format,
        channels=channels,
        sample_rate=sample_rate,
        bits_per_sample=bits,
        n_frames=data_size // block_align,
    )


_INT_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
_FLOAT_DTYPES = {32: np.dtype("<f4"), 64: np.dtype("<f8")}


def decode_wav(data: bytes) -> tuple[WavInfo, np.ndarray]:
    """(info, samples) — samples shaped (n_frames, channels).

    Integer PCM comes back as the stored integer dtype (8-bit WAV is
    unsigned by spec, wider widths signed; 24-bit is widened to
    int32), IEEE-float WAV as float32/float64."""
    info = wav_info(data)
    raw = None
    for cid, payload in _chunks(data):
        if cid == b"data":
            raw = payload
            break
    assert raw is not None  # wav_info already proved it exists
    bits = info.bits_per_sample
    if info.audio_format == 1 and bits == 24:
        usable = len(raw) - len(raw) % (3 * info.channels)
        tri = np.frombuffer(raw[:usable], dtype=np.uint8).reshape(-1, 3)
        flat = (
            tri[:, 0].astype(np.int32)
            | (tri[:, 1].astype(np.int32) << 8)
            | (tri[:, 2].astype(np.int32) << 16)
        )
        flat = np.where(flat >= 1 << 23, flat - (1 << 24), flat)
    elif info.audio_format == 1 and bits in _INT_DTYPES:
        dtype = _INT_DTYPES[bits]
        usable = len(raw) - len(raw) % (dtype.itemsize if bits > 8 else 1)
        flat = np.frombuffer(raw[:usable], dtype=dtype)
    elif info.audio_format == 3 and bits in _FLOAT_DTYPES:
        dtype = _FLOAT_DTYPES[bits]
        usable = len(raw) - len(raw) % dtype.itemsize
        flat = np.frombuffer(raw[:usable], dtype=dtype)
    else:
        raise ValueError(
            f"unsupported WAV sample format {info.audio_format}/{bits}-bit"
        )
    frames = len(flat) // info.channels
    return info, flat[: frames * info.channels].reshape(frames, info.channels)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Canonical RIFF/WAVE bytes for a (frames,) or (frames, channels)
    array: uint8 → 8-bit PCM, int16/int32 → PCM, float32/float64 →
    IEEE float."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (frames,) or (frames, channels)")
    if arr.dtype == np.uint8:
        audio_format, bits = 1, 8
    elif arr.dtype == np.int16:
        audio_format, bits = 1, 16
    elif arr.dtype == np.int32:
        audio_format, bits = 1, 32
    elif arr.dtype == np.float32:
        audio_format, bits = 3, 32
    elif arr.dtype == np.float64:
        audio_format, bits = 3, 64
    else:
        raise ValueError(f"unsupported sample dtype {arr.dtype}")
    channels = arr.shape[1]
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    payload = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
    fmt = struct.pack(
        "<HHIIHH", audio_format, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_duration_ms(data: bytes) -> int | None:
    """Header-probe convenience: duration in ms, or None for anything
    that is not a parseable WAV — the multimodal decode contract
    (undecodable == NULL metadata, never an error)."""
    try:
        return wav_info(data).duration_ms
    except (ValueError, struct.error):
        return None
