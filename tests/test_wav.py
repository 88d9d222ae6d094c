"""Vendored RIFF/WAVE codec (functions/wav.py): hand-built byte
strings in, exact header fields and samples out — the audio twin of
test_png.py, proving the multimodal real-decode path runs on real
audio bytes in this codec-less container."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tmdataloader_spark.functions.wav import (
    decode_wav,
    encode_wav,
    is_wav,
    wav_duration_ms,
    wav_info,
)


def hand_built_wav() -> bytes:
    """A WAV assembled field-by-field (not via encode_wav) so the
    parser is tested against the spec, not against our own writer:
    16-bit stereo PCM, 8 kHz, 4 frames, with an unknown 3-byte 'junk'
    chunk (odd size -> pad byte) between fmt and data."""
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    samples = struct.pack("<8h", 0, 100, -100, 32767, -32768, 1, -1, 0)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_hand_built_wav_header_and_samples():
    data = hand_built_wav()
    assert is_wav(data)
    info = wav_info(data)
    assert (info.audio_format, info.channels, info.sample_rate) == (1, 2, 8000)
    assert (info.bits_per_sample, info.n_frames) == (16, 4)
    assert info.duration_ms == round(4 * 1000 / 8000)  # 0.5 ms rounds to 1
    _, samples = decode_wav(data)
    assert samples.shape == (4, 2)
    assert samples.tolist() == [[0, 100], [-100, 32767], [-32768, 1], [-1, 0]]


@pytest.mark.parametrize(
    "dtype,rate",
    [(np.uint8, 8000), (np.int16, 44100), (np.int32, 16000),
     (np.float32, 48000), (np.float64, 22050)],
)
def test_roundtrip_all_sample_formats(dtype, rate):
    rng = np.random.default_rng(7)
    if np.issubdtype(dtype, np.integer):
        lo, hi = np.iinfo(dtype).min, np.iinfo(dtype).max
        arr = rng.integers(lo, hi, size=(50, 2), endpoint=True).astype(dtype)
    else:
        arr = rng.standard_normal((50, 2)).astype(dtype)
    info, back = decode_wav(encode_wav(arr, rate))
    assert info.sample_rate == rate and info.n_frames == 50
    assert back.dtype == arr.dtype and np.array_equal(back, arr)


def test_mono_1d_input_and_duration():
    arr = np.zeros(44100, dtype=np.int16)
    info = wav_info(encode_wav(arr, 44100))
    assert (info.channels, info.n_frames, info.duration_ms) == (1, 44100, 1000)


def test_24bit_pcm_decode():
    """24-bit is writer-less (encode_wav has no int24) so build it by
    hand: little-endian signed triples widen to int32."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    vals = [0, 1, -1, 8388607, -8388608]
    payload = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    ) + b"\x00"  # odd payload -> pad
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload) - 1) + payload
    )
    info, samples = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert info.bits_per_sample == 24 and info.n_frames == 5
    assert samples[:, 0].tolist() == vals


def test_rejects_out_of_scope():
    assert wav_duration_ms(b"not audio") is None
    assert wav_duration_ms(b"") is None
    with pytest.raises(ValueError):
        wav_info(b"RIFF\x00\x00\x00\x00AVI ")  # RIFF but not WAVE
    # mu-law (format 7) headers parse, but sample decode refuses
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert wav_info(data).audio_format == 7  # header reported faithfully
    with pytest.raises(ValueError):
        decode_wav(data)
    # truncated data chunk
    with pytest.raises(ValueError):
        wav_info(data[:-2])


def test_encode_rejects_bad_shapes_and_dtypes():
    with pytest.raises(ValueError):
        encode_wav(np.zeros((2, 2, 2), dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        encode_wav(np.zeros(4, dtype=np.complex64), 8000)


def test_audio_features_known_signal(spark):
    """audio_features (llmdata/multimodal.py) on synthesized known
    signals: a full-scale 100 Hz sine at 8 kHz has RMS ~ 1/sqrt(2),
    peak ~ 1, and ZCR ~ 2f/sr; the same signal rendered at 8-bit and
    16-bit scores the same after full-scale normalization; non-WAV
    and non-audio rows come back NULL."""
    import numpy as np

    from tmdataloader_spark.llmdata.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )

    t = np.arange(8000) / 8000.0
    sine = np.sin(2 * np.pi * 100 * t)
    wav16 = encode_wav((sine * 32767).astype(np.int16), 8000)
    wav8 = encode_wav(
        np.clip(np.round(sine * 127 + 128), 0, 255).astype(np.uint8), 8000
    )
    stereo = encode_wav(
        np.stack([sine, -sine], axis=1).astype(np.float64), 8000
    )
    rows = [
        (1, "audio", wav16, None),
        (2, "audio", wav8, None),
        (3, "audio", b"mp3 junk", None),
        (4, "image", wav16, None),
        (5, "audio", stereo, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in audio_features(media).collect()}
    assert abs(out[1].rms - 1 / np.sqrt(2)) < 0.01
    assert abs(out[1].peak - 1.0) < 0.01
    # 100 Hz over 1 s -> ~200 sign flips (quantized zeros can absorb
    # a boundary sample, so allow a crossing or two of slack)
    assert abs(out[1].zero_crossing_rate - 200 / 7999) < 3 / 7999
    assert out[1].sample_rate == 8000 and out[1].duration_ms == 1000
    # bit-depth invariance after full-scale normalization
    assert abs(out[2].rms - out[1].rms) < 0.01
    assert abs(out[2].zero_crossing_rate - out[1].zero_crossing_rate) < 1e-3
    # stereo mixdown of (x, -x) averages to silence
    assert out[5].rms == 0.0 and out[5].peak == 0.0
    assert out[3].rms is None and out[4].rms is None


@settings(max_examples=60, deadline=None)
@given(
    frames=st.integers(1, 300),
    channels=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    dtype_name=st.sampled_from(["uint8", "int16", "int32", "float32", "float64"]),
    data=st.data(),
)
def test_prop_wav_roundtrip(frames, channels, rate, dtype_name, data):
    """Property roundtrip (pure Python — no Spark session needed):
    any supported (frames, channels, rate, dtype) combination encodes
    to a parseable canonical WAV whose header fields and samples come
    back exactly."""
    dtype = np.dtype(dtype_name)
    seed = data.draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.integer):
        lo, hi = np.iinfo(dtype).min, np.iinfo(dtype).max
        arr = rng.integers(lo, hi, size=(frames, channels), endpoint=True).astype(dtype)
    else:
        arr = rng.standard_normal((frames, channels)).astype(dtype)
    blob = encode_wav(arr, rate)
    info, back = decode_wav(blob)
    assert (info.channels, info.sample_rate, info.n_frames) == (
        channels,
        rate,
        frames,
    )
    assert info.duration_ms == round(frames * 1000 / rate)
    assert back.dtype == arr.dtype and np.array_equal(back, arr)
    # and the whole blob is word-aligned RIFF the chunk walker accepts
    assert wav_duration_ms(blob) == info.duration_ms
