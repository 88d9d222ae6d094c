"""functions/png.py: the vendored pure-Python PNG codec that backs
multimodal fake=False in codec-less environments — roundtrips, all
five scanline filters, header-only size parse, bilinear resize, and
(where Pillow exists) cross-codec agreement."""

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdataloader_spark.functions.png import (
    decode_png,
    encode_png,
    is_png,
    png_size,
    resize_bilinear,
)


def _det_image(h, w, ch, seed=7):
    """Deterministic pixel data without RNG state."""
    base = (np.arange(h * w * ch, dtype=np.int64) * 31 + seed * 17) % 256
    return base.astype(np.uint8).reshape(h, w, ch)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_all_color_types(ch):
    img = _det_image(13, 7, ch)
    data = encode_png(img)
    assert is_png(data)
    assert png_size(data) == (7, 13)
    back = decode_png(data)
    assert back.shape == (13, 7, ch)
    assert np.array_equal(back, img)


def test_gray_2d_input_roundtrips():
    img2d = _det_image(5, 9, 1)[:, :, 0]
    back = decode_png(encode_png(img2d))
    assert back.shape == (5, 9, 1)
    assert np.array_equal(back[:, :, 0], img2d)


def _encode_with_filters(img, filters):
    """Hand-build a PNG whose row y uses filters[y] — exercises the
    decoder's unfilter paths beyond the encoder's always-0."""
    h, w, ch = img.shape
    stride = w * ch
    prev = np.zeros(stride, dtype=np.int64)
    raw = bytearray()
    for y in range(h):
        row = img[y].reshape(stride).astype(np.int64)
        f = filters[y % len(filters)]
        raw.append(f)
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            raw.append(int((row[i] - pred) % 256))
        prev = row
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0)
    out = [sig]
    for ctype, payload in (
        (b"IHDR", ihdr),
        (b"IDAT", zlib.compress(bytes(raw))),
        (b"IEND", b""),
    ):
        out += [
            struct.pack(">I", len(payload)),
            ctype,
            payload,
            struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF),
        ]
    return b"".join(out)


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_every_filter_type(filters):
    img = _det_image(11, 6, 3)
    data = _encode_with_filters(img, filters)
    assert np.array_equal(decode_png(data), img)


@pytest.mark.parametrize(
    "mutant",
    [
        b"not a png at all",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8,  # no IHDR
    ],
)
def test_garbage_rejected(mutant):
    with pytest.raises(ValueError):
        png_size(mutant)


def test_out_of_scope_features_rejected():
    img = _det_image(4, 4, 3)
    data = bytearray(encode_png(img))
    deep = bytearray(data)
    deep[24] = 16  # bit depth byte of IHDR
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(deep))
    inter = bytearray(data)
    inter[28] = 1  # interlace byte
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bytes(inter))


def test_resize_bilinear_constant_and_gradient():
    const = np.full((10, 8, 3), 77, dtype=np.uint8)
    assert np.array_equal(
        resize_bilinear(const, 4, 5), np.full((5, 4, 3), 77, dtype=np.uint8)
    )
    # horizontal gradient stays monotonic and keeps endpoints close
    grad = np.tile(np.linspace(0, 255, 32).astype(np.uint8)[None, :, None], (4, 1, 1))
    small = resize_bilinear(grad, 8, 2)
    row = small[0, :, 0].astype(int)
    assert all(row[i] <= row[i + 1] for i in range(len(row) - 1))
    assert row[0] <= 24 and row[-1] >= 231
    assert small.shape == (2, 8, 1)


def test_cross_codec_agreement_with_pillow():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    img = _det_image(9, 14, 3)
    # our encode -> PIL decode
    with Image.open(io.BytesIO(encode_png(img))) as im:
        assert im.size == (14, 9)
        assert np.array_equal(np.asarray(im.convert("RGB")), img)
    # PIL encode -> our decode
    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(buf, format="PNG")
    assert np.array_equal(decode_png(buf.getvalue()), img)
    assert png_size(buf.getvalue()) == (14, 9)
