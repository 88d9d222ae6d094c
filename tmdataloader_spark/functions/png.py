"""Minimal from-scratch PNG codec — stdlib ``zlib``/``struct`` +
numpy only, no Pillow.

Exists so the multimodal ``fake=False`` real-decode path
(llmdata/multimodal.py) can run in codec-less environments: PIL is
preferred when importable (it reads every format), but when it is
absent this module handles the PNG subset natively so CI exercises
REAL bytes → dimensions → resize → re-encode instead of skipping.

Scope (raises ``ValueError`` outside it, callers treat that as
"undecodable" exactly like corrupt bytes):

- 8-bit samples; color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA).  Palette (3), 16-bit, and interlaced images are out of
  scope — PIL covers those where installed.
- All five scanline filters (None/Sub/Up/Average/Paeth) on decode;
  encode always writes filter 0 (the arrays are tiny test payloads,
  compression ratio is not the point).

The format layout follows the public PNG spec (RFC 2083); no code is
derived from any existing codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIGNATURE


def _chunks(data: bytes):
    """Yield (type, payload) for each chunk; stops at IEND."""
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = bytes(data[pos + 4 : pos + 8])
        payload = bytes(data[pos + 8 : pos + 8 + length])
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, payload
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _ihdr(data: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, bit_depth, color_type, interlace) from IHDR."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    if len(data) < 33 or bytes(data[12:16]) != b"IHDR":
        raise ValueError("IHDR not first chunk")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    if w == 0 or h == 0:
        raise ValueError("zero dimension")
    return w, h, depth, ctype, interlace


def png_size(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR header — no inflate, O(1)."""
    w, h, _, _, _ = _ihdr(data)
    return w, h


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode to a (height, width, channels) uint8 array."""
    w, h, depth, ctype, interlace = _ihdr(data)
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported color type {ctype}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _CHANNELS[ctype]
    idat = b"".join(p for t, p in _chunks(data) if t == b"IDAT")
    if not idat:
        raise ValueError("no IDAT")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        row = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                up_left = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(left, prev[i], up_left)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = row
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (height, width[, channels]) uint8 array as PNG."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError("expected (h, w, 1|2|3|4) uint8 array")
    h, w, ch = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    # filter 0 on every scanline
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    out = [_SIGNATURE]
    for ctype, payload in (
        (b"IHDR", ihdr),
        (b"IDAT", zlib.compress(raw)),
        (b"IEND", b""),
    ):
        out.append(struct.pack(">I", len(payload)))
        out.append(ctype)
        out.append(payload)
        out.append(struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))
    return b"".join(out)


def resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resize of a (h, w, c) uint8 array — half-pixel-center
    sampling, edges clamped; vectorized numpy gather + lerp."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w = a.shape[:2]
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)
