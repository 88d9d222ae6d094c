"""Pure-Python LZO1X codec for PLINK blob parity.

The reference stores ``.bed/.bim/.fam`` bytes LZO-compressed in
``gwas_plink.plink_data`` (etl/GWASPlinkDataProcessor.groovy:130-142:
``org.anarres.lzo`` ``LzoOutputStream`` with ``LzoAlgorithm.LZO1X``,
which writes each buffered block as one raw LZO1X stream — no
container framing; every block self-terminates with the M4 end-marker
``11 00 00``). This module implements that raw LZO1X block format
from its public specification (the LZO distribution's format docs and
the widely-mirrored ``lzo1x_decompress`` reference code):

- :func:`decompress` understands the FULL instruction set any
  conformant compressor may emit (literal runs with 255-extension,
  M1 in both its base-1 and first-literal-run base-0x801 forms, M2,
  M3, M4, trailing-literal state bits, end marker), so blobs produced
  by the reference's Java compressor decode here.
- :func:`compress` is a greedy hash-table encoder emitting a strictly
  conformant subset (literal runs, M2/M3/M4, state bits, marker) —
  any conformant LZO1X decoder (including the reference's) decodes it
  back to the original bytes. Identical INPUT therefore round-trips
  across both implementations; identical compressed BYTES are not
  promised (LZO, like every LZ77 family, permits many encodings of
  the same data — the on-disk contract is the format, not one
  compressor's choices).

Scale note: this is a CONTROL-PLANE codec — it runs on whole small
blobs (PLINK bed/bim/fam files) at study-load time, never inside a
per-row hot path. Big matrices flow through parquet pages, whose
codec is columnar and JVM-side.
"""

from __future__ import annotations

_EOF_MARKER = b"\x11\x00\x00"
#: org.anarres.lzo.LzoOutputStream's default buffer: each block is an
#: independent raw LZO1X stream.
DEFAULT_BLOCK = 256 * 1024


class LzoError(ValueError):
    pass


# ---------------------------------------------------------------------------
# decompression
# ---------------------------------------------------------------------------

def _take_extended(src: bytes, ip: int, base: int) -> tuple[int, int]:
    """Length extension: ``base + 255*zeros + terminator``."""
    t = base
    n = len(src)
    while ip < n and src[ip] == 0:
        t += 255
        ip += 1
    if ip >= n:
        raise LzoError("truncated length extension")
    t += src[ip]
    return t, ip + 1


def _decompress_block(src: bytes, ip: int) -> tuple[bytes, int]:
    """Decode one raw LZO1X stream starting at ``ip``; returns
    (output, position after the end marker)."""
    out = bytearray()
    n = len(src)
    if ip >= n:
        raise LzoError("empty input")

    # states: 'begin' (literal run or match), 'flr' (just copied a
    # >=4 literal run: t<16 is the base-0x801 M1), 'mn' (just copied
    # 1-3 state-bit literals: t<16 is the base-1 M1)
    state = "begin"
    if src[ip] > 17:
        t = src[ip] - 17
        ip += 1
        if ip + t > n:
            raise LzoError("truncated initial literal run")
        out += src[ip : ip + t]
        ip += t
        state = "mn" if t < 4 else "flr"

    while True:
        if ip >= n:
            raise LzoError("missing end marker")
        t = src[ip]
        ip += 1
        if t < 16 and state == "begin":
            # literal run of t+3 (0 => 255-extended, base 15+3)
            if t == 0:
                t, ip = _take_extended(src, ip, 15)
            run = t + 3
            if ip + run > n:
                raise LzoError("truncated literal run")
            out += src[ip : ip + run]
            ip += run
            state = "flr"
            continue

        if t >= 64:  # M2: 1 distance byte, len 3..8, d <= 0x800
            length = (t >> 5) + 1
            if ip >= n:
                raise LzoError("truncated M2")
            d = 1 + ((t >> 2) & 7) + (src[ip] << 3)
            ip += 1
            ss = t & 3
        elif t >= 32:  # M3: 2 distance bytes, d <= 0x4000
            length = t & 31
            if length == 0:
                length, ip = _take_extended(src, ip, 31)
            if ip + 2 > n:
                raise LzoError("truncated M3")
            b0, b1 = src[ip], src[ip + 1]
            ip += 2
            d = 1 + (b0 >> 2) + (b1 << 6)
            length += 2
            ss = b0 & 3
        elif t >= 16:  # M4: d in (0x4000, 0xBFFF]; doubles as EOF
            high = (t & 8) << 11
            length = t & 7
            if length == 0:
                length, ip = _take_extended(src, ip, 7)
            if ip + 2 > n:
                raise LzoError("truncated M4")
            b0, b1 = src[ip], src[ip + 1]
            ip += 2
            low = (b0 >> 2) + (b1 << 6)
            if high == 0 and low == 0:
                return bytes(out), ip  # end marker
            d = 0x4000 + high + low
            length += 2
            ss = b0 & 3
        else:  # t < 16 after a match / literal run: M1 variants
            if ip >= n:
                raise LzoError("truncated M1")
            if state == "flr":
                d = 0x801 + (t >> 2) + (src[ip] << 2)
                length = 3
            elif state == "mn":
                d = 1 + (t >> 2) + (src[ip] << 2)
                length = 2
            else:  # pragma: no cover - unreachable by construction
                raise LzoError("bad M1 context")
            ip += 1
            ss = t & 3

        # copy the (possibly self-overlapping) match
        s = len(out) - d
        if s < 0:
            raise LzoError(f"match distance {d} before start of output")
        for _ in range(length):
            out.append(out[s])
            s += 1
        if ss:
            if ip + ss > n:
                raise LzoError("truncated state literals")
            out += src[ip : ip + ss]
            ip += ss
            state = "mn"
        else:
            state = "begin"


def decompress(data: bytes) -> bytes:
    """Decode a sequence of raw LZO1X blocks (the stream
    ``LzoOutputStream`` produces: one self-terminated block per
    buffer flush) and concatenate their outputs."""
    out = bytearray()
    ip = 0
    while ip < len(data):
        block, ip = _decompress_block(data, ip)
        out += block
    return bytes(out)


# ---------------------------------------------------------------------------
# compression
# ---------------------------------------------------------------------------

def _emit_extended(out: bytearray, value: int, base: int) -> None:
    """Emit the 255-run extension encoding ``value = base + 255*z + b``."""
    rem = value - base
    z, b = divmod(rem - 1, 255)
    out += b"\x00" * z
    out.append(b + 1)


def _emit_literal_run(out: bytearray, lits: bytes, first: bool) -> None:
    L = len(lits)
    if first and 1 <= L <= 238:
        out.append(L + 17)
    elif L <= 18:
        # run byte encodes L-3 in [1, 15]; L >= 4 guaranteed by caller
        out.append(L - 3)
    else:
        out.append(0)
        _emit_extended(out, L - 3, 15)
    out += lits


def _emit_match(out: bytearray, d: int, length: int, ss: int) -> None:
    if d <= 0x800 and 3 <= length <= 8:
        D = d - 1
        out.append(((length - 1) << 5) | ((D & 7) << 2) | ss)
        out.append(D >> 3)
    elif d <= 0x4000:
        D = d - 1
        if length - 2 <= 31:
            out.append(32 | (length - 2))
        else:
            out.append(32)
            _emit_extended(out, length - 2, 31)
        out.append(((D & 0x3F) << 2) | ss)
        out.append(D >> 6)
    elif d <= 0xBFFF:
        D = d - 0x4000  # >= 1, so never collides with the end marker
        head = 16 | ((D >> 14) << 3)
        if length - 2 <= 7:
            out.append(head | (length - 2))
        else:
            out.append(head)
            _emit_extended(out, length - 2, 7)
        low = D & 0x3FFF
        out.append(((low & 0x3F) << 2) | ss)
        out.append(low >> 6)
    else:  # pragma: no cover - matcher never offers d > 0xBFFF
        raise LzoError(f"distance {d} not encodable")


def _compress_block(src: bytes) -> bytes:
    """Greedy LZO1X encoder for one block: hash-4 match finder,
    matches of length >= 4 at any encodable distance, plus length-3
    matches when M2 reaches them (d <= 0x800)."""
    n = len(src)
    out = bytearray()
    if n == 0:
        out += _EOF_MARKER
        return bytes(out)

    table: dict[bytes, int] = {}
    tokens: list[tuple] = []  # ("lit", start, end) | ("m", d, len)
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = src[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xBFFF:
            i += 1
            continue
        d = i - cand
        # extend the verified 4-byte match
        length = 4
        while i + length < n and src[cand + length] == src[i + length]:
            length += 1
        if lit_start < i:
            tokens.append(("lit", lit_start, i))
        tokens.append(("m", d, length))
        # index positions inside the match (sparse: every position is
        # O(n) worst case but fine for block-sized control-plane data)
        end = i + length
        j = i + 1
        while j + 4 <= n and j < end:
            table[src[j : j + 4]] = j
            j += 1
        i = end
        lit_start = end
    if lit_start < n:
        tokens.append(("lit", lit_start, n))

    # serialize; 1-3 literals after a match ride the match's state
    # bits (the format's only encoding for short post-match runs)
    k = 0
    first = True
    while k < len(tokens):
        tok = tokens[k]
        if tok[0] == "lit":
            _emit_literal_run(out, src[tok[1] : tok[2]], first)
            first = False
            k += 1
            continue
        _, d, length = tok
        ss = 0
        trail = b""
        if k + 1 < len(tokens) and tokens[k + 1][0] == "lit":
            ls, le = tokens[k + 1][1], tokens[k + 1][2]
            if le - ls <= 3:
                ss = le - ls
                trail = src[ls:le]
                k += 1  # consumed the literal token
        _emit_match(out, d, length, ss)
        out += trail
        first = False
        k += 1
    out += _EOF_MARKER
    return bytes(out)


def compress(data: bytes, block_size: int = DEFAULT_BLOCK) -> bytes:
    """LZO1X-compress ``data`` as a sequence of independent raw
    blocks of at most ``block_size`` input bytes each — the stream
    shape ``LzoOutputStream`` writes."""
    if block_size <= 0:
        raise ValueError("block_size must be positive")
    out = bytearray()
    if not data:
        return bytes(_compress_block(b""))
    for off in range(0, len(data), block_size):
        out += _compress_block(data[off : off + block_size])
    return bytes(out)
