"""LZO1X codec: round-trips, format-conformance vectors (constructs
the reference's Java compressor emits but ours does not), and the
GWAS blob integration."""

import os

import pytest
from hypothesis import given, settings, strategies as st

from tmdataloader_spark.functions.lzo import (
    DEFAULT_BLOCK,
    LzoError,
    compress,
    decompress,
)


def test_round_trip_basics():
    cases = [
        b"",
        b"a",
        b"abc",
        b"abcd" * 1000,
        b"\x00" * 10000,
        bytes(range(256)) * 64,
        os.urandom(5000),
        b"to be or not to be, that is the question " * 200,
    ]
    for data in cases:
        assert decompress(compress(data)) == data


def test_multi_block_round_trip():
    data = os.urandom(3 * DEFAULT_BLOCK + 12345)
    assert decompress(compress(data)) == data
    # small block size forces many concatenated streams
    data2 = b"hello world " * 1000
    assert decompress(compress(data2, block_size=64)) == data2


def test_compression_actually_compresses():
    data = b"spark " * 10000
    assert len(compress(data)) < len(data) // 4


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_round_trip_property(data):
    assert decompress(compress(data)) == data


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=64), st.integers(2, 2000))
def test_round_trip_repetitive_property(unit, reps):
    data = unit * reps
    assert decompress(compress(data)) == data


def test_decoder_initial_short_literal_vector():
    # initial byte 18 => exactly 1 literal, then the end marker
    assert decompress(bytes([18, 0x41]) + b"\x11\x00\x00") == b"A"


def test_decoder_m1_after_state_literal_vector():
    """Hand-built stream using the plain (base-1) M1 our encoder never
    emits: 4 literals, M2 d=4 len=4 with 1 state literal, M1 d=1."""
    stream = bytes(
        [
            21, ord("a"), ord("b"), ord("c"), ord("d"),  # initial 4 literals
            ((4 - 1) << 5) | ((3 & 7) << 2) | 1, 0x00,   # M2 d=4 len=4 ss=1
            ord("Z"),                                     # state literal
            0x00, 0x00,                                   # M1 d=1 len=2
        ]
    ) + b"\x11\x00\x00"
    assert decompress(stream) == b"abcd" + b"abcd" + b"Z" + b"ZZ"


def test_decoder_m1_first_literal_run_vector():
    """Base-0x801 M1 (valid only right after a >=4 literal run)."""
    lits = bytes((i * 7 + 3) % 256 for i in range(2054))
    # standard run encoding for L=2054: 0x00, 7 zero ext bytes, 251
    head = bytes([0x00] + [0x00] * 7 + [251]) + lits
    m1 = bytes([0x00, 0x00])  # d = 0x801, len 3, ss 0
    out = decompress(head + m1 + b"\x11\x00\x00")
    src = 2054 - 0x801
    assert out == lits + lits[src : src + 3]


def test_decoder_extended_match_length_vector():
    """M3 with 255-extended length (len-2 = 31 + 255 + 4 = 290)."""
    lits = bytes((i * 13 + 1) % 256 for i in range(400))
    # run: L=400 -> 0x00 then ext of 397-15=382 = 255*1+127
    run = bytes([0x00, 0x00, 127]) + lits
    # M3: t=32 (ext), ext bytes [0x00? no: base 31 + b], b=259-255... use
    # len-2 = 31 + 255*1 + 4 => ext bytes 0x00, 0x04; d=400 -> D=399
    m3 = bytes([32, 0x00, 0x04, ((399 & 0x3F) << 2) | 0, 399 >> 6])
    out = decompress(run + m3 + b"\x11\x00\x00")
    want = bytearray(lits)
    s = len(want) - 400
    for _ in range(292):
        want.append(want[s])
        s += 1
    assert out == bytes(want)


def test_corrupt_streams_raise():
    with pytest.raises(LzoError):
        decompress(b"\x11\x00")  # truncated marker
    with pytest.raises(LzoError):
        decompress(bytes([21, 0x41]))  # truncated literals
    with pytest.raises(LzoError):
        # match distance before start of output
        decompress(bytes([18, 0x41, 0x6D, 0x50]) + b"\x11\x00\x00")
    with pytest.raises(LzoError):
        decompress(compress(b"abc" * 100)[:-1])  # marker cut off


def test_far_match_uses_m4_and_round_trips():
    """Distance > 0x4000 exercises the M4 encoder branch."""
    probe = b"SENTINEL-BLOCK-0123456789"
    data = probe + os.urandom(0x5000) + probe
    assert decompress(compress(data)) == data
