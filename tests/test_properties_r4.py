"""Property-based tests for the round-4 operators: chunking, sequence
packing, and Z-order layout checked against pure-Python references on
randomized inputs."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tmdataloader_spark.llmdata.chunking import chunk_documents
from tmdataloader_spark.llmdata.layout import quantize, zorder_key
from tmdataloader_spark.llmdata.packing import pack_sequences

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=120,
)


@settings(max_examples=15, deadline=None)
@given(
    text=text_st,
    chunk=st.integers(min_value=2, max_value=40),
    overlap=st.integers(min_value=0, max_value=39),
)
def test_prop_chunk_reconstruction(spark, text, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk, overlap).collect(), key=lambda r: r["chunk_id"]
    )
    if not text:
        assert rows == []
        return
    # offsets are exactly stride-spaced from 0 and cover every char
    assert [r["chunk_start"] for r in rows] == list(range(0, len(text), stride))
    # concatenating non-overlapping heads reconstructs the document
    rebuilt = "".join(r["chunk_text"][:stride] for r in rows)
    assert rebuilt == text
    # every chunk matches the substring contract
    for r in rows:
        s = r["chunk_start"]
        assert r["chunk_text"] == text[s : s + chunk]


@settings(max_examples=10, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=40),
    seq_len=st.integers(min_value=8, max_value=4096),
)
def test_prop_pack_tiles_the_tape(spark, toks, seq_len):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        pack_sequences(df, seq_len, num_buckets=7).collect(),
        key=lambda r: r["global_offset"],
    )
    # offsets tile [0, total) with no gaps or overlaps
    pos = 0
    for r in rows:
        assert r["global_offset"] == pos
        assert r["seq_id"] == pos // seq_len
        assert r["seq_offset"] == pos % seq_len
        end = pos + r["n_tokens"] - 1
        assert r["n_seqs"] == end // seq_len - pos // seq_len + 1
        pos += r["n_tokens"]
    assert pos == sum(toks)


@settings(max_examples=20, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=-100, max_value=10**6), min_size=1, max_size=20),
    lo=st.integers(min_value=0, max_value=1000),
    span=st.integers(min_value=1, max_value=10**5),
    bits=st.integers(min_value=1, max_value=12),
)
def test_prop_quantize_matches_python_floor_division(spark, xs, lo, span, bits):
    hi = lo + span - 1
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = [
        r["q"] for r in df.select(quantize(F.col("x"), lo, hi, bits).alias("q"))
        .collect()
    ]
    want = [min(max(((x - lo) * (1 << bits)) // span, 0), (1 << bits) - 1) for x in xs]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_prop_zorder_matches_python_interleave(spark, pts):
    def interleave(a, b, bits=8):
        k = 0
        for i in range(bits):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    df = spark.createDataFrame(pts, "a long, b long")
    got = [
        r["k"]
        for r in df.select(
            zorder_key([F.col("a"), F.col("b")], 8).alias("k")
        ).collect()
    ]
    assert got == [interleave(a, b) for a, b in pts]
