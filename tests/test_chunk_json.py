"""Unit tests for document chunking (llmdata/chunking.py) and JSON
flattening (operators/semistructured.py)."""

import pytest
from pyspark.sql import functions as F

from tmdataloader_spark.llmdata.chunking import chunk_documents
from tmdataloader_spark.operators.semistructured import flatten_json, json_props_rollup


def test_chunk_tiling_and_overlap(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_chars=4, overlap_chars=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    got = [(r["chunk_id"], r["chunk_start"], r["chunk_text"]) for r in rows]
    assert got == [
        (0, 0, "abcd"),
        (1, 2, "cdef"),
        (2, 4, "efgh"),
        (3, 6, "ghij"),
        (4, 8, "ij"),
    ]
    # every character of the source is covered by some chunk
    assert rows[0]["chunk_len"] == 4 and rows[-1]["chunk_len"] == 2


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_chars=5, overlap_chars=1).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(1, "ab")]


def test_chunk_overlap_guard():
    with pytest.raises(ValueError):
        chunk_documents(None, chunk_chars=4, overlap_chars=4)


def test_chunk_reconstruction(spark):
    """Concatenating each chunk's non-overlapping head reproduces the
    document — the invariant an indexer relies on."""
    text = "the quick brown fox jumps over the lazy dog" * 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_chars=50, overlap_chars=10).collect(),
        key=lambda r: r["chunk_id"],
    )
    stride = 40
    rebuilt = "".join(r["chunk_text"][:stride] for r in rows)
    assert rebuilt == text


def test_flatten_json_types_and_malformed(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "tag": "x"}'),
            (2, '{"k": "not a number"}'),
            (3, "not json at all"),
            (4, None),
        ],
        "id long, props string",
    )
    out = flatten_json(df, "props", {"k": "long", "tag": "string"}).collect()
    by_id = {r["id"]: (r["k"], r["tag"]) for r in out}
    assert by_id[1] == (7, "x")
    assert by_id[2] == (None, None)  # wrong type -> null, row kept
    assert by_id[3] == (None, None)
    assert by_id[4] == (None, None)
    assert "props" in out[0].asDict()  # original column preserved


def test_json_props_rollup(spark):
    df = spark.createDataFrame(
        [
            ("a", '{"k": 1}'),
            ("a", '{"k": 3}'),
            ("a", "broken"),
            ("b", '{"k": 10}'),
        ],
        "event_type string, props string",
    )
    out = {r["event_type"]: r for r in json_props_rollup(df).collect()}
    assert out["a"]["n_events"] == 3 and out["a"]["n_with_prop"] == 2
    assert out["a"]["sum_k"] == 4 and out["a"]["avg_k"] == 2.0
    assert out["b"]["min_k"] == out["b"]["max_k"] == 10


def test_normalize_unicode_nfc(spark):
    """Decomposed e+combining-acute must normalize to composed é —
    and agree with DuckDB's nfc_normalize on the same input."""
    import duckdb

    from tmdataloader_spark.llmdata.text import normalize_unicode

    decomposed = "café"  # e + COMBINING ACUTE ACCENT
    df = spark.createDataFrame([(1, decomposed), (2, "plain"), (3, None)],
                               "id long, text string")
    out = {r["id"]: r["n"] for r in
           df.select("id", normalize_unicode("text").alias("n")).collect()}
    assert out[1] == "café" and len(out[1]) == 4
    assert out[2] == "plain" and out[3] is None
    (duck,) = duckdb.sql(
        "SELECT nfc_normalize('cafe' || chr(769))").fetchone()
    assert out[1] == duck


def test_normalize_unicode_bad_form():
    import pytest as _pytest

    from tmdataloader_spark.llmdata.text import normalize_unicode

    with _pytest.raises(ValueError):
        normalize_unicode("text", form="NFX")
