"""JSONL ingestion (sources/jsonl.py): quarantine semantics,
fail-fast contract, round-trip."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_jsonl_splits_good_and_quarantine(spark, tmp_path):
    from tmdataloader_spark.sources.jsonl import read_jsonl

    p = str(tmp_path / "docs.jsonl")
    good1 = {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}
    good2 = {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}
    _write_lines(
        p,
        [
            json.dumps(good1),
            "{not valid json at all",
            json.dumps(good2),
            '{"doc_id": "NOT_A_NUMBER", "text": "t"}',
        ],
    )
    good, bad = read_jsonl(spark, p)
    rows = {r.doc_id: r.text for r in good.collect()}
    assert rows == {1: "hello world", 2: "bonjour"}
    raw = sorted(r.raw_line for r in bad.collect())
    assert len(raw) == 2
    assert raw[0].startswith('{"doc_id": "NOT_A_NUMBER"')
    assert raw[1].startswith("{not valid")


def test_load_jsonl_corpus_fail_fast_and_tolerance(spark, tmp_path):
    from tmdataloader_spark.sources.jsonl import (
        JsonlValidationError,
        load_jsonl_corpus,
    )

    p = str(tmp_path / "mixed.jsonl")
    lines = [
        json.dumps({"doc_id": i, "text": f"t{i}", "lang": "en", "source": "s", "n_chars": 2})
        for i in range(9)
    ] + ["BROKEN"]
    _write_lines(p, lines)
    with pytest.raises(JsonlValidationError, match="corrupt JSONL"):
        load_jsonl_corpus(spark, p)  # default: zero tolerance
    good = load_jsonl_corpus(spark, p, max_corrupt_fraction=0.2)
    assert good.count() == 9


def test_jsonl_round_trip(spark, tmp_path):
    from tmdataloader_spark.sources.jsonl import load_jsonl_corpus, write_jsonl

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "export")
    write_jsonl(src, out)
    back = load_jsonl_corpus(spark, out)
    assert sorted(map(tuple, back.select(*src.columns).collect())) == sorted(
        map(tuple, src.collect())
    )
