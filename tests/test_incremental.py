"""Unit tests for incremental (batch-vs-history) deduplication
(llmdata/incremental.py)."""

import pytest
from pyspark.sql import functions as F

from tmdataloader_spark.llmdata.incremental import incremental_novelty, signature_store


@pytest.fixture(scope="module")
def corpus(spark):
    history = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely unrelated history text about spark partitions"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # exact re-crawl of doc 0
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            # near-dup of doc 0 (one word changed)
            (3, "the quick brown fox jumps over the lazy cat again and again"),
            # genuinely new
            (5, "a brand new document that matches nothing in the store"),
        ],
        "doc_id long, text string",
    )
    return history, batch


def test_signature_store_schema(spark, corpus):
    history, _ = corpus
    store = signature_store(history, num_perms=8)
    cols = store.columns
    assert cols[:3] == ["doc_id", "n_shingles", "shingle_set"]
    assert [c for c in cols if c.startswith("mh_")] == [f"mh_{i}" for i in range(8)]
    assert store.count() == 2


def test_incremental_verdicts(spark, corpus):
    history, batch = corpus
    store = signature_store(history, num_perms=16, ngram=2)
    out = {
        r["doc_id"]: r["novel"]
        for r in incremental_novelty(
            batch, store, num_perms=16, bands=4, threshold=0.8, ngram=2
        ).collect()
    }
    assert out[1] is False  # exact re-crawl caught
    assert out[5] is True  # new doc passes
    assert set(out) == {1, 3, 5}  # every batch doc gets a verdict


def test_incremental_does_not_scan_history_text(spark, corpus):
    """The history side of the novelty join must come from the stored
    signature frame — dropping history's text column must not break
    anything (proves no hidden dependency on history text)."""
    history, batch = corpus
    store = signature_store(history, num_perms=16, ngram=2).select(
        "doc_id", "n_shingles", "shingle_set", *[f"mh_{i}" for i in range(16)]
    )
    # materialize the store, then hand over ONLY the store
    rows = store.collect()
    store2 = spark.createDataFrame(rows, store.schema)
    out = incremental_novelty(
        batch, store2, num_perms=16, bands=4, threshold=0.8, ngram=2
    )
    assert out.count() == 3


def test_incremental_novel_when_store_empty(spark, corpus):
    _, batch = corpus
    empty = signature_store(batch.limit(0), num_perms=16, ngram=2)
    out = incremental_novelty(batch, empty, num_perms=16, bands=4, ngram=2)
    assert all(r["novel"] for r in out.collect())


def test_incremental_duplicates_stream_matches_batch(spark, tmp_path, corpus):
    """The streaming hit feed must flag exactly the batch docs the
    batch twin marks non-novel, with the same matched history doc."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.llmdata.incremental import incremental_duplicates_stream

    history, batch = corpus
    store = signature_store(history, num_perms=16, ngram=2)

    batch_ts = batch.withColumn("ts", F.to_timestamp(F.lit("2024-01-01 10:00:00")))
    src = str(tmp_path / "inc_in")
    batch_ts.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(
        src
    )
    out = incremental_duplicates_stream(
        stream, store, num_perms=16, bands=4, threshold=0.8, ngram=2
    )
    q = (
        out.writeStream.format("memory")
        .queryName("inc_hits")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        hits = spark.sql("select * from inc_hits").collect()
    finally:
        q.stop()
    flagged = {(r["doc_id"], r["matched_id"]) for r in hits}
    assert flagged == {(1, 0)}  # the exact re-crawl, matched to history doc 0
    assert all(r["jaccard"] >= 0.8 for r in hits)
    # batch twin agreement: non-novel set == flagged doc ids
    verdicts = {
        r["doc_id"]: r["novel"]
        for r in incremental_novelty(
            batch, store, num_perms=16, bands=4, threshold=0.8, ngram=2
        ).collect()
    }
    assert {d for d, novel in verdicts.items() if not novel} == {d for d, _ in flagged}


def test_grouped_and_perrow_signatures_agree(spark, corpus):
    """The exploded groupBy form (minhash_signatures) and the per-row
    array form (signatures_from_sets) must produce identical
    signatures — the per-row form is the production path; the grouped
    form documents/verifies the classic formulation."""
    from pyspark.sql import functions as F

    from tmdataloader_spark.llmdata.dedup import (
        minhash_signatures,
        shingle_sets,
        signatures_from_sets,
    )

    history, batch = corpus
    docs = history.unionByName(batch)
    sets = shingle_sets(docs, n=2)
    sh = sets.select(
        "doc_id",
        F.size("shingle_set").alias("n_shingles"),
        F.explode("shingle_set").alias("shingle"),
    )
    grouped = {r["doc_id"]: r for r in minhash_signatures(sh, num_perms=8).collect()}
    perrow = {r["doc_id"]: r for r in signatures_from_sets(sets, num_perms=8).collect()}
    assert set(grouped) == set(perrow)
    for d in grouped:
        for i in range(8):
            assert grouped[d][f"mh_{i}"] == perrow[d][f"mh_{i}"], (d, i)


def test_arrow_and_expression_signatures_agree(spark, corpus):
    """The Arrow NumPy kernel (signatures_from_sets_arrow — the
    signature_store path) must be row-for-row identical to the
    pure-expression form, including the keep_set passthrough of the
    shingle arrays and the drop of 0-shingle documents."""
    from tmdataloader_spark.llmdata.dedup import (
        shingle_sets,
        signatures_from_sets,
        signatures_from_sets_arrow,
    )

    history, batch = corpus
    docs = history.unionByName(batch).unionByName(
        # a 1-token doc: 0 shingles at n=2 — must vanish from BOTH forms
        spark.createDataFrame([(7, "single")], "doc_id long, text string")
    )
    sets = shingle_sets(docs, n=2)
    for keep_set in (False, True):
        expr = {
            r["doc_id"]: r.asDict()
            for r in signatures_from_sets(sets, num_perms=8, keep_set=keep_set).collect()
        }
        arrow = {
            r["doc_id"]: r.asDict()
            for r in signatures_from_sets_arrow(
                sets, num_perms=8, keep_set=keep_set
            ).collect()
        }
        assert set(expr) == set(arrow) and 7 not in expr
        for d, row in expr.items():
            for k, v in row.items():
                assert arrow[d][k] == v, (keep_set, d, k)
