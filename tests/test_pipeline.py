"""End-to-end assembly-line test (llmdata/pipeline.py): the composed
stages must agree with their standalone (oracle-checked) counterparts
and be reproducible run-to-run."""

import pytest
from pyspark.sql import functions as F

from tmdataloader_spark.llmdata.pipeline import prepare_training_data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs, prepare_training_data(docs, seq_len=512)


def test_verdicts_cover_every_doc(spark, result):
    docs, td = result
    assert td.verdicts.count() == docs.count()
    kept = td.verdicts.filter(F.col("kept") == 1).count()
    assert 0 < kept < docs.count()  # something kept, something dropped


def test_corpus_is_kept_docs_with_splits(spark, result):
    docs, td = result
    corpus = td.corpus.collect()
    kept_ids = {
        r["doc_id"] for r in td.verdicts.filter(F.col("kept") == 1).collect()
    }
    assert {r["doc_id"] for r in corpus} == kept_ids
    assert set(r["split"] for r in corpus) <= {"train", "val", "test"}
    assert all(r["n_tokens"] > 0 for r in corpus)


def test_packed_matches_standalone_packing(spark, result):
    """The pipeline's tape layout must be IDENTICAL to running
    pack_sequences directly on the train split — composition adds
    nothing and loses nothing."""
    from tmdataloader_spark.llmdata.packing import pack_sequences

    _, td = result
    train = td.corpus.filter(F.col("split") == "train")
    direct = {
        r["doc_id"]: (r["global_offset"], r["seq_id"], r["n_seqs"])
        for r in pack_sequences(train, 512).collect()
    }
    composed = {
        r["doc_id"]: (r["global_offset"], r["seq_id"], r["n_seqs"])
        for r in td.packed.collect()
    }
    assert composed == direct


def test_stats_tile_invariant(spark, result):
    _, td = result
    s = td.stats.first()
    total = sum(r["n_tokens"] for r in td.packed.collect())
    assert s["total_tokens"] == total
    assert s["n_sequences"] == -(-total // 512)  # ceil
    assert s["n_docs"] == td.packed.count()


def test_reproducible_across_runs(spark, result):
    docs, td = result
    again = prepare_training_data(docs, seq_len=512)
    a = sorted(
        (r["doc_id"], r["split"]) for r in td.corpus.select("doc_id", "split").collect()
    )
    b = sorted(
        (r["doc_id"], r["split"]) for r in again.corpus.select("doc_id", "split").collect()
    )
    assert a == b


def test_curate_semantic_dedup_option(spark):
    """curate(embeddings=...) folds the SemDeDup verdict in as a
    'semantic_duplicate' reason; docs without an embedding row pass;
    the default (None) output is unchanged."""
    from tmdataloader_spark.llmdata.curate import curate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = {r["doc_id"]: r["reasons"] for r in curate(docs).collect()}
    with_sem = {
        r["doc_id"]: r["reasons"]
        for r in curate(docs, embeddings=emb, embedding_threshold=0.4).collect()
    }
    assert set(base) == set(with_sem)
    # only difference allowed: semantic_duplicate inserted in order
    changed = {d for d in base if base[d] != with_sem[d]}
    for d in changed:
        assert "semantic_duplicate" in with_sem[d]
        assert with_sem[d].replace("semantic_duplicate", "").strip(",").replace(
            ",,", ","
        ) == base[d] or base[d] == ""
