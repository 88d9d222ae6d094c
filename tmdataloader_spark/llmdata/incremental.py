"""Incremental deduplication — new-batch-vs-history, without ever
re-scanning history text.

At 100 TB the corpus is not re-deduplicated per ingest; a pipeline
keeps a narrow SIGNATURE STORE (id, shingle-set hashes, MinHash
signature — a few hundred bytes/doc vs the document itself) and each
incoming batch is checked against it:

1. exact layer — normalization fingerprints, anti-join (bit-identical
   re-crawls);
2. near-dup layer — the batch's LSH band keys equi-join the store's
   band keys (candidates only where a band collides; the store side
   is partitioned by band_key so the probe touches matching buckets,
   and the batch side is small enough for AQE to broadcast), then
   candidates are exact-verified on the STORED shingle arrays.

History text is never read; history signatures are never recomputed.
Both layers reuse the batch machinery from ``dedup`` (same md5
shingles, same affine MinHash permutations), so one signature store
serves batch and incremental paths and a DuckDB/Trino oracle
reproduces every verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tmdataloader_spark.llmdata.dedup import (
    lsh_band_keys,
    minhash_signatures,
    shingle_sets,
)


def signature_store(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """The frame a pipeline persists per corpus generation: one row
    per document with its shingle-hash array (exact-verification
    evidence) and MinHash columns ``mh_*``. Computed in one pass over
    the text; everything downstream joins this, not the corpus."""
    sets = shingle_sets(df, text_col, id_col, n=ngram)
    sh = sets.select(
        F.col(id_col),
        F.size("shingle_set").alias("n_shingles"),
        F.explode("shingle_set").alias("shingle"),
    )
    sigs = minhash_signatures(sh, id_col, num_perms)
    return sets.join(sigs, id_col).select(
        id_col, "n_shingles", "shingle_set", *[c for c in sigs.columns if c.startswith("mh_")]
    )


def incremental_novelty(
    batch: DataFrame,
    history_store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    ngram: int = 3,
) -> DataFrame:
    """Per-batch-document novelty verdict against a history signature
    store: ``(id, novel)`` with ``novel = false`` iff some history
    document's EXACT shingle Jaccard with it is ≥ ``threshold`` among
    LSH band-collision candidates.

    Cost shape: batch-sized scans + one equi-join per layer against
    narrow store columns. No history text scan, no history signature
    recompute, no within-history pairing (that was settled when each
    generation was ingested)."""
    b_store = signature_store(batch, text_col, id_col, num_perms, ngram)
    b_bands = lsh_band_keys(b_store, id_col, num_perms, bands)
    h_bands = lsh_band_keys(history_store, id_col, num_perms, bands)

    cand = (
        b_bands.alias("b")
        .join(
            h_bands.alias("h"),
            (F.col("b.band") == F.col("h.band"))
            & (F.col("b.band_key") == F.col("h.band_key")),
        )
        .select(
            F.col(f"b.{id_col}").alias("_bid"),
            F.col(f"h.{id_col}").alias("_hid"),
            F.col("b.n_shingles").alias("n_b"),
            F.col("h.n_shingles").alias("n_h"),
        )
        .distinct()
    )
    fb = b_store.select(F.col(id_col).alias("_bid"), F.col("shingle_set").alias("arr_b"))
    fh = history_store.select(
        F.col(id_col).alias("_hid"), F.col("shingle_set").alias("arr_h")
    )
    dup_ids = (
        cand.join(fb, "_bid")
        .join(fh, "_hid")
        .withColumn("_inter", F.size(F.array_intersect("arr_b", "arr_h")))
        .withColumn(
            "_jac",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("n_b") + F.col("n_h") - F.col("_inter")),
                6,
            ),
        )
        .filter(F.col("_jac") >= threshold)
        .select(F.col("_bid").alias(id_col))
        .distinct()
    )
    return (
        batch.select(id_col)
        .join(dup_ids.withColumn("_dup", F.lit(True)), id_col, "left")
        .select(id_col, F.coalesce(~F.col("_dup"), F.lit(True)).alias("novel"))
    )
