"""Sequence packing — assembling variable-length documents into
fixed-token-budget training sequences (extension operator; the
reference has nothing like it, but every large-scale pretraining
pipeline needs it between curation and the data loader).

Semantics: GPT-style concat-and-chunk. Documents are laid out on one
deterministic global tape (ordered by a content hash, so the layout
is reproducible run-to-run and independent of input partitioning) and
the tape is cut every ``seq_len`` tokens. Each document gets the
sequence id and offset where it begins; documents may span sequence
boundaries (``n_seqs`` > 1), which is the zero-padding formulation
pretraining uses.

Scale shape: the naive plan is ONE global window (`orderBy` over the
whole corpus) — a single-partition sort that dies at 100 TB. Here the
prefix sum is distributed the classic two-phase way:

1. hash documents into ``num_buckets`` ordered buckets; a window
   *within* each bucket computes the local running token count
   (shuffle keyed on bucket — parallel, balanced by the hash);
2. the per-bucket totals — ``num_buckets`` rows, a frame orders of
   magnitude smaller than the corpus — get their own prefix sum and
   broadcast back as each bucket's global base offset.

global_offset = bucket_base + local_prefix; everything downstream is
pure per-row arithmetic. Determinism: the tape order is
(bucket, md5_32(id), id) — content-derived, partitioning-invariant,
and built from the same portable 32-bit md5 arithmetic as
``sampling``, so a DuckDB/Trino/BigQuery oracle reproduces the exact
layout bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _h32(id_col: Column, salt: str) -> Column:
    """Portable 32-bit md5 of the salted id (the suite's standard
    cross-engine hash; cf. sampling._bucket)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_buckets: int = 256,
) -> DataFrame:
    """Assign every document its position on the packed training tape.

    Returns one row per input document:

    - ``seq_id``: index of the fixed-length sequence where the
      document BEGINS (tape position // seq_len)
    - ``seq_offset``: token offset inside that sequence
    - ``n_seqs``: how many sequences the document touches (1 = fits
      without crossing a boundary)
    - ``global_offset``: absolute tape position (the invariant:
      sorted by it, offsets tile the tape with no gaps or overlaps)

    Documents with a null or non-positive token count are dropped —
    curation should have filtered them already.
    """
    tokens = F.col(token_col).cast("long")
    base = df.filter(tokens > 0).select(
        F.col(id_col),
        tokens.alias("_n_tok"),
        (_h32(F.col(id_col), "pack-bkt") % num_buckets).alias("_bkt"),
        _h32(F.col(id_col), "pack-ord").alias("_ord"),
    )

    # phase 1: running sum within each bucket (EXCLUSIVE of the
    # current row — a doc starts at the sum of everything before it)
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_local_off", F.coalesce(F.sum("_n_tok").over(w_local), F.lit(0))
    )

    # phase 2: bucket base offsets — num_buckets rows, broadcast back
    w_bucket = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        base.groupBy("_bkt")
        .agg(F.sum("_n_tok").alias("_bkt_total"))
        .withColumn("_bkt_base", F.coalesce(F.sum("_bkt_total").over(w_bucket), F.lit(0)))
        .select("_bkt", "_bkt_base")
    )

    g = F.col("_bkt_base") + F.col("_local_off")
    return (
        local.join(F.broadcast(bases), "_bkt")
        .select(
            id_col,
            F.col("_n_tok").alias(token_col),
            g.alias("global_offset"),
            F.floor(g / seq_len).cast("long").alias("seq_id"),
            F.pmod(g, F.lit(seq_len)).cast("long").alias("seq_offset"),
            (
                F.floor((g + F.col("_n_tok") - 1) / seq_len) - F.floor(g / seq_len) + 1
            ).cast("long").alias("n_seqs"),
        )
    )


def packing_stats(
    packed: DataFrame, seq_len: int, token_col: str = "n_tokens"
) -> DataFrame:
    """One-row summary of a packed layout: total tokens, document and
    sequence counts, and how many documents cross a sequence boundary
    — the quantities a data loader needs to size an epoch."""
    return packed.agg(
        F.sum(token_col).alias("total_tokens"),
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_seqs") > 1, 1).otherwise(0)).alias("n_spanning"),
        F.ceil(F.sum(token_col) / seq_len).cast("long").alias("n_sequences"),
    )
