"""The complete curation→training-data assembly line: one call from a
raw document table to the three artifacts a pretraining run consumes.

Composes only already-oracle-checked stages (each is its own gate
query), joined on the doc id:

1. :func:`curate.curate` — keep/drop verdicts with ordered reasons;
2. token counting + deterministic train/val/test split assignment on
   the KEPT corpus (pure per-row expressions);
3. :func:`packing.pack_sequences` over the train split — the packed
   tape layout the data loader reads.

Every stage is deterministic in the row ids (md5 arithmetic), so two
runs — or two engines — produce identical corpora, splits, and tape
layouts: the reproducibility contract a training pipeline audits
against.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from tmdataloader_spark.llmdata.curate import curate
from tmdataloader_spark.llmdata.packing import pack_sequences, packing_stats
from tmdataloader_spark.llmdata.sampling import split_column
from tmdataloader_spark.llmdata.text import bpeish_token_count


@dataclass
class TrainingData:
    """The assembly line's output frames (all lazy)."""

    verdicts: DataFrame  #: (id, reasons, kept) for EVERY input doc
    corpus: DataFrame  #: kept docs + n_tokens + split label
    packed: DataFrame  #: train-split tape layout (pack_sequences)
    stats: DataFrame  #: one-row packing summary for the train split


def prepare_training_data(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    seq_len: int = 2048,
    weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
    text_col: str = "text",
    id_col: str = "doc_id",
    **curate_kwargs,
) -> TrainingData:
    """Run the full line. ``curate_kwargs`` pass through to
    :func:`curate.curate` (thresholds, jaccard, contamination)."""
    verdicts = curate(
        docs, text_col=text_col, id_col=id_col, benchmark=benchmark, **curate_kwargs
    )
    kept = docs.join(
        verdicts.filter(F.col("kept") == 1).select(id_col), id_col
    )
    corpus = kept.select(
        F.col(id_col),
        F.col(text_col),
        bpeish_token_count(F.col(text_col)).alias("n_tokens"),
        split_column(id_col, list(weights), ["train", "val", "test"]).alias("split"),
    )
    train = corpus.filter(F.col("split") == "train")
    packed = pack_sequences(train, seq_len, token_col="n_tokens", id_col=id_col)
    return TrainingData(
        verdicts=verdicts,
        corpus=corpus,
        packed=packed,
        stats=packing_stats(packed, seq_len),
    )
