"""Corpus vocabulary and profiling operators — the census a
training-data pipeline runs before tokenizer training and mixture
design (extension beyond the reference surface; BASELINE.json
north-star "text analysis" family).

Everything here is built from streaming-decomposable aggregates
(count/sum partial-aggregate on the map side), so each plan is one
explode + one keyed agg — no windows over the full corpus, no
collect. Top-k selection uses Spark's ``orderBy().limit(k)``
(TakeOrderedAndProject: each task keeps a k-heap, the driver merges
k·tasks rows), which is the right global-top-k shape at 100 TB —
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tmdataloader_spark.llmdata.text import tokens


def vocab_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Full vocabulary census: one row per distinct token with its
    corpus term frequency ``tf`` (total occurrences) and document
    frequency ``df`` (documents containing it).

    Shape: explode → groupBy(doc, term) for the df leg collapses
    inside the SAME shuffle as the tf leg via two aggregates over the
    exploded frame; both are map-side combined. The output is the
    distinct-token frame — orders of magnitude smaller than the token
    stream."""
    exploded = df.select(
        F.col(id_col).alias("_doc"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    return exploded.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.count_distinct("_doc").alias("df"),
    )


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global top-``k`` tokens by corpus frequency — the heavy-hitter
    list that seeds BPE/unigram tokenizer training and stopword
    inference.

    Deterministic order: (tf desc, term asc), with ``rank`` assigned
    from that total order. Selection happens via ``limit`` (per-task
    k-heaps), NOT a window over the vocabulary — the vocabulary of a
    100 TB crawl is itself billions of rows."""
    top = (
        vocab_counts(df, text_col, id_col)
        .orderBy(F.col("tf").desc(), F.col("term"))
        .limit(k)
    )
    # rank over k rows only — the window input is already bounded by k
    from pyspark.sql import Window

    w = Window.orderBy(F.col("tf").desc(), F.col("term"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def pair_counts(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adjacent-token pair frequencies, top-``k`` — the merge-candidate
    census at the heart of BPE tokenizer training (the highest-count
    pair is the next merge).

    Shape mirrors :func:`vocab_topk`: the pair expression is a pure
    per-row array expression (the shared zip_with n-gram form from
    ``llmdata.dedup`` — no per-index slice inside a higher-order
    lambda, no self-join of the token stream), then one
    map-side-combined agg and per-task k-heap selection.
    Deterministic order (count desc, pair asc)."""
    from tmdataloader_spark.llmdata.dedup import _word_ngrams

    toks = tokens(F.col(text_col))
    exploded = df.select(F.explode(_word_ngrams(toks, 2)).alias("pair"))
    top = (
        exploded.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def length_profile(
    df: DataFrame,
    group_col: str = "source",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-group document-length histogram on log2 buckets:
    ``(group, length_bucket=floor(log2(chars)), n_docs, total_chars,
    min_chars, max_chars)``.

    The shape mixture designers use to spot truncated/boilerplate
    sources. Integer-exact arithmetic end-to-end (the bucket is
    computed by bit-length, not floating log), so the result is
    bit-identical across engines. One keyed agg, map-side combined;
    group cardinality = sources × ~40 buckets, always tiny."""
    chars = F.col(chars_col).cast("long")
    # floor(log2(n)) == len(bin(n)) - 1 for n >= 1; integer-exact
    # (floating log2 misrounds at exact powers of two) and portable —
    # DuckDB/Trino bin() produce the same minimal binary string.
    bucket = (F.length(F.bin(chars)) - 1).cast("int").alias("length_bucket")
    return (
        df.filter(chars > 0)
        .groupBy(F.col(group_col).alias("source_group"), bucket)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(chars).alias("total_chars"),
            F.min(chars).alias("min_chars"),
            F.max(chars).alias("max_chars"),
        )
    )
