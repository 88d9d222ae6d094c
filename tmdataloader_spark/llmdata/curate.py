"""End-to-end corpus curation — the composed training-data pipeline:
language ID → length bounds → repetition filters → MinHash near-dup
keep-one → eval-set decontamination, producing one verdict row per
document with machine-readable drop reasons.

This is the flagship composition of the llmdata suite: every signal
is one of the already-tested operators, joined back on the doc id —
so the plan is a DAG of independent signal subplans plus equi-joins,
each stage scale-characterized in SURVEY.md §9. Nothing here touches
the driver except the connected-components convergence loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed reason order — the output ``reasons`` string is the
#: comma-join of the violated subset in THIS order (engine-stable)
REASONS = (
    "lang",
    "short",
    "long",
    "repetitive",
    "boilerplate",
    "duplicate",
    "semantic_duplicate",
    "contaminated",
)


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    min_tokens: int = 20,
    max_tokens: int = 90,
    max_top_word_frac: float = 0.15,
    jaccard_threshold: float = 0.8,
    contamination_min_shared: int = 2,
    embeddings: DataFrame | None = None,
    embedding_threshold: float = 0.4,
    embedding_k: int = 8,
    max_dup_ngram_fraction: float | None = None,
) -> DataFrame:
    """One verdict row per document: ``(id, kept, reasons)`` where
    ``reasons`` is the comma-joined violated-rule subset (fixed
    order: see :data:`REASONS`) and ``kept = 1`` iff it is empty. ``filter(kept = 1)`` joined
    back to the corpus is the curated training set.

    - lang: English stopword hit-rate < 5% (``text.language_id``)
    - short/long: whitespace token count outside
      [``min_tokens``, ``max_tokens``]
    - repetitive: most frequent token above ``max_top_word_frac``
      of all tokens (``text.repetition_signals``)
    - boilerplate: duplicated-3-gram fraction above
      ``max_dup_ngram_fraction`` (``dedup.dup_ngram_fraction`` — the
      CCNet-style repeated-content signal, catching template pages
      with no single near-dup partner; skipped when None, the
      default, so existing callers' output is unchanged)
    - duplicate: member of a MinHash-LSH near-dup component
      (Jaccard ≥ ``jaccard_threshold``) that is NOT the min-id
      canonical (``dedup.dedup_clusters`` keep-one policy)
    - semantic_duplicate: SemDeDup verdict from ``embeddings`` — a
      ``(vec_id ≙ id, embedding)`` frame; within-k-means-cell cosine
      ≥ ``embedding_threshold`` marks the non-canonical member
      (skipped when None; docs without an embedding row pass)
    - contaminated: shares ≥ ``contamination_min_shared`` distinct
      word 3-grams with ``benchmark`` (skipped when None)
    """
    from tmdataloader_spark.llmdata.dedup import (
        dedup_clusters,
        dup_ngram_fraction,
        minhash_lsh_pairs,
    )
    from tmdataloader_spark.llmdata.text import (
        _top_word_frac,
        benchmark_contamination,
        language_id,
        tokens,
    )

    base = df.select(
        F.col(id_col),
        language_id(F.col(text_col)).alias("_lang"),
        F.size(tokens(F.col(text_col))).alias("_n_tokens"),
    )
    rep = _top_word_frac(df, text_col, id_col).select(
        id_col, F.col("top_word_frac").alias("_topw")
    )
    pairs = minhash_lsh_pairs(
        df,
        text_col=text_col,
        id_col=id_col,
        num_perms=16,
        bands=4,
        threshold=jaccard_threshold,
    )
    clusters = dedup_clusters(df, pairs, id_col=id_col).select(
        id_col, F.col("cluster_id").alias("_cluster")
    )
    out = base.join(rep, id_col).join(clusters, id_col)
    if max_dup_ngram_fraction is not None:
        boil = dup_ngram_fraction(df, text_col, id_col, n=3, min_df=2).select(
            id_col,
            (F.col("dup_fraction") > max_dup_ngram_fraction).alias("_boil"),
        )
        out = out.join(boil, id_col)
    else:
        out = out.withColumn("_boil", F.lit(False))
    if embeddings is not None:
        from tmdataloader_spark.llmdata.clustering import semantic_dedup

        sem = semantic_dedup(
            embeddings, k=embedding_k, iters=3, threshold=embedding_threshold
        ).select(
            F.col("vec_id").alias(id_col), (~F.col("keep")).alias("_semdup")
        )
        out = out.join(sem, id_col, "left").withColumn(
            "_semdup", F.coalesce(F.col("_semdup"), F.lit(False))
        )
    else:
        out = out.withColumn("_semdup", F.lit(False))
    if benchmark is not None:
        cont = benchmark_contamination(
            df, benchmark, text_col, id_col, n=3, min_shared=contamination_min_shared
        ).select(id_col, F.col("contaminated").alias("_cont"))
        out = out.join(cont, id_col)
    else:
        out = out.withColumn("_cont", F.lit(False))

    reasons = F.concat_ws(
        ",",
        F.when(F.col("_lang") != "en", F.lit("lang")),
        F.when(F.col("_n_tokens") < min_tokens, F.lit("short")),
        F.when(F.col("_n_tokens") > max_tokens, F.lit("long")),
        F.when(F.col("_topw") > max_top_word_frac, F.lit("repetitive")),
        F.when(F.col("_boil"), F.lit("boilerplate")),
        F.when(F.col("_cluster") != F.col(id_col), F.lit("duplicate")),
        F.when(F.col("_semdup"), F.lit("semantic_duplicate")),
        F.when(F.col("_cont"), F.lit("contaminated")),
    )
    return out.select(
        id_col,
        reasons.alias("reasons"),
        (reasons == "").cast("int").alias("kept"),
    )


def curation_report(
    verdicts: DataFrame,
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group curation summary — the artifact mixture designers
    read after a curate run: for each value of ``group_col``
    (source/domain/language), how many documents survived and which
    rules removed the rest.

    ``verdicts`` is :func:`curate` output ``(id, reasons, kept)``;
    ``df`` supplies the grouping column. Output: one row per group
    with ``n_docs``, ``n_kept``, ``keep_rate`` (6dp) and one
    ``n_<reason>`` count per entry of :data:`REASONS` (a document
    with two violations counts once under EACH — reason columns are
    diagnostic tallies, not a partition of the drops). Reason
    membership tests split the comma-joined string, so ``duplicate``
    never accidentally matches ``semantic_duplicate``.

    100 TB shape: one broadcast-friendly equi-join on the id plus ONE
    map-side-combined agg to group-cardinality rows."""
    tagged = verdicts.join(
        df.select(F.col(id_col), F.col(group_col).alias("_grp")), id_col
    )
    from tmdataloader_spark.functions.ratio import round6_ratio

    rs = F.split(F.col("reasons"), ",")
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_kept"),
    ] + [
        F.sum(F.array_contains(rs, r).cast("long")).cast("long").alias(f"n_{r}")
        for r in REASONS
    ]
    grouped = tagged.groupBy(F.col("_grp").alias(group_col)).agg(*aggs)
    # keep_rate as an integer-exact HALF_UP ratio (functions/ratio.py)
    return grouped.select(
        group_col,
        "n_docs",
        "n_kept",
        round6_ratio("n_kept", "n_docs").alias("keep_rate"),
        *[f"n_{r}" for r in REASONS],
    )
