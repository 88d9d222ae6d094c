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


def pmi_collocations(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise-mutual-information collocation mining: the top-``k``
    adjacent token pairs by ``PMI = ln(p(xy) / (p(x)·p(y)))`` with a
    ``min_count`` support floor — the phrase-detection census run
    before tokenizer training (high-PMI pairs are the multi-word
    units worth atomic tokens: "new york", "machine learning").

    Determinism: PMI's argument is ONE fixed-shape double expression
    over exact long counts — ``(cxy·M·M) / (N·cx·cy)`` with explicit
    casts and parenthesization mirrored by the oracle, so both
    engines evaluate identical IEEE ops; the single per-row ``ln``
    matches engines at 6dp (the tfidf/mixture_drift precedent — no
    cross-row float sums anywhere), and ranking happens on the
    ROUNDED value with the pair as tiebreak (BM25 ordering regime).

    Scale shape: one bigram explode + agg and one unigram explode +
    agg (both map-side combined, outputs vocabulary-sized, never
    corpus-sized); the pair frame joins the unigram counts twice on
    the token key; corpus totals M and N cross in as one-row
    broadcast aggregates (the scalar-subquery shape).  Selection is
    per-task k-heaps via ``orderBy().limit(k)`` — never a global
    sort of the pair vocabulary."""
    from tmdataloader_spark.llmdata.dedup import _word_ngrams

    toks = tokens(F.col(text_col))
    # The unigram table feeds THREE consumers (the _x join, the _y
    # join, and the corpus total M) and the pair table two (the scored
    # join and the total N); without a lineage break each consumer
    # re-runs its corpus explode+agg — the r14 before-plan carried 10
    # Generate nodes for what is two logical explodes. Both tables
    # are vocabulary-sized, so materializing them once is cheap at
    # any scale (lazy-localCheckpoint multi-consumer regime), and the
    # corpus totals are exact long sums OVER the checkpointed counts
    # (sum(cx) ≡ count of exploded unigram rows, sum(n_pair) over the
    # unfiltered pair table ≡ count of exploded bigram rows) — no
    # extra corpus pass for either scalar.
    uni = df.select(F.explode(toks).alias("term"))
    uc = (
        uni.groupBy("term")
        .agg(F.count("*").alias("cx"))
        .localCheckpoint(eager=False)
    )
    m = uc.groupBy().agg(F.sum("cx").alias("_m"))
    pairs = df.select(F.explode(_word_ngrams(toks, 2)).alias("pair"))
    pc = (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_pair"))
        .localCheckpoint(eager=False)
    )
    n = pc.groupBy().agg(F.sum("n_pair").alias("_n"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    joined = (
        pc.filter(F.col("n_pair") >= min_count)
        .withColumn("_x", F.split(F.col("pair"), " ")[0])
        .withColumn("_y", F.split(F.col("pair"), " ")[1])
        .join(uc.select(F.col("term").alias("_x"), F.col("cx").alias("_cx")), "_x")
        .join(uc.select(F.col("term").alias("_y"), F.col("cx").alias("_cy")), "_y")
        .join(F.broadcast(m))
        .join(F.broadcast(n))
    )
    scored = joined.select(
        "pair",
        "n_pair",
        F.round(
            F.log(
                ((d("n_pair") * d("_m")) * d("_m"))
                / ((d("_n") * d("_cx")) * d("_cy"))
            ),
            6,
        ).alias("pmi"),
    )
    top = scored.orderBy(F.col("pmi").desc(), F.col("pair")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pmi").desc(), F.col("pair"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def pmi_collocations_oracle_sql(
    table: str = "documents", k: int = 50, min_count: int = 5
) -> str:
    """DuckDB twin with the identical cast/parenthesization shape."""
    return f"""
        WITH t AS (
          SELECT string_split_regex(trim(lower(text)), ' +') AS toks
          FROM {table}
        ),
        u AS (SELECT unnest(toks) AS term FROM t),
        uc AS (SELECT term, count(*) AS cx FROM u GROUP BY term),
        m AS (SELECT CAST(count(*) AS BIGINT) AS _m FROM u),
        p AS (
          SELECT unnest(list_transform(
            range(1, greatest(len(toks), 1)),
            i -> toks[i] || ' ' || toks[i+1])) AS pair
          FROM t WHERE len(toks) >= 2
        ),
        pc AS (SELECT pair, CAST(count(*) AS BIGINT) AS n_pair
               FROM p GROUP BY pair),
        n AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM p),
        j AS (
          SELECT pair, n_pair, ux.cx AS _cx, uy.cx AS _cy
          FROM pc
          JOIN uc ux ON string_split(pair, ' ')[1] = ux.term
          JOIN uc uy ON string_split(pair, ' ')[2] = uy.term
          WHERE n_pair >= {min_count}
        )
        SELECT pair, n_pair,
               round(ln(
                 ((CAST(n_pair AS DOUBLE) * CAST(_m AS DOUBLE))
                    * CAST(_m AS DOUBLE))
                 / ((CAST(_n AS DOUBLE) * CAST(_cx AS DOUBLE))
                    * CAST(_cy AS DOUBLE))), 6) AS pmi,
               CAST(row_number() OVER (ORDER BY round(ln(
                 ((CAST(n_pair AS DOUBLE) * CAST(_m AS DOUBLE))
                    * CAST(_m AS DOUBLE))
                 / ((CAST(_n AS DOUBLE) * CAST(_cx AS DOUBLE))
                    * CAST(_cy AS DOUBLE))), 6) DESC, pair) AS INT) AS rank
        FROM j, m, n
        ORDER BY pmi DESC, pair LIMIT {k}
    """
