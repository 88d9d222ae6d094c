"""Count-based bigram language model + per-document perplexity —
the CCNet quality signal (Wenzek et al. 2020, "CCNet: Extracting
high quality monolingual datasets from web crawl data", LREC — CCNet
scores documents by LM perplexity and buckets them head/middle/tail;
``llmdata.sampling.percentile_buckets`` consumes exactly this score).
CCNet uses a KenLM 5-gram; this is the public-knowledge distributed
stand-in: an add-k-smoothed bigram model fit and applied wholly
in-plan, with the determinism recipe the rest of the repo uses.

Extension beyond the reference surface (BASELINE.json north-star
"text analysis" family).

100 TB shape
------------
* FIT: one token explode + one ``lead`` window per doc (ONE shuffle
  on doc_id gives adjacent pairs without self-joining the token
  stream), then map-side-combined counts. The model tables are
  vocabulary-bounded — |observed bigrams| rows, orders of magnitude
  below the token stream — and never touch the driver.
* SCORE: the document's bigrams join the model on (w1, w2) — a plain
  equi-join AQE broadcasts when the model is compact and
  shuffle-joins when it is not — plus a vocab-sized backoff join on
  w1. No Python anywhere.
* DETERMINISM: each bigram TYPE's log-probability is quantized once
  to micro-units (``round(ln(p)*1e6)`` as a long) in the model
  table; a document's total is then an EXACT integer sum —
  independent of partitioning and summation order (same recipe as
  BM25/RRF). ``avg_logprob`` / ``perplexity`` derive from that
  integer by fixed scalar IEEE ops, so a SQL oracle replays them.

Vocabulary: top-``vocab_size − 1`` tokens by (tf desc, token asc)
via per-task k-heaps (``orderBy().limit``, never a vocabulary-wide
window) + ``<unk>`` for everything else. Unigram context counts use
the token's full corpus frequency (the standard simplification; a
positional "all but last" count differs only at document ends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tmdataloader_spark.llmdata.text import tokens

UNK = "<unk>"
_Q = 1_000_000.0


def _mapped_pairs(
    docs: DataFrame, vocab: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, w1, w2) adjacent-token pairs with out-of-vocab tokens
    mapped to ``<unk>``: explode with position, broadcast-join the
    vocab, one per-doc ``lead`` window (single shuffle on doc id)."""
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_w"),
    )
    inv = vocab.select(F.col("token").alias("_w"), F.lit(1).alias("_in_v"))
    mapped = tok.join(F.broadcast(inv), "_w", "left").select(
        "_id",
        "_pos",
        F.when(F.col("_in_v").isNotNull(), F.col("_w")).otherwise(F.lit(UNK)).alias("_wm"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    return (
        mapped.withColumn("_w2", F.lead("_wm").over(w))
        .filter(F.col("_w2").isNotNull())
        .select("_id", F.col("_wm").alias("w1"), F.col("_w2").alias("w2"))
    )


def lm_vocab(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``vocab_size − 1`` tokens by (tf desc, token asc) — one
    row ``(token, tf)``; ``<unk>`` absorbs the rest at mapping time.
    Selection via limit (per-task k-heaps), never a global window."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(vocab_size - 1)
    )


def bigram_lm(
    docs: DataFrame,
    vocab_size: int = 1000,
    add_k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fit the add-k bigram model. Returns ``(observed, backoff)``:

    * ``observed (w1, w2, logp_q)`` — quantized
      ``ln((c(w1,w2)+k) / (c(w1)+k·V))`` per observed bigram type;
    * ``backoff (w1, logp_q)`` — the same expression with
      ``c(w1,w2)=0``, one row per mapped unigram (every mapped token
      appears here, so scoring's coalesce never misses).

    ``V`` is the mapped-unigram count, computed in-plan (one-row
    aggregate cross-joined back — the bm25 corpus-stats shape).

    Pass ``vocab`` (an :func:`lm_vocab` frame) when the caller also
    needs it: reusing ONE frame object makes every vocab subtree in
    the composed plan canonically identical, so Spark's exchange
    reuse computes the census once instead of per-branch
    (:func:`perplexity_scores` relies on this)."""
    if vocab is None:
        vocab = lm_vocab(docs, vocab_size, text_col, id_col)
    pairs = _mapped_pairs(docs, vocab, text_col, id_col)
    # unigram context counts from the SAME mapped token stream the
    # pairs came from (w1 of every pair + the final token of each doc
    # == all mapped tokens); recomputing the mapped explode is one
    # more scan but keeps this a pure plan — no caches to leak
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
    inv = vocab.select(F.col("token").alias("_w"), F.lit(1).alias("_in_v"))
    uni = (
        tok.join(F.broadcast(inv), "_w", "left")
        .select(
            F.when(F.col("_in_v").isNotNull(), F.col("_w")).otherwise(F.lit(UNK)).alias("w1")
        )
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vsize = uni.agg(F.count("*").cast("double").alias("_v"))
    uni_v = uni.crossJoin(F.broadcast(vsize))
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    denom = F.col("c1") + F.lit(add_k) * F.col("_v")
    observed = bi.join(uni_v, "w1").select(
        "w1",
        "w2",
        F.round(F.log((F.col("cb") + F.lit(add_k)) / denom) * F.lit(_Q))
        .cast("long")
        .alias("logp_q"),
    )
    backoff = uni_v.select(
        "w1",
        F.round(F.log(F.lit(add_k) / denom) * F.lit(_Q)).cast("long").alias("logp_q"),
    )
    return observed, backoff


def score_with_lm(
    docs: DataFrame,
    vocab: DataFrame,
    observed: DataFrame,
    backoff: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``docs`` under a previously-fit model (the
    fit-nightly / score-the-feed split ``streaming.py`` uses for
    mixture fractions): out-of-model bigrams fall back to the
    per-context add-k floor via the backoff table, so ANY document
    scores — not just the fit corpus.

    Streaming note: the per-doc pair extraction uses a ``lead``
    window, which Structured Streaming does not support — to score a
    document FEED, apply this function per micro-batch via
    ``foreachBatch`` (the model frames are static, so each batch is
    a plain batch plan); that is the standard pattern for
    batch-fit/stream-apply operators that need windows.

    Output ``(id, n_bigrams, avg_logprob, perplexity)``:
    ``avg_logprob`` is the exact-integer HALF_UP rounding of
    ``Σ logp_q / n`` to micro-units, divided by 1e6 — NOT
    ``round(double, 6)``: the true rational Σq/n lands EXACTLY on a
    .5 micro-unit boundary whenever 2·Σq ≡ n (mod 2n) (caught live
    at sf0.1: one doc with n=96 hit −327752592/96 = −3414089.5
    micro-units and Spark/DuckDB double-rounding split), and an
    exact half has no engine-portable double rounding.  The integer
    form ``±((2·|Σq| + n) div 2n)`` is the same value on any engine.
    ``perplexity = round(exp(−avg_logprob), 6)`` — exp of the
    already-deterministic 6dp average, so the only residual
    divergence is a last-ulp libm-vs-JVM exp landing within 1e-15 of
    a rounding boundary (documented, ~1e-9/doc).  Single-token
    documents keep their row with ``n_bigrams = 0`` and NULL
    scores."""
    pairs = _mapped_pairs(docs, vocab, text_col, id_col)
    scored = (
        pairs.join(observed.withColumnRenamed("logp_q", "_obs_q"), ["w1", "w2"], "left")
        .join(F.broadcast(backoff.withColumnRenamed("logp_q", "_bo_q")), "w1", "left")
        .select("_id", F.coalesce("_obs_q", "_bo_q").alias("_q"))
    )
    per_doc = scored.groupBy("_id").agg(
        F.count("*").alias("n_bigrams"), F.sum("_q").alias("_sum_q")
    )
    # HALF_UP(Σq / n) in pure int64 — `div` truncates toward zero,
    # which equals floor on the non-negative operands both branches
    # feed it (DuckDB's `//` floors; they agree on non-negatives)
    avg_micro = F.when(
        F.col("_sum_q") >= 0,
        F.expr("(2 * _sum_q + n_bigrams) div (2 * n_bigrams)"),
    ).otherwise(-F.expr("(-2 * _sum_q + n_bigrams) div (2 * n_bigrams)"))
    avg = avg_micro.cast("double") / F.lit(1e6)
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            avg.alias("avg_logprob"),
            F.round(F.exp(-avg), 6).alias("perplexity"),
        )
    )


def perplexity_scores(
    docs: DataFrame,
    vocab_size: int = 1000,
    add_k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Self-perplexity of every document under the corpus's own
    bigram model — the CCNet quality score, ready to feed
    ``percentile_buckets(..., score_col='avg_logprob')``. One lazy
    plan (fit + score composed; no caches, no collects) — the vocab
    frame is shared between fit and score so its exchanges dedupe
    via reuse instead of recomputing per branch."""
    vocab = lm_vocab(docs, vocab_size, text_col, id_col)
    observed, backoff = bigram_lm(docs, vocab_size, add_k, text_col, id_col, vocab=vocab)
    return score_with_lm(docs, vocab, observed, backoff, text_col, id_col)
