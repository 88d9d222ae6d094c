"""Text analysis operators — all built-in expressions (JVM-side,
codegen'd); no Python in the hot path.

Used by the driver queries in ``__spark_entry__`` and composable into
any corpus pipeline. Determinism: ratios rounded by callers, hashes
are md5 (engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "it"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), " +")


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality signals: token/char counts, mean token
    length, stopword ratio.  Both ratios are exact-integer HALF_UP
    (functions/ratio.py) — count ratios land on exact .5 micro-unit
    rationals where engines' double rounding splits (r7 class)."""
    from tmdataloader_spark.functions.ratio import round6_ratio

    toks = F.split(F.trim(F.col(text_col)), " +")
    stop = F.lit(EN_STOPWORDS[:7])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    staged = df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars_computed"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).alias(
            "_len_sum"
        ),
        n_stop.cast("long").alias("_n_stop"),
    )
    return staged.select(
        id_col,
        "n_tokens",
        "n_chars_computed",
        round6_ratio("_len_sum", "n_tokens").alias("mean_token_len"),
        round6_ratio("_n_stop", "n_tokens").alias("stopword_ratio"),
    )


def bpeish_token_count(text: Column | str) -> Column:
    """BPE-ish piece count: word / number / single-punct pieces."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def fingerprint(text: Column | str) -> Column:
    """Normalization fingerprint: md5 of lowercased text with
    punctuation stripped and whitespace collapsed."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", " "), " +", " ")
    )
    return F.md5(norm)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD'03): hash every character ``k``-gram of the normalized
    text, slide a window of ``w`` consecutive hashes, keep each
    window's minimum. The selected-hash set is a position-robust
    fingerprint: any shared substring of length ≥ k+w−1 guarantees a
    shared selected hash.

    Pure Catalyst expressions (sequence/transform/slice/array_min)
    over the portable 32-bit md5 hash, so a SQL oracle reproduces
    every fingerprint bit-for-bit. One row per (doc, distinct
    selected hash); cost is O(len) per doc with no shuffle until the
    caller aggregates."""
    # Exploded formulation: one row per k-gram position, the hash as a
    # plain projected expression (whole-stage codegen — an array/HOF
    # form runs the 1M+ md5s interpreted, measured ~3× slower), then
    # the window minimum as a sliding frame over positions. The only
    # shuffles are the per-document window and the final distinct —
    # both keyed on the id, balanced at any corpus size.
    from pyspark.sql import Window

    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", " "), " +", " "
        )
    )
    # Repartition BEFORE the per-character md5 projection: a small
    # corpus parquet arrives as one input split, which would run the
    # 1M+ hashes on a single core (measured 4× slower at sf0.1). The
    # shuffle moves only the raw (id, text) rows.
    spread = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    )
    s1 = spread.select(F.col(id_col), norm.alias("_norm"))
    n_grams = F.length("_norm") - (k - 1)
    positions = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    pos_rows = s1.select(
        F.col(id_col),
        F.col("_norm"),
        n_grams.alias("_n"),
        F.explode(positions).alias("pos"),
    )
    grams = pos_rows.select(
        F.col(id_col),
        F.col("pos"),
        F.col("_n"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("0:"), F.substring(F.col("_norm"), F.col("pos"), k))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_h"),
    )
    sliding = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    wins = (
        grams.withColumn("_wmin", F.min("_h").over(sliding))
        # only full windows: starts at pos ≤ n_grams − w + 1; _n rides
        # along from the pre-explode projection (no count window pass)
        .filter(F.col("pos") <= F.col("_n") - (w - 1))
    )
    return wins.select(F.col(id_col), F.col("_wmin").alias("fp_hash")).distinct()


def language_id(text: Column | str, threshold: float = 0.05) -> Column:
    """n-gram-heuristic language ID: English stopword hit-rate.
    (A real model would be a Pandas UDF; the heuristic stays JVM-side.)"""
    toks = tokens(text)
    ratio = F.size(
        F.filter(toks, lambda t: F.array_contains(F.lit(EN_STOPWORDS), t))
    ).cast("double") / F.size(toks)
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("und"))


def text_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-scan per-document signal projection: BPE-ish token count,
    normalization fingerprint, language ID, and the multimodal
    metadata of the text bytes viewed as opaque media content
    (n_bytes/sha256/fake-decoded dims via
    ``multimodal.fake_decode_columns``).

    Replaces four single-projection gate queries (token_count,
    fingerprint, langid, multimodal_meta — retired r10) with ONE scan:
    at 100 TB each extra pass over the corpus is the dominant cost, so
    signal extraction composes into a single projection — pure
    codegen, no shuffle, column pruning intact."""
    from tmdataloader_spark.llmdata.multimodal import fake_decode_columns

    return df.select(
        id_col,
        bpeish_token_count(text_col).alias("n_bpeish_tokens"),
        fingerprint(text_col).alias("fingerprint"),
        language_id(text_col).alias("lang_pred"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
    ).select(
        id_col,
        "n_bpeish_tokens",
        "fingerprint",
        "lang_pred",
        "media_type",
        *fake_decode_columns(),
    )


def _top_word_frac(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Words-only slice of ``repetition_signals`` for callers that
    discard the bigram/distinct signals (``curate`` keeps only
    ``top_word_frac``).  Under the old two-subplan repetition shape
    the optimizer pruned the unused bigram subplan through the left
    join; the merged one-stream shape below is opaque to that pruning
    (bigrams ride inside the same explode), so the words-only path is
    explicit — one explode over tokens alone, half the term volume."""
    from tmdataloader_spark.functions.ratio import round6_ratio

    toks = tokens(F.col(text_col))
    counts = (
        df.select(F.col(id_col), F.explode(toks).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("c"))
    )
    stats = counts.groupBy(id_col).agg(
        F.max("c").alias("_maxw"), F.sum("c").alias("_nw")
    )
    return stats.select(
        id_col, round6_ratio("_maxw", "_nw").alias("top_word_frac")
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1) at word
    granularity: documents dominated by a repeated token or phrase are
    boilerplate/spam and get filtered before training.

    Per document:
    - ``top_word_frac``  — occurrences of the most frequent token over
      total tokens;
    - ``top_bigram_frac`` — occurrences of the most frequent word
      2-gram over total 2-gram occurrences (0 when < 2 tokens);
    - ``dup_word_frac``  — 1 − distinct/total tokens.

    Shape: ONE explode over the concatenated token + bigram arrays →
    one (id, term) count agg → one per-doc conditional max/sum agg.
    Words and bigrams used to be two separate explode→agg→agg
    subplans joined on the id (4 exchanges + 1 join); since tokens
    come from a split on spaces and bigrams are space-JOINED, the two
    vocabularies are disjoint and one term stream carries both — the
    kind test is ``contains(term, ' ')``, evaluated once per distinct
    (doc, term) row in the final agg. Two exchanges, no join, same
    total term volume — every stage still keyed on the doc id or
    (doc, term), map-side combined, no skew beyond natural doc
    length."""
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_toks"))
    # shared zip_with n-gram form (llmdata.dedup) — the per-index
    # slice-in-HOF shape it replaces ran interpreted, ~6x slower
    from tmdataloader_spark.llmdata.dedup import _word_ngrams

    grams = _word_ngrams(F.col("_toks"), 2)
    counts = (
        base.select(id_col, F.explode(F.concat("_toks", grams)).alias("t"))
        .groupBy(id_col, "t")
        .agg(F.count("*").alias("c"))
    )
    is_word = ~F.col("t").contains(" ")
    w = F.when(is_word, F.col("c"))
    g = F.when(~is_word, F.col("c"))
    stats = counts.groupBy(id_col).agg(
        F.max(w).alias("_maxw"),
        F.sum(w).alias("_nw"),
        F.count(w).alias("_distinct"),
        F.max(g).alias("_maxg"),
        F.sum(g).alias("_ng"),
    )
    # integer-exact HALF_UP ratios (functions/ratio.py);
    # dup_word_frac rewritten as (nw - distinct)/nw so it stays a
    # pure integer ratio instead of 1.0 - double
    from tmdataloader_spark.functions.ratio import round6_ratio

    return stats.select(
        id_col,
        round6_ratio("_maxw", "_nw").alias("top_word_frac"),
        F.coalesce(round6_ratio("_maxg", "_ng"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
        round6_ratio("_nw - _distinct", "_nw").alias("dup_word_frac"),
    )


#: PII patterns — no backreferences or lookaround, so the same regex
#: runs identically under Java (Spark) and RE2 (DuckDB/Go engines).
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(text: Column | str) -> Column:
    """Regex redaction of common PII shapes (emails, phone-number
    runs, IPv4) — the standard pre-training scrub pass. Pure
    ``regexp_replace`` chain: JVM-side, streams through codegen, and
    every pattern is portable to the SQL oracle dialect."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Train/test decontamination: flag corpus documents sharing ≥
    ``min_shared`` distinct word ``n``-grams with ANY benchmark
    document (the n-gram-overlap method used for eval-set leakage
    checks in LLM data pipelines).

    Shape: both sides shingle to 32-bit hashes (shared kernel with
    the dedup pipelines), the benchmark side collapses to DISTINCT
    shingles and is BROADCAST (eval sets are tiny next to a corpus),
    and the count of matched distinct shingles per corpus doc is one
    map-side-combined agg — no shuffle of the corpus at all."""
    from tmdataloader_spark.llmdata.dedup import shingles

    corpus_sh = shingles(corpus, text_col, id_col, n=n)
    bench_sh = (
        shingles(benchmark, text_col, id_col, n=n)
        .select("shingle")
        .distinct()
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the keyword-relevance
    signal data-curation pipelines use for topic filtering and
    near-duplicate triage.

    ``tfidf = tf · (ln((N+1)/(df_t+1)) + 1)`` (the smoothed
    scikit-learn convention, never negative/zero). Shape: one token
    explode → per-(doc, term) counts (map-side combined) → the IDF
    table is ONE small agg over distinct (doc, term) rows, joined back
    on the term key — at corpus scale the vocabulary table is orders
    smaller than the token stream and AQE broadcasts it. Ranking ties
    break on the 6-decimal rounded score then term, so results are
    engine-stable."""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    # tf feeds TWO consumers (the IDF vocabulary agg and the scoring
    # join); without a lineage break the token explode + (doc, term)
    # count — a full pass over the corpus token stream — is planned
    # and executed twice. The frame is |distinct (doc, term)|-sized,
    # far smaller than the stream it aggregates, so materializing it
    # once wins at any scale (lazy-localCheckpoint multi-consumer
    # regime, cf. operators/association.py).
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # N stays IN-PLAN: a one-row countDistinct aggregate broadcast into
    # the IDF expression — a driver-side df.count() here would cost an
    # extra Spark job (and a second scan) every invocation
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("_n_docs"))
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").alias("_df_t"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            (F.log((F.col("_n_docs") + 1) / (F.col("_df_t") + 1)) + 1).alias("idf"),
        )
    )
    scored = tf.join(idf, "term").select(
        id_col,
        "term",
        "tf",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def normalize_unicode(text: Column | str, form: str = "NFC") -> Column:
    """Unicode-normalize a text column (NFC/NFKC/NFD/NFKD) — the
    canonicalization step multilingual dedup needs before hashing
    (composed é and e+combining-accent must fingerprint identically).

    Spark has no built-in Unicode normalizer, so this is the module's
    one deliberate Pandas-UDF: Arrow-batched, zero-copy in, applied
    string-at-a-time via the stdlib. DuckDB's ``nfc_normalize``
    reproduces the NFC form for cross-engine verification."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unsupported normalization form {form!r}")

    def _norm_fn(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    # annotations set as real objects: pandas is imported locally, so
    # string hints would not resolve in this module's globals
    _norm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _norm = pandas_udf(_norm_fn, "string")

    c = F.col(text) if isinstance(text, str) else text
    return _norm(c)


def extract_html_text(html: Column | str) -> Column:
    """Boilerplate-stripping HTML→text — the first step of every
    web-crawl ingestion (the WET-extraction shape): drop
    script/style/comment blocks, replace remaining tags with spaces,
    decode the common entities, collapse whitespace.

    Pure ``regexp_replace`` chain — whole-stage codegen, no UDF, and
    every pattern is POSIX-portable so a SQL twin reproduces the
    output byte-for-byte (oracle-checked). This is deliberately the
    honest regex tier, not a DOM parser: tag soup beyond regexes
    (conditional comments, CDATA edge cases) belongs to an optional
    parser library behind the same column contract."""
    c = F.col(html) if isinstance(html, str) else html
    # script/style blocks (non-greedy, case-insensitive, dot=all)
    out = F.regexp_replace(c, r"(?is)<script\b.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    # block-level OPEN and CLOSE tags become a sentinel (\x01) so the
    # break survives the whitespace collapse below while SOURCE
    # newlines — plain whitespace per HTML — do not
    out = F.regexp_replace(
        out,
        r"(?is)</?(p|div|h[1-6]|li|tr|table|ul|ol|blockquote)(\s[^>]*)?>"
        r"|<br\s*/?\s*>",
        "\x01",
    )
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, rep in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # LAST, so &amp;lt; decodes to &lt; not <
    ]:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"[ \t\f\r\n]+", " ")
    out = F.regexp_replace(out, " ?\x01[ \x01]*", "\n")
    return F.regexp_replace(out, r"^[\n ]+|[\n ]+$", "")
