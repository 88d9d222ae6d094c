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
    length, stopword ratio."""
    toks = F.split(F.trim(F.col(text_col)), " +")
    stop = F.lit(EN_STOPWORDS[:7])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars_computed"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast(
                "double"
            )
            / F.size(toks),
            6,
        ).alias("mean_token_len"),
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stopword_ratio"),
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


def language_id(text: Column | str, threshold: float = 0.05) -> Column:
    """n-gram-heuristic language ID: English stopword hit-rate.
    (A real model would be a Pandas UDF; the heuristic stays JVM-side.)"""
    toks = tokens(text)
    ratio = F.size(
        F.filter(toks, lambda t: F.array_contains(F.lit(EN_STOPWORDS), t))
    ).cast("double") / F.size(toks)
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("und"))
