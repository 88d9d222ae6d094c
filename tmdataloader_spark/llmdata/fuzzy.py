"""Blocked edit-distance (fuzzy) near-duplicate detection.

The missing rung between EXACT dedup (hash equality — dedup.py
exact_duplicates) and SET-similarity dedup (MinHash/Jaccard over
shingles): small in-place typos ("colour" vs "color") keep Jaccard
high only for long texts, but short strings — titles, names, labels,
the data-cleaning shape the reference's cleansing pass normalizes one
rule at a time (CleansingOperations.groovy) — need a true edit-distance
metric.

Scale shape: Levenshtein is O(len²) per PAIR, so the all-pairs form is
off the table at corpus size. We use canonical **prefix + length-band
blocking**:

* candidates must share the normalized first ``prefix_len`` characters
  (an equi-join key — hash shuffle, no theta join), and
* their lengths must differ by at most ``max_dist`` (an edit distance
  ≥ the length difference is impossible, so the band is LOSSLESS given
  the block),

then the exact ``levenshtein`` filter runs on the blocked candidates
only.  Recall caveat (documented, standard for prefix blocking): a pair
whose edit differences touch the first ``prefix_len`` characters lands
in different blocks and is missed; multi-pass blocking (e.g. also on
suffix or sorted-token prefix) trades more shuffles for recall.

At 100 TB: one shuffle on (prefix, length-bucket); hot prefixes (empty
or template-common heads) are the skew risk — the length component of
the join condition bounds each block's candidate set, and a stop-list
of degenerate prefixes (mirroring dedup.py's hot-shingle guard) can be
applied upstream by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(col: F.Column) -> F.Column:
    """Casefold + whitespace-collapse, the same normalization regime
    the exact-dedup hash uses (dedup.py) so the two operators agree on
    what 'the same text' means."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fuzzy_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 2,
    prefix_len: int = 8,
) -> DataFrame:
    """All (id_a < id_b) pairs whose canonicalized texts share the
    first ``prefix_len`` characters, differ in length by ≤ ``max_dist``
    and have Levenshtein distance ≤ ``max_dist``.

    Returns columns: ``id_a, id_b, dist``.

    Plan: narrow (id, canon, prefix, len) projection → self equi-join
    on the prefix (one hash shuffle; the length band rides along as a
    join condition so Catalyst keeps it in the same exchange) →
    JVM-side ``levenshtein`` on survivors only.  No cross join, no
    Python.
    """
    canon = _canon(F.col(text_col))
    side = df.select(
        F.col(id_col).alias("_fid"),
        canon.alias("_ftext"),
        F.substring(canon, 1, prefix_len).alias("_fpfx"),
        F.length(canon).alias("_flen"),
    )
    a = side.select(
        F.col("_fid").alias("id_a"),
        F.col("_ftext").alias("_ta"),
        F.col("_fpfx").alias("_pa"),
        F.col("_flen").alias("_la"),
    )
    b = side.select(
        F.col("_fid").alias("id_b"),
        F.col("_ftext").alias("_tb"),
        F.col("_fpfx").alias("_pb"),
        F.col("_flen").alias("_lb"),
    )
    # The levenshtein predicate is written INSIDE the join condition,
    # LAST: Catalyst keeps the written conjunct order for non-equi
    # join conditions, so the edit distance only runs on pairs that
    # already passed the O(1) id/length checks. (A post-join .filter
    # gets pushed into the join REORDERED FIRST — measured: every
    # prefix-equal pair paid the levenshtein before the cheap cuts.)
    # The distance itself is the THRESHOLD form (Spark 3.5+): with a
    # bound it runs the banded O(len·max_dist) algorithm and returns
    # -1 when the bound is exceeded — so the predicate is ">= 0", and
    # qualifying pairs keep their exact distance (identical results,
    # O(len²) -> O(len·k) per blocked pair).
    pairs = a.join(
        b,
        (F.col("_pa") == F.col("_pb"))
        & (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        & (F.levenshtein("_ta", "_tb", max_dist) >= 0),
        "inner",
    )
    # recomputing the distance in the projection costs one extra
    # levenshtein per SURVIVING pair only — far cheaper than a
    # separate filter that would get pushed and reordered.
    return pairs.select(
        "id_a", "id_b", F.levenshtein("_ta", "_tb", max_dist).alias("dist")
    )


def fuzzy_dedup_keep_one(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 2,
    prefix_len: int = 8,
) -> DataFrame:
    """Survivor set under fuzzy duplication: drop every row that has a
    fuzzy duplicate with a SMALLER id (min-id-wins, the same keep-one
    rule as dedup.py's exact variant — deterministic, no arbitrary
    first()).  One anti-join against the pair list's ``id_b`` side."""
    dup_ids = fuzzy_dup_pairs(
        df, id_col, text_col, max_dist, prefix_len
    ).select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dup_ids, on=id_col, how="left_anti")
