"""Snapshot diff — change-data-capture between two versions of a
keyed dataset (extension; the reference's closest shape is the merge
modes' update-join detection, plans/merge.py, which this generalizes
to the Delta/Iceberg "change data feed" contract a 100 TB corpus
needs for incremental reprocessing: recompute ONLY what changed
between daily snapshots instead of rescanning history — the same
motivation as ``llmdata.incremental``'s signature store).

Scale shape: ONE full-outer equi-join on the key columns — when both
snapshots are written bucketed by key (``llmdata.layout
.write_bucketed``) this is a zero-shuffle sort-merge join; otherwise
it is one co-partitioning shuffle of each side, the minimum any
diff can do.  No driver state, no collect, no row-by-row compare
loop: change classification is a codegen CASE over null-safe column
comparisons.

Determinism: comparisons use null-safe equality (``IS [NOT] DISTINCT
FROM`` semantics via ``eqNullSafe``) on the NATIVE column values —
deliberately NOT an md5 of stringified payloads, because float→string
formatting differs across engines and would make the diff
engine-dependent (the same class of portability bug as the r04
float-sum flip, avoided by construction).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

#: change_type values, in output order
ADDED, REMOVED, CHANGED = "added", "removed", "changed"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns ``keys... , change_type`` where ``change_type`` is
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (both, but some compare column differs under
    null-safe equality), and — only with ``include_unchanged`` —
    ``unchanged``.  By default unchanged rows are filtered out, so
    the output is CDC-sized (proportional to the churn, not the
    corpus)."""
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    missing = [c for c in compare_cols if c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from new snapshot: {missing}")

    o = old.select(
        *[F.col(k).alias(f"_o_{k}") for k in keys],
        *[F.col(c).alias(f"_oc_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_n_{k}") for k in keys],
        *[F.col(c).alias(f"_nc_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}")) for k in keys],
    )
    any_diff = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"_oc_{c}").eqNullSafe(F.col(f"_nc_{c}"))
            for c in compare_cols
        ],
        F.lit(False),
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit(ADDED))
        .when(F.col("_in_new").isNull(), F.lit(REMOVED))
        .when(any_diff, F.lit(CHANGED))
        .otherwise(F.lit("unchanged"))
    )
    out = o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def scd2_history(
    df: DataFrame,
    keys: list[str],
    attr_cols: list[str],
    version_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2: collapse a keyed change log
    into validity intervals — one row per (key, run of identical
    attributes), with ``valid_from`` = first version of the run and
    ``valid_to`` = the next run's first version (NULL while current).

    The warehouse shape downstream of :func:`snapshot_diff`: diffs
    say WHAT changed per day; SCD2 says WHEN each attribute state
    held, which is what point-in-time joins (training-data
    "as-of-date" feature lookups) consume.

    Plan: ONE shuffle on the key columns serves the change-detection
    lag window, the run-id running sum, the per-run aggregate, and
    the valid_to lead window — Spark reuses the exchange across all
    four (the sessionize_batch regime).  Change detection is
    null-safe equality on NATIVE values (no stringified-payload
    hashing; engine-portable by construction).  ``tiebreak_cols``
    pins a total order when ``version_col`` has duplicates —
    REQUIRED for determinism if versions can tie."""
    order = [F.col(version_col)] + [
        F.col(c) for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
            for c in attr_cols
        ],
    )
    first_row = F.lag(F.col(version_col)).over(w).isNull()
    run = F.sum(
        F.when(first_row | changed, 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    runs = (
        df.withColumn("_run", run)
        .groupBy(*keys, "_run", *attr_cols)
        .agg(F.min(version_col).alias("valid_from"))
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    return runs.select(
        *keys,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
