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

from pyspark.sql import DataFrame, functions as F

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
