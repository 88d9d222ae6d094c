"""Incremental aggregate maintenance: keep a keyed rollup current by
MERGING each new batch's partial aggregate — history is never
rescanned.

The batch counterpart of Structured Streaming's stateful aggregation
(streaming.py windowed_event_rollup keeps this state in the state
store; here the "state" is a persisted table), and the aggregation
twin of llmdata/incremental.py's signature-store dedup: at 100 TB the
only affordable daily shape is  new_state = merge(old_state,
agg(today)) — cost ∝ |today| + |state|, independent of history size.

Correct merging needs ALGEBRAIC aggregates — pairs (count, sum) merge
by addition; avg/stddev derive at READ time, never stored (a stored
avg cannot be merged).  Sums ride in decimal(38,6) so merge order is
irrelevant (the repo's float-determinism regime); min/max merge by
min/max.  The proof obligation — merge(agg(A), agg(B)) ==
agg(A ∪ B) — is exactly what the gate query's oracle checks: the
Spark side computes the split-and-merged rollup, the DuckDB oracle
computes the one-shot full rollup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: the mergeable state columns produced per key
_STATE = ("n_rows", "sum_value", "min_value", "max_value")


def rollup_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
) -> DataFrame:
    """Per-key mergeable aggregate state: count, decimal-exact sum,
    min, max.  One map-side-combined shuffle on the keys."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollups(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """new_state = state ⊕ delta: full-outer merge on the keys with
    additive counts/sums and min/max folds.  Both inputs are
    KEY-sized (state cardinality, not event cardinality) — the merge
    never touches raw history.  New keys appear, existing keys
    update; no key ever drops."""
    lhs = state.select(*keys, *[F.col(c).alias(f"_l_{c}") for c in _STATE])
    rhs = delta.select(*keys, *[F.col(c).alias(f"_r_{c}") for c in _STATE])
    z = F.lit(0)
    merged = lhs.join(rhs, list(keys), "full_outer")
    return merged.select(
        *keys,
        (F.coalesce("_l_n_rows", z) + F.coalesce("_r_n_rows", z)).alias(
            "n_rows"
        ),
        (
            F.coalesce(F.col("_l_sum_value"), F.lit(0).cast("decimal(38,6)"))
            + F.coalesce(F.col("_r_sum_value"), F.lit(0).cast("decimal(38,6)"))
        ).alias("sum_value"),
        F.least(
            F.coalesce("_l_min_value", "_r_min_value"),
            F.coalesce("_r_min_value", "_l_min_value"),
        ).alias("min_value"),
        F.greatest(
            F.coalesce("_l_max_value", "_r_max_value"),
            F.coalesce("_r_max_value", "_l_max_value"),
        ).alias("max_value"),
    )


def rollup_report(state: DataFrame) -> DataFrame:
    """Read-time derivation: surface the state with the mean computed
    FROM the mergeable pieces (sum/n as double, 6dp) — the average is
    never stored, so it is always consistent with the state."""
    # integer-exact HALF_UP (functions/ratio.py): sum_value is a
    # decimal(38,6), so sum·1e6 is an exact integer and the 6dp mean
    # is HALF_UP(sum_micro/n) — round(double, 6) splits between
    # engines on exact .5 micro-unit rationals
    from tmdataloader_spark.functions.ratio import round6_ratio

    return state.select(
        *[c for c in state.columns if c not in ("sum_value",)],
        F.col("sum_value").cast("double").alias("sum_value"),
        round6_ratio(
            "CAST(sum_value * 1000000 AS DECIMAL(38,0))",
            "n_rows * 1000000",
        ).alias("avg_value"),
    )
