"""Time-series regularization: resample onto a fixed grid and fill
gaps by carry-forward.

The reference's serial (timepoint) HDD data arrives on an irregular
clock (functions/timepoints.py maps labels to minute offsets); every
downstream trend/rate computation wants a REGULAR grid with explicit
gaps.  Same need in an event pipeline: "events per hour per key,
including the hours with none" — a groupBy alone silently drops empty
buckets, which is exactly the bug class gap-filling exists to prevent.

Scale shape: the observed per-bucket aggregate is one map-side-combined
shuffle on (key, bucket).  The dense grid derives from the KEY-sized
span table (min/max bucket per key) via ``sequence`` + ``explode`` —
grid size = keys × (span/step), never a function of the event count,
and each key's sequence materializes inside its own task.  The
carry-forward is one ``last(ignorenulls)`` running window per key over
grid-sized (not event-sized) rows.  All arithmetic on the value column
is decimal(38,6)-exact (the repo's float-determinism regime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Per ``key_col``: bucket events onto the ``step`` grid spanning
    that key's [min, max] bucket, emit EVERY grid bucket with the
    observed count/sum, a gap flag, and the carried-forward last
    observed sum.

    Output: ``key, bucket (ts), n_events, sum_value (null on gaps),
    carried_value, is_gap``.
    """
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else (
        F.timestamp_seconds(
            F.floor(
                F.unix_timestamp(F.col(ts_col))
                / F.expr(f"extract(epoch from interval {step})")
            )
            * F.expr(f"extract(epoch from interval {step})")
        )
    )
    agg = df.groupBy(
        F.col(key_col).alias("key"), bucket.alias("bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    span = agg.groupBy("key").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["key", "bucket"], "left")
        .withColumn("is_gap", F.col("n_events").isNull())
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        .withColumn(
            "carried_value", F.last("sum_value", ignorenulls=True).over(w)
        )
        .select(
            "key", "bucket", "n_events", "sum_value", "carried_value", "is_gap"
        )
    )
