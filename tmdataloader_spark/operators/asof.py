"""As-of (point-in-time) join — extension operator (the reference has
no temporal joins; the brief's training-data pipelines do: feature
lookups "as of" an event time, price/quote alignment, last-state
attachment).

Spark has no ASOF JOIN primitive and the naive formulations are
scale-traps: an inequality theta-join explodes to O(n·m) compares,
and a per-left-row subquery is uncomputable distributed. The
implementation here is the UNION + CARRY-FORWARD pattern: tag right
rows 0 and left rows 1, union them, and run ONE window over
(key, ts, tag) carrying the last non-null right payload forward —
a single hash-partition of both inputs by key, sorted within
partitions, no row multiplication at all. This is the same shape
Flink's temporal join and kdb's aj compile to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: columns injected into the union frame; underscored to avoid
#: colliding with user payload columns
_TAG, _SEQ = "_asof_tag", "_asof_seq"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row of the same key
    with ``right_ts <= left_ts`` (backward as-of, inclusive — the
    DuckDB/pandas ``merge_asof`` default). Right payload columns come
    back ``right_prefix``-renamed, NULL when no prior right row
    exists (left join semantics).

    ``tolerance_seconds`` bounds the lookback: matches older than
    ``left_ts − tolerance`` are nulled out (pandas ``merge_asof``
    tolerance semantics) — state in the window never grows regardless.

    Ties: right rows sort BEFORE left rows at the same timestamp (so
    an equal-time right row matches), and multiple right rows at one
    (key, ts) resolve to the row with the greatest ``xxhash64`` over
    its payload — a content-derived ordinal, so repeated runs on
    arbitrarily repartitioned input pick the SAME winner (a
    ``monotonically_increasing_id`` seq would be partitioning-
    dependent). Callers wanting a specific winner should still
    pre-dedup the right side.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]

    r = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_TAG),
        F.xxhash64(*[F.col(c) for c in right.columns]).alias(_SEQ),
        *[
            F.struct(*[F.col(c) for c in payload], F.col(right_ts).alias("_rts")).alias(
                "_asof_payload"
            )
        ],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_TAG),
        # left-side seq never affects the carried value (only right
        # rows hold payloads); a constant keeps the sort deterministic
        F.lit(0).cast("long").alias(_SEQ),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    unioned = l.select(
        *[F.col(c) for c in left.columns],
        "_asof_ts", _TAG, _SEQ, "_asof_payload",
    ).unionByName(
        r.select(
            *keys,
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
              for c in left.columns if c not in keys],
            "_asof_ts", _TAG, _SEQ, "_asof_payload",
        )
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", _TAG, _SEQ)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    ).filter(F.col(_TAG) == 1)
    if tolerance_seconds is not None:
        in_range = F.col("_asof_match._rts") >= F.col("_asof_ts") - F.expr(
            f"INTERVAL {tolerance_seconds} SECONDS"
        )
        carried = carried.withColumn(
            "_asof_match", F.when(in_range, F.col("_asof_match"))
        )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_asof_match.{c}").alias(f"{right_prefix}{c}") for c in payload
    ]
    return carried.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-overlap join: every point row paired with every
    interval row of the same key satisfying ``start <= point < end``
    (half-open, the window-bound convention).

    The naive formulation is an inequality theta-join — a broadcast
    nested loop (or cartesian) that dies at scale. Here both sides
    are BUCKETIZED on time: each point maps to one bucket, each
    interval explodes to the buckets it overlaps, and the join is a
    plain equi-join on (key, bucket) + a residual range filter.
    Candidate volume is |points| + Σ interval_span/bucket — linear,
    shuffle keyed on (key, bucket) so long intervals don't hot-spot a
    single key partition. ``bucket_seconds`` trades replication of
    long intervals against per-bucket fanout (set it near the median
    interval length)."""
    keys = [on] if isinstance(on, str) else list(on)
    # Buckets from exact epoch MICROS, not unix_timestamp (which
    # truncates to whole seconds): with sub-second timestamps a point
    # inside the final fractional second of an interval could land in
    # a bucket beyond the interval's last bucket and the equi-join
    # would drop a row the residual filter keeps — bucketization must
    # stay lossless.
    b_us = F.lit(bucket_seconds * 1_000_000)
    p = points.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(point_ts)) / b_us)
    )
    start_b = F.floor(F.unix_micros(F.col(start_col)) / b_us)
    # end is exclusive: a bucket is touched only if start of bucket < end
    end_b = F.floor((F.unix_micros(F.col(end_col)) - 1) / b_us)
    i = intervals.withColumn(
        "_bucket", F.explode(F.sequence(start_b, F.greatest(end_b, start_b)))
    )
    cond = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    return (
        p.join(i, keys + ["_bucket"])
        .filter(cond)
        .drop("_bucket")
    )
