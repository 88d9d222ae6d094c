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


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Exact CUSUM change-point localization per ``key_col``: the
    position where the cumulative deviation from the series mean
    peaks — the "WHERE did the level shift" probe behind drift
    monitors (Page 1954), complementing statistic/stattests.py's
    ks_test (which only answers WHETHER two samples differ).

    Integer-exact throughout: values quantize to micro-unit longs,
    prefix sums accumulate decimal(38,0), and the peak statistic is
    the n-scaled form ``S_i = n * C_i - i * T`` (C_i = prefix sum,
    T = series total) so no mean is ever materialized as a float;
    ties on |S_i| break to the EARLIEST position.  The single float
    op is the final report division ``|S_peak| / n``.

    Scale shape: ONE shuffle+sort per key (row_number and the running
    sum share the frame), a key-cardinality totals aggregate
    broadcast back, and a max-struct aggregate whose state per key is
    one struct — never the series.

    Output: ``key, change_ts, n, pos, stat``.
    """
    w = Window.partitionBy("key").orderBy(
        "ts", *[F.col(c) for c in order_cols]
    )
    pref = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("_v"),
        *order_cols,
    ).select(
        "key",
        "ts",
        F.row_number().over(w).alias("i"),
        F.sum(F.col("_v").cast("decimal(38,0)")).over(w).alias("c"),
    )
    tot = pref.groupBy("key").agg(
        F.max("i").alias("n"), F.max_by("c", "i").alias("t")
    )
    peak = (
        pref.join(F.broadcast(tot), "key")
        .select(
            "key",
            "n",
            F.struct(
                F.abs(F.col("n") * F.col("c") - F.col("i") * F.col("t")).alias(
                    "a"
                ),
                (-F.col("i")).alias("_ni"),
                F.col("ts").alias("ts"),
                F.col("i").alias("i"),
            ).alias("_s"),
        )
        .groupBy("key")
        .agg(F.max("n").alias("n"), F.max("_s").alias("_m"))
    )
    return peak.select(
        "key",
        F.col("_m.ts").alias("change_ts"),
        F.col("n").cast("long").alias("n"),
        F.col("_m.i").cast("long").alias("pos"),
        (F.col("_m.a").cast("double") / F.col("n")).alias("stat"),
    )


def cusum_changepoint_oracle_sql(
    table: str,
    key_sql: str,
    ts_sql: str = "ts",
    value_sql: str = "value",
    tie_sql: str = "event_id",
    key_alias: str = "key",
) -> str:
    """DuckDB twin of :func:`cusum_changepoint` — same quantization,
    n-scaled statistic, and earliest-position tiebreak."""
    return f"""
        WITH pref AS (
          SELECT {key_sql} AS key, {ts_sql} AS ts,
                 row_number() OVER (
                   PARTITION BY {key_sql} ORDER BY {ts_sql}, {tie_sql}
                 ) AS i,
                 sum(CAST(round(({value_sql}) * 1e6) AS BIGINT)) OVER (
                   PARTITION BY {key_sql} ORDER BY {ts_sql}, {tie_sql}
                 ) AS c
          FROM {table}
        ),
        tot AS (
          SELECT key, max(i) AS n, arg_max(c, i) AS t
          FROM pref GROUP BY key
        ),
        s AS (
          SELECT pref.key, ts, i, n, abs(n * c - i * t) AS a
          FROM pref JOIN tot USING (key)
        ),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY key ORDER BY a DESC, i ASC
          ) AS rn FROM s
        )
        SELECT key AS {key_alias}, ts AS change_ts,
               CAST(n AS BIGINT) AS n, CAST(i AS BIGINT) AS pos,
               CAST(a AS DOUBLE) / n AS stat
        FROM r WHERE rn = 1
    """
