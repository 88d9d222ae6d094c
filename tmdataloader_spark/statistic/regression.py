"""Grouped least-squares trend fitting (regr_slope / regr_intercept /
corr) with engine-portable determinism.

The trend probe over any (x, y) pair per group — drift of a quality
score over ingest time, dose-response slopes (the reference's serial
HDD timepoint series, plans/hdd.py SerialHDD), throughput regressions.
SQL engines ship these as ``regr_slope``/``corr`` aggregates, but their
float partial sums are summation-order-sensitive — the exact failure
class the repo's determinism regime (VERDICT r4, sessionize) bans.

Approach: every moment (Σx, Σy, Σx², Σy², Σxy) is accumulated in EXACT
integer arithmetic — x must be integer-valued (callers pass epoch
seconds, a row index, a timepoint minute...), y is quantized once as
``floor(y·10⁶)`` (floor, not cast-round: floor's result is identical
on every engine, the kmeans/clustering.py regime).  Sums ride in
``decimal(38,0)`` so no magnitude overflows.  Only the FINAL closed-form
arithmetic runs in double, with one fixed expression shape mirrored
verbatim by the DuckDB oracle — identical IEEE ops on identical inputs
give identical bits.

Scale shape: ONE map-side-combined aggregate (5 decimal sums + count)
per group; no window, no second scan, no join.  This is the textbook
"algebraic aggregate" — the same shape Spark uses for avg/var — so it
holds unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: y quantization: floor(y * 10^6) — 6dp, matching the repo's rounding
Y_SCALE = 1_000_000


def grouped_linear_fit(
    df: DataFrame,
    x_col,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group OLS fit of ``y = slope·x + intercept`` plus Pearson
    correlation.  ``x_col`` may be a column name or an integer-valued
    Column expression; ``y`` is quantized to 6dp.  Returns
    ``group, n, slope, intercept, corr`` (6dp; nulls when the fit is
    degenerate — constant x, or constant y for corr)."""
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("decimal(38,0)")
    y = F.floor(F.col(y_col) * Y_SCALE).cast("decimal(38,0)")
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    # Closed form in double, one fixed shape (mirrored by the oracle):
    # moments first rescale to real units, then num/den.
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double") / Y_SCALE
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double") / (Y_SCALE * Y_SCALE)
    sxy = F.col("_sxy").cast("double") / Y_SCALE
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    slope = num / den_x
    return agg.select(
        "group",
        "n",
        F.round(F.when(den_x != 0, slope), 6).alias("slope"),
        F.round(
            F.when(den_x != 0, (sy - slope * sx) / n), 6
        ).alias("intercept"),
        F.round(
            F.when(
                (den_x != 0) & (den_y != 0), num / F.sqrt(den_x * den_y)
            ),
            6,
        ).alias("corr"),
    )


def grouped_linear_fit_oracle_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    group_sql: str,
) -> str:
    """DuckDB twin: the SAME integer moments and the SAME double
    closed form, so the comparison is exact, not approximate."""
    return f"""
        WITH m AS (
          SELECT {group_sql} AS grp,
                 count(*) AS n,
                 sum(CAST(({x_sql}) AS DECIMAL(38,0))) AS sx,
                 sum(CAST(floor(({y_sql}) * 1000000) AS DECIMAL(38,0))) AS sy,
                 sum(CAST(({x_sql}) AS DECIMAL(38,0))
                     * CAST(({x_sql}) AS DECIMAL(38,0))) AS sxx,
                 sum(CAST(floor(({y_sql}) * 1000000) AS DECIMAL(38,0))
                     * CAST(floor(({y_sql}) * 1000000) AS DECIMAL(38,0))) AS syy,
                 sum(CAST(({x_sql}) AS DECIMAL(38,0))
                     * CAST(floor(({y_sql}) * 1000000) AS DECIMAL(38,0))) AS sxy
          FROM {table} GROUP BY 1
        ),
        d AS (
          SELECT grp, n,
                 CAST(n AS DOUBLE) AS nd,
                 CAST(sx AS DOUBLE) AS sxd,
                 CAST(sy AS DOUBLE) / 1000000 AS syd,
                 CAST(sxx AS DOUBLE) AS sxxd,
                 CAST(syy AS DOUBLE) / (1000000.0 * 1000000.0) AS syyd,
                 CAST(sxy AS DOUBLE) / 1000000 AS sxyd
          FROM m
        )
        SELECT grp AS "group", n,
               round(CASE WHEN nd * sxxd - sxd * sxd <> 0 THEN
                 (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) END, 6)
                 AS slope,
               round(CASE WHEN nd * sxxd - sxd * sxd <> 0 THEN
                 (syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd))
                  * sxd) / nd END, 6) AS intercept,
               round(CASE WHEN nd * sxxd - sxd * sxd <> 0
                          AND nd * syyd - syd * syd <> 0 THEN
                 (nd * sxyd - sxd * syd)
                 / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
               END, 6) AS corr
        FROM d
    """
