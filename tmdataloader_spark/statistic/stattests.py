"""Distribution-level statistical tests: exact two-sample
Kolmogorov-Smirnov and chi-square independence.

The DRIFT probes that complement the share-based monitors
(llmdata/sampling.py mixture_drift covers categorical KL between
corpus generations; these cover NUMERIC distribution drift and
categorical ASSOCIATION): "did document length / quality-score /
latency change shape between generations" is a KS question, "are
language and source independent" is a chi-square question.

Determinism regime: both tests reduce to INTEGER counting.

* KS: D = max_x |F_a(x) − F_b(x)| evaluated at the pooled sample
  points.  With counts c_a, c_b per distinct value and cumulative
  sums C_a, C_b, the statistic is max |C_a·n_b − C_b·n_a| / (n_a·n_b)
  — the numerator is EXACT int64 arithmetic; only the final division
  runs in double (one op, engine-identical).
* chi-square: per-cell terms (o−e)²/e are computed in double with one
  fixed expression shape, then 6dp-quantized to decimal BEFORE the
  cross-cell sum — so the sum is exact and partial-agg-order-free
  (the sessionize lesson applied to a statistic).

Scale shapes:

* KS cumulative counts use the two-phase prefix sum (the
  llmdata/packing.py recipe) with ORDER-PRESERVING buckets
  (``floor(value)`` by default — range buckets, unlike packing's hash
  buckets, because a prefix sum over an ordered domain needs ordered
  buckets): local running sums within each bucket, bucket bases from
  a bucket-count-sized exclusive prefix — no global single-task
  window over the distinct-value table.  A pathological distribution
  that lands everything in one bucket degrades that bucket to a
  single-task sort; pass a finer ``bucket_expr`` for such data.
* chi-square is two tiny keyed aggregates (cell counts, margins) and
  broadcast joins — cell-table-sized throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from tmdataloader_spark.functions.ratio import (
    round6_ratio as _round6_ratio,
    round6_ratio_sql as _round6_ratio_sql,
)


def ks_test(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Exact two-sample KS statistic between ``a[value_col]`` and
    ``b[value_col]``.  Returns one row: ``n_a, n_b, d_stat`` (6dp).

    Null values are excluded (a CDF is undefined for them)."""
    ua = a.select(F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    ).select("v", F.lit(1).alias("_ca"), F.lit(0).alias("_cb"))
    ub = b.select(F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    ).select("v", F.lit(0).alias("_ca"), F.lit(1).alias("_cb"))
    per_v = (
        ua.unionByName(ub)
        .groupBy("v")
        .agg(F.sum("_ca").alias("ca"), F.sum("_cb").alias("cb"))
    )
    bkt = bucket_expr if bucket_expr is not None else F.floor(F.col("v"))
    # per_v feeds THREE consumers (the within-bucket running counts,
    # the bucket bases, and the sample totals); without a lineage
    # break each re-runs the two-sample union + per-value agg — six
    # input scans in the r14 before-plan. |distinct values|-sized, so
    # materializing it once is cheap at any scale
    # (lazy-localCheckpoint multi-consumer regime).
    per_v = per_v.withColumn("_bkt", bkt.cast("long")).localCheckpoint(
        eager=False
    )

    # phase 1: inclusive running counts within each ordered bucket
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = per_v.withColumn("la", F.sum("ca").over(w_local)).withColumn(
        "lb", F.sum("cb").over(w_local)
    )
    # phase 2: bucket base counts (bucket-count-sized, exclusive)
    w_bkt = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        per_v.groupBy("_bkt")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .withColumn("ba", F.coalesce(F.sum("ta").over(w_bkt), F.lit(0)))
        .withColumn("bb", F.coalesce(F.sum("tb").over(w_bkt), F.lit(0)))
        .select("_bkt", "ba", "bb")
    )
    # decimal(38,0) here keeps the cum·n cross-products exact: the
    # DuckDB twin's windowed sum() is HUGEINT so ITS products never
    # wrap, and int64 on the Spark side wraps at n_a·n_b ≈ 9.2e18
    cum = local.join(F.broadcast(bases), "_bkt").select(
        (F.col("ba") + F.col("la")).cast("decimal(38,0)").alias("cum_a"),
        (F.col("bb") + F.col("lb")).cast("decimal(38,0)").alias("cum_b"),
    )
    totals = per_v.groupBy().agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    return (
        cum.join(F.broadcast(totals))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            ).alias("_dnum")
        )
        .select(
            "n_a",
            "n_b",
            # integer-exact HALF_UP ratio (functions/ratio.py); BOTH
            # operands go through decimal(38,0): the numerator's
            # 2·_dnum·10⁶ blow-up wraps int64 once _dnum exceeds
            # ~4.6e12 (~2.15M rows/sample with D near 1), and the
            # n_a·n_b denominator wraps even sooner — decimal keeps
            # the whole subtree exact, mirroring the HUGEINT oracle
            _round6_ratio(
                "CAST(_dnum AS DECIMAL(38,0))",
                "CAST(n_a AS DECIMAL(38,0)) * n_b",
            ).alias("d_stat"),
        )
    )


def ks_test_oracle_sql(a_sql: str, b_sql: str, value_sql: str) -> str:
    """DuckDB twin: same integer numerator, same final division —
    exact agreement, not approximate.  ``a_sql``/``b_sql`` are FROM
    clauses (table or subquery) for the two samples."""
    d_stat = _round6_ratio_sql(
        "max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a))",
        "CAST(t.n_a AS DECIMAL(38,0)) * t.n_b",
    )
    return f"""
        WITH u AS (
          SELECT {value_sql} AS v, 1 AS ca, 0 AS cb FROM {a_sql}
            WHERE {value_sql} IS NOT NULL
          UNION ALL
          SELECT {value_sql} AS v, 0 AS ca, 1 AS cb FROM {b_sql}
            WHERE {value_sql} IS NOT NULL
        ),
        pv AS (SELECT v, sum(ca) AS ca, sum(cb) AS cb FROM u GROUP BY v),
        c AS (
          SELECT sum(ca) OVER (ORDER BY v) AS cum_a,
                 sum(cb) OVER (ORDER BY v) AS cum_b
          FROM pv
        ),
        t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                     CAST(sum(cb) AS BIGINT) AS n_b FROM pv)
        SELECT t.n_a, t.n_b,
               {d_stat} AS d_stat
        FROM c, t GROUP BY t.n_a, t.n_b
    """


def chi_square(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Chi-square test of independence between two categorical
    columns.  Returns one row: ``n, dof, chi2`` (6dp).

    Expected counts e = row_total·col_total/n are double (one fixed
    expression shape); each cell's (o−e)²/e term is 6dp-quantized to
    decimal BEFORE summing so the cross-cell total is exact and
    order-free."""
    base = df.select(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).filter(F.col("r").isNotNull() & F.col("c").isNotNull())
    # margins derive from the CELL counts, not from three more corpus
    # scans: rt = Σ_c o, ct = Σ_r o, n = Σ o — exact long sums over
    # the |cells|-sized contingency table (the r14 before-plan
    # scanned the input four times, once per census). The cell table
    # is lineage-broken because it feeds all four consumers.
    cells = (
        base.groupBy("r", "c")
        .agg(F.count("*").alias("o"))
        .localCheckpoint(eager=False)
    )
    rows = cells.groupBy("r").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("c").agg(F.sum("o").alias("ct"))
    tot = cells.groupBy().agg(F.sum("o").alias("n"))
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    term = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e,
        6,
    ).cast("decimal(38,6)")
    dof = (
        (F.count_distinct("r") - 1) * (F.count_distinct("c") - 1)
    ).alias("dof")
    return (
        cells.join(F.broadcast(rows), "r")
        .join(F.broadcast(cols), "c")
        .join(F.broadcast(tot))
        .select("r", "c", F.col("n"), term.alias("t"))
        .groupBy("n")
        .agg(dof, F.sum("t").cast("double").alias("chi2"))
        .select("n", "dof", F.round("chi2", 6).alias("chi2"))
    )


def chi_square_oracle_sql(table: str, row_sql: str, col_sql: str) -> str:
    """DuckDB twin with the identical quantize-then-sum algebra."""
    return f"""
        WITH base AS (
          SELECT {row_sql} AS r, {col_sql} AS c FROM {table}
          WHERE {row_sql} IS NOT NULL AND {col_sql} IS NOT NULL
        ),
        cells AS (SELECT r, c, count(*) AS o FROM base GROUP BY r, c),
        rt AS (SELECT r, count(*) AS rt FROM base GROUP BY r),
        ct AS (SELECT c, count(*) AS ct FROM base GROUP BY c),
        t AS (SELECT count(*) AS n FROM base),
        terms AS (
          SELECT t.n,
                 CAST(round(
                   (CAST(o AS DOUBLE)
                      - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
                        / CAST(t.n AS DOUBLE))
                   * (CAST(o AS DOUBLE)
                      - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
                        / CAST(t.n AS DOUBLE))
                   / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
                      / CAST(t.n AS DOUBLE)), 6) AS DECIMAL(38,6)) AS tm,
                 cells.r, cells.c
          FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN t
        ),
        dof AS (
          SELECT (count(DISTINCT r) - 1) * (count(DISTINCT c) - 1) AS dof
          FROM cells
        )
        SELECT terms.n, dof.dof,
               round(CAST(sum(tm) AS DOUBLE), 6) AS chi2
        FROM terms CROSS JOIN dof
        GROUP BY terms.n, dof.dof
    """
