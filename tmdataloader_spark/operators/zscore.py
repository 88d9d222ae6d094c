"""The omics z-score kernel (SURVEY.md §2.10 — "the analytic heart").

Reference: sql/postgres/procedures/I2B2_PROCESS_MRNA_DATA.sql:226-331
(and its 5 near-identical twins for RNASeq / proteomics / metabolomics
/ miRNA / RBM — all one pattern, SURVEY.md §2.5 A2):

    per data type R|L|T|Z:
      R: log = log2(raw)  (raw > 0 only, :157-159)
      L: log = raw (already log2)
      T/Z: value IS the z-score already, just clamp
    stats per probe: mean / EXACT median / sample stddev (:284-297)
    zscore = clamp((log - median_probe) / stddev_probe, -2.5, +2.5),
             0 when stddev = 0 (:318-326)

Spark shape: groupBy(probe) partial-aggregates map-side; the stats
side is tiny (one row per probe) so the join back is broadcast. Exact
median via built-in `median` (exact, Spark 3.4+) — per-probe groups
are small so the sort is cheap and local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CLAMP = 2.5


def log_transform(
    df: DataFrame,
    data_type: str,
    value_col: str = "intensity",
    log_base: float = 2.0,
    r_zero: str = "filter",
    log_round: int | None = None,
    log_round_types: tuple[str, ...] = ("R", "L"),
) -> DataFrame:
    """R → log_base(raw); L → pass through; T/Z → pass through (value
    already standardized).

    ``r_zero`` — the omics families handle non-positive R values
    DIFFERENTLY in the reference, so the policy is explicit:

    - ``'filter'``   (mRNA/RNASeq): keep only positive raws, log(x)
      (F10, I2B2_PROCESS_MRNA_DATA.sql:157-159,257-260)
    - ``'shift_all'`` (proteomics): every row kept, log(x + 0.001)
      (i2b2_proteomics_zscore_calc.sql:150)
    - ``'shift_nonpos'`` (metabolomics/RBM): x ≤ 0 → log(x + 0.001),
      else log(x) (I2B2_METABOLOMICS_ZSCORE_CALC.sql:154,
      I2B2_RBM_ZSCORE_CALC_NEW.sql:194)
    - ``'zero'``      (miRNA): x ≤ 0 → 0, else log(x)
      (I2B2_MIRNA_ZSCORE_CALC.sql:118-121)

    ``log_round`` rounds the log column to the family's precision;
    ``log_round_types`` says WHICH branches round, because the
    reference differs per family: proteomics rounds BOTH R and L to
    4dp (i2b2_proteomics_zscore_calc.sql:150,122) while miRNA rounds
    only its R branch to 5dp — the L branch stores intensity_value
    unrounded (I2B2_MIRNA_ZSCORE_CALC.sql:118-121 vs :132-151)."""
    v = F.col(value_col).try_cast("double")

    def _log(x):
        # log2 (the overwhelmingly common base, ExpressionDataProcessor
        # passes 2) uses the dedicated intrinsic for bit-exact parity
        # with other engines; other bases fall back to ln(x)/ln(b).
        return F.log2(x) if float(log_base) == 2.0 else F.log(float(log_base), x)

    if data_type == "C":
        # miRNA qPCR dCt: the value IS a negative log already —
        # log_intensity = -(x), every row kept, no log2
        # (I2B2_MIRNA_ZSCORE_CALC.sql:159-170; both R and L qPCR files
        # route here, I2B2_PROCESS_QPCR_MIRNA_DATA.sql:1076-1080)
        return df.withColumn("raw_intensity", v).withColumn("log_intensity", -v)
    if data_type == "R":
        if r_zero == "filter":
            df = df.filter(v > 0)
            log_col = _log(v)
        elif r_zero == "shift_all":
            log_col = _log(v + F.lit(0.001))
        elif r_zero == "shift_nonpos":
            log_col = F.when(v <= 0, _log(v + F.lit(0.001))).otherwise(_log(v))
        elif r_zero == "zero":
            log_col = F.when(v <= 0, F.lit(0.0)).otherwise(_log(v))
        else:
            raise ValueError(f"unknown r_zero policy {r_zero!r}")
        raw_col = v
    elif data_type == "L":
        log_col = v
        raw_col = F.pow(F.lit(float(log_base)), v)
    else:  # T / Z: pre-standardized
        log_col = v
        raw_col = F.lit(None).cast("double")
    if log_round is not None and data_type in log_round_types:
        log_col = F.round(log_col, log_round)
    return df.withColumn("raw_intensity", raw_col).withColumn("log_intensity", log_col)


def probe_stats(df: DataFrame, probe_col: str = "probeset_id", log_col: str = "log_intensity") -> DataFrame:
    """A2: per-probe mean / exact median / sample stddev
    (I2B2_PROCESS_MRNA_DATA.sql:284-297). stddev coalesced to 0 like
    the metabolomics twin (I2B2_METABOLOMICS_ZSCORE_CALC.sql:179-192).

    Determinism note: mean/stddev are raw double aggregates, so they
    carry the partial-agg-order sensitivity the repo otherwise
    removes with decimal/quantized sums (see streaming.py). Kept raw
    DELIBERATELY: parity with the reference's numeric semantics
    matters here (z-scores feed downstream thresholds), group sizes
    are small (assays per probe ≈ 30-100, error ≈ n·ulp ≈ 1e-14),
    and the 6dp gate rounding gives a per-group flip probability
    ~1e-10 — the documented probabilistic-match exception, unlike
    the money/score sums where exact algebra costs nothing."""
    return df.groupBy(probe_col).agg(
        F.avg(log_col).alias("mean_intensity"),
        F.median(log_col).alias("median_intensity"),
        F.coalesce(F.stddev_samp(log_col), F.lit(0.0)).alias("stddev_intensity"),
    )


def zscore(
    df: DataFrame,
    data_type: str = "R",
    probe_col: str = "probeset_id",
    value_col: str = "intensity",
    log_base: float = 2.0,
    r_zero: str = "filter",
    log_round: int | None = None,
    log_round_types: tuple[str, ...] = ("R", "L"),
) -> DataFrame:
    """Full kernel: log transform → per-probe stats → clamped z-score.

    T/Z inputs skip the stats join entirely — the value is already the
    z-score and is only clamped (I2B2_PROCESS_MRNA_DATA.sql:226-235;
    Groovy forces T→Z, ExpressionDataProcessor.groovy:72-75).
    """
    df = log_transform(
        df, data_type, value_col, log_base, r_zero, log_round, log_round_types
    )
    if data_type in ("T", "Z"):
        z = F.greatest(F.least(F.col("log_intensity"), F.lit(CLAMP)), F.lit(-CLAMP))
        return df.withColumn("zscore", z)
    stats = probe_stats(df, probe_col)
    joined = df.join(F.broadcast(stats), on=probe_col, how="inner")
    raw_z = (F.col("log_intensity") - F.col("median_intensity")) / F.col("stddev_intensity")
    z = F.when(F.col("stddev_intensity") == 0, F.lit(0.0)).otherwise(
        F.greatest(F.least(raw_z, F.lit(CLAMP)), F.lit(-CLAMP))
    )
    return joined.withColumn("zscore", z)


def collapse_probesets(
    df: DataFrame,
    probe_col: str = "probeset_id",
    assay_col: str = "assay_id",
    value_col: str = "intensity",
) -> DataFrame:
    """A4/J2 tail: duplicate probes per sample collapse to their mean
    (I2B2_PROCESS_MRNA_DATA.sql:143-161)."""
    return df.groupBy(probe_col, assay_col).agg(F.avg(value_col).alias(value_col))


def quantile_normalize(
    df: DataFrame,
    sample_col: str,
    value_col: str,
    tie_cols: tuple[str, ...] = (),
    max_rank: int | None = None,
) -> DataFrame:
    """Cross-sample quantile normalization (Bolstad et al.,
    Bioinformatics 2003) — the standard microarray preprocessing step
    UPSTREAM of the reference's z-score kernel (I2B2_PROCESS_MRNA_
    DATA.sql applies log2 then per-probe stats; production expression
    pipelines quantile-normalize the per-sample distributions first so
    arrays are comparable): rank each value WITHIN its sample, replace
    it with the across-sample mean at that rank, so every sample ends
    up with an identical distribution.

    Exactness: values quantize to micro-unit longs BEFORE ranking (so
    rank order is engine-portable), rank means sum decimal(38,0) with
    ONE double division at the end.  Ties within a sample take
    distinct consecutive ranks via the ``tie_cols`` tiebreak
    (deterministic row_number; the reference-R implementation's
    tie-averaging variant is a documented difference).  Samples of
    unequal depth are allowed — rank r averages over the samples that
    reach depth r.

    Scale shape: ONE shuffle+sort per sample for ranking (the
    inherent cost — same frame the z-score kernel shuffles), one
    map-side-combined rank-keyed aggregate (depth-sized, i.e. rows
    per sample, never corpus-sized), broadcast-joinable back onto the
    ranked rows.  ``max_rank`` prunes BOTH sides losslessly (the mean
    at rank r only involves values at rank r).

    Output: ``sample, rnk, norm_value``.
    """
    order = [F.col("_x")] + [F.col(c) for c in tie_cols]
    w = Window.partitionBy("_sample").orderBy(*order)
    ranked = df.select(
        F.col(sample_col).alias("_sample"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("_x"),
        *tie_cols,
    ).select(
        "_sample", "_x", F.row_number().over(w).alias("rnk")
    )
    if max_rank is not None:
        ranked = ranked.filter(F.col("rnk") <= max_rank)
    means = ranked.groupBy("rnk").agg(
        (
            F.sum(F.col("_x").cast("decimal(38,0)")).cast("double")
            / F.count("*")
            / F.lit(1e6)
        ).alias("norm_value")
    )
    return ranked.join(F.broadcast(means), "rnk").select(
        F.col("_sample").alias("sample"), "rnk", "norm_value"
    )


def quantile_normalize_oracle_sql(
    table: str,
    sample_sql: str,
    value_sql: str,
    tie_sql: str,
    max_rank: int,
) -> str:
    """DuckDB twin of :func:`quantile_normalize` — identical
    quantization, ranking tiebreak, and mean expression."""
    return f"""
        WITH ranked AS (
          SELECT {sample_sql} AS sample,
                 CAST(round(({value_sql}) * 1e6) AS BIGINT) AS x,
                 row_number() OVER (
                   PARTITION BY {sample_sql}
                   ORDER BY CAST(round(({value_sql}) * 1e6) AS BIGINT),
                            {tie_sql}
                 ) AS rnk
          FROM {table}
        ),
        pruned AS (SELECT * FROM ranked WHERE rnk <= {max_rank}),
        means AS (
          SELECT rnk,
                 CAST(sum(x) AS DOUBLE) / count(*) / 1e6 AS norm_value
          FROM pruned GROUP BY rnk
        )
        SELECT pruned.sample, CAST(pruned.rnk AS BIGINT) AS rnk,
               means.norm_value
        FROM pruned JOIN means USING (rnk)
    """
