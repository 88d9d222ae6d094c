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

from pyspark.sql import DataFrame, functions as F

CLAMP = 2.5


def log_transform(df: DataFrame, data_type: str, value_col: str = "intensity", log_base: float = 2.0) -> DataFrame:
    """R → log_base(raw) keeping only positive raws (F10,
    I2B2_PROCESS_MRNA_DATA.sql:157-159,257-260); L → pass through;
    T/Z → pass through (value already standardized)."""
    v = F.col(value_col).try_cast("double")
    if data_type == "R":
        df = df.filter(v > 0)
        # log2 (the overwhelmingly common base, ExpressionDataProcessor
        # passes 2) uses the dedicated intrinsic for bit-exact parity
        # with other engines; other bases fall back to ln(x)/ln(b).
        log_col = F.log2(v) if float(log_base) == 2.0 else F.log(float(log_base), v)
        raw_col = v
    elif data_type == "L":
        log_col = v
        raw_col = F.pow(F.lit(float(log_base)), v)
    else:  # T / Z: pre-standardized
        log_col = v
        raw_col = F.lit(None).cast("double")
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
) -> DataFrame:
    """Full kernel: log transform → per-probe stats → clamped z-score.

    T/Z inputs skip the stats join entirely — the value is already the
    z-score and is only clamped (I2B2_PROCESS_MRNA_DATA.sql:226-235;
    Groovy forces T→Z, ExpressionDataProcessor.groovy:72-75).
    """
    df = log_transform(df, data_type, value_col, log_base)
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
