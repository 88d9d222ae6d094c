"""Pivot / unpivot operators (SURVEY.md §2.3).

- R1 clinical melt  — etl/ClinicalDataProcessor.groovy:51-164
- R2 matrix melt    — etl/ExpressionDataProcessor.groovy:214-239
- R4 demographics pivot — I2B2_LOAD_CLINICAL_DATA.sql:805-825

Melt is expressed with the built-in ``stack`` generator (single narrow
stage; each input row fans out JVM-side — no Python, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_empty: bool = True,
) -> DataFrame:
    """Wide → long with ``stack``; optionally drop empty/null cells the
    way the matrix melt skips empty intensities
    (ExpressionDataProcessor.groovy:227-231)."""
    exprs = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in value_cols
    )
    out = df.select(
        *id_cols,
        F.expr(f"stack({len(value_cols)}, {exprs}) as (`{var_name}`, `{value_name}`)"),
    )
    if drop_empty:
        out = out.filter(F.coalesce(F.col(value_name), F.lit("")) != "")
    return out


def melt_expression_matrix(
    df: DataFrame,
    probe_col: str = "ID_REF",
    trial: str | None = None,
    sample_cols: list[str] | None = None,
) -> DataFrame:
    """R2: ``probe × sample`` wide matrix → long
    ``(trial, probeset_id, expr_id, intensity)``. ``sample_cols``
    restricts the melt for formats with leading annotation columns
    (metabolomics skips 12, protein skips 2 —
    MetabolomicsDataProcessor.groovy:198-206)."""
    if sample_cols is None:
        sample_cols = [c for c in df.columns if c != probe_col]
    out = melt(
        df,
        id_cols=[probe_col],
        value_cols=sample_cols,
        var_name="expr_id",
        value_name="intensity",
    ).withColumnRenamed(probe_col, "probeset_id")
    if trial is not None:
        out = out.withColumn("trial_name", F.lit(trial))
    return out


def pivot_demographics(
    df: DataFrame,
    subject_col: str = "usubjid",
    label_col: str = "data_label",
    value_col: str = "data_value",
) -> DataFrame:
    """R4: EAV → one row per subject with sex/age/race, the reference's
    ``max(case when label ...)`` pivot with its exact label matching —
    ``AGE``/``%(AGE)`` floored and coalesced to 0, ``SEX``/``%(SEX)``/
    ``GENDER`` coalesced to 'Unknown', ``RACE``/``%(RACE)``
    (I2B2_LOAD_CLINICAL_DATA.sql:805-825)."""
    up = F.upper(F.col(label_col))
    v = F.col(value_col)
    age = F.floor(v.try_cast("double"))
    return df.groupBy(subject_col).agg(
        F.coalesce(
            F.max(
                F.when((up == "SEX") | up.endswith("(SEX)") | (up == "GENDER"), v)
            ),
            F.lit("Unknown"),
        ).alias("sex_cd"),
        F.coalesce(
            F.max(F.when((up == "AGE") | up.endswith("(AGE)"), age)), F.lit(0)
        ).alias("age_in_years_num"),
        F.max(F.when((up == "RACE") | up.endswith("(RACE)"), v)).alias("race_cd"),
    )
