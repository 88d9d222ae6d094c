"""Per-concept-group numeric/text type inference (SURVEY.md §2.5 A1, §1.2).

Reference: a concept group ``(category_cd, data_label, visit_name)`` is
numeric iff EVERY non-null value parses as a number —
``having sum(is_numeric(data_value)) = 0`` with the tranSMART
convention that is_numeric() returns 0 when the value IS numeric
(sql/postgres/procedures/I2B2_LOAD_CLINICAL_DATA.sql:546-585; the
numeric-row marking via EXISTS at :577-585 is J5).

Spark shape: one groupBy producing the per-group valtype, then a
broadcast-friendly join back (group cardinality = #concepts, tiny next
to facts, so Catalyst/AQE broadcasts it — no fact-side shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tmdataloader_spark.functions.values import is_not_numeric_flag

GROUP_COLS = ["category_cd", "data_label", "visit_name"]


def infer_group_types(
    df: DataFrame,
    value_col: str = "data_value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Return one row per concept group with ``valtype_cd`` ('N' | 'T')."""
    group_cols = group_cols or GROUP_COLS
    return (
        df.groupBy(*group_cols)
        .agg(F.sum(is_not_numeric_flag(value_col)).alias("_non_numeric"))
        .withColumn(
            "valtype_cd", F.when(F.col("_non_numeric") == 0, F.lit("N")).otherwise(F.lit("T"))
        )
        .drop("_non_numeric")
    )


def tag_value_types(
    df: DataFrame,
    value_col: str = "data_value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Attach ``valtype_cd`` and split the value into the EAV pair
    ``tval_char`` / ``nval_num`` (value split at
    I2B2_LOAD_CLINICAL_DATA.sql:1322-1327: numeric rows store
    tval_char='E' + nval_num; text rows store tval_char)."""
    group_cols = group_cols or GROUP_COLS
    types = infer_group_types(df, value_col, group_cols)
    # null-safe keys: visit_name is commonly NULL (especially after
    # suppress_visit_names) and plain equality would silently drop the
    # type for those groups — same fix as plans/clinical.py infer_types
    cond = None
    for c in group_cols:
        clause = df[c].eqNullSafe(types[c])
        cond = clause if cond is None else (cond & clause)
    joined = df.join(F.broadcast(types), on=cond, how="left")
    for c in group_cols:
        joined = joined.drop(types[c])
    is_num = F.col("valtype_cd") == "N"
    return joined.withColumn(
        "tval_char", F.when(is_num, F.lit("E")).otherwise(F.col(value_col))
    ).withColumn(
        "nval_num", F.when(is_num, F.col(value_col).try_cast("double")).otherwise(F.lit(None).cast("double"))
    )
