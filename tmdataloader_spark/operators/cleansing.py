r"""Clinical value/label/category cleansing chain (SURVEY.md §2.2 F1–F9).

The reference runs ~10 sequential UPDATE/DELETE statements over
``wrk_clinical_data`` (sql/postgres/procedures/I2B2_LOAD_CLINICAL_DATA.sql:238-541).
Here the whole chain is ONE narrow projection — no shuffle, fully
codegen'd, and Catalyst fuses it with the scan. At 100 TB this is the
difference between 10 passes over the data and 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from tmdataloader_spark.functions.values import normalize_chars, normalize_whitespace


def drop_empty_values(df: DataFrame, value_col: str = "data_value") -> DataFrame:
    """F1: delete rows with null/empty value
    (I2B2_LOAD_CLINICAL_DATA.sql:238-240)."""
    return df.filter(F.coalesce(F.col(value_col), F.lit("")) != "")


def fix_pipes(col: Column) -> Column:
    """F2: trim leading/trailing ``|``, inner ``|`` → ``-``
    (I2B2_LOAD_CLINICAL_DATA.sql:259-262)."""
    c = F.regexp_replace(col, r"^\|+", "")
    c = F.regexp_replace(c, r"\|+$", "")
    return F.regexp_replace(c, r"\|", "-")


def fix_parens(col: Column) -> Column:
    """F3: remove empty parens ``()`` and unmatched ``(`` / ``)``
    (I2B2_LOAD_CLINICAL_DATA.sql:280-305)."""
    c = F.regexp_replace(col, r"\(\)", "")
    has_open = c.contains("(")
    has_close = c.contains(")")
    c = F.when(has_open & ~has_close, F.regexp_replace(c, r"\(", " ")).otherwise(c)
    c = F.when(
        F.regexp_count(c, F.lit(r"\)")) > F.regexp_count(c, F.lit(r"\(")),
        F.regexp_replace(c, r"\)", " "),
    ).otherwise(c)
    return c


def label_pipe_to_comma(col: Column) -> Column:
    """F4: in data_label, ``|`` → ``,``
    (I2B2_LOAD_CLINICAL_DATA.sql:322-324)."""
    return F.regexp_replace(col, r"\|", ",")


def strip_tag_markers(col: Column) -> Column:
    r"""F9: unwrap ``$$<n><MANGLE>{text}`` tag markers back to ``text``
    (I2B2_LOAD_CLINICAL_DATA.sql:373-375, marker injected by
    etl/mappings/TagReplacer.groovy:19-44)."""
    return F.regexp_replace(col, r"\$\$\d*[A-Z]?\{([^}]*)\}", "$1")


def cleanse_clinical(
    df: DataFrame,
    value_col: str = "data_value",
    label_col: str = "data_label",
    category_col: str = "category_cd",
) -> DataFrame:
    """The full F1–F6+F9 chain as a single projection."""
    df = drop_empty_values(df, value_col)
    value = fix_parens(fix_pipes(F.col(value_col)))
    label = label_pipe_to_comma(F.col(label_col))
    category = strip_tag_markers(F.col(category_col))
    value = normalize_whitespace(normalize_chars(value))
    label = normalize_whitespace(normalize_chars(label))
    return (
        df.withColumn(value_col, value)
        .withColumn(label_col, label)
        .withColumn(category_col, category)
    )


def suppress_visit_names(
    df: DataFrame,
    visit_col: str = "visit_name",
    category_col: str = "category_cd",
    label_col: str = "data_label",
    value_col: str = "data_value",
    always_set_visit_name: bool = False,
) -> DataFrame:
    """F7: null out visit_name when it carries no information
    (I2B2_LOAD_CLINICAL_DATA.sql:344-351,495-541):
    - a category has a single distinct visit (unless alwaysSetVisitName)
    - visit equals the data_label or the data_value

    The single-distinct-visit rule is a window countDistinct per
    category — no self-join. (approx via collect_set size; groups are
    per-category so small.)
    """
    visit = F.col(visit_col)
    if not always_set_visit_name:
        w = Window.partitionBy(category_col)
        n_visits = F.size(F.collect_set(visit_col).over(w))
        visit = F.when(n_visits <= 1, F.lit(None)).otherwise(visit)
    visit = F.when(F.upper(visit) == F.upper(F.col(label_col)), F.lit(None)).otherwise(visit)
    visit = F.when(F.upper(visit) == F.upper(F.col(value_col)), F.lit(None)).otherwise(visit)
    return df.withColumn(visit_col, visit)


def dedup_label_vs_path_tail(
    df: DataFrame,
    category_col: str = "category_cd",
    label_col: str = "data_label",
) -> DataFrame:
    r"""F8: when the last ``+``-separated category component equals the
    data_label, chop it off the category so the label isn't doubled in
    the leaf path (I2B2_LOAD_CLINICAL_DATA.sql:381-393)."""
    last = F.element_at(F.split(F.col(category_col), r"\+"), -1)
    chopped = F.regexp_replace(F.col(category_col), r"\+[^+]*$", "")
    return df.withColumn(
        category_col,
        F.when(F.upper(last) == F.upper(F.col(label_col)), chopped).otherwise(
            F.col(category_col)
        ),
    )
