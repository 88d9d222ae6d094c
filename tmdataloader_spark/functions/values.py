r"""Value coercion / identifier functions.

Reference parity (SURVEY.md §2.8):
- X2 is_numeric — tranSMART convention (0 iff numeric); usage at
  sql/postgres/procedures/I2B2_LOAD_CLINICAL_DATA.sql:562,813
- X9 usubjid builder — I2B2_LOAD_CLINICAL_DATA.sql:230-231
- F5 char normalization — I2B2_LOAD_CLINICAL_DATA.sql:437-442 and
  src/main/groovy/.../etl/ClinicalDataProcessor.groovy:335-347
- F6 whitespace normalization — I2B2_LOAD_CLINICAL_DATA.sql:456-461
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_numeric(col: Column | str) -> Column:
    """True iff the string parses as a double (non-null)."""
    return _c(col).try_cast("double").isNotNull()


def is_not_numeric_flag(col: Column | str) -> Column:
    """The tranSMART ``is_numeric()`` convention: 1 when NOT numeric,
    0 when numeric (so ``sum(...) = 0`` means 'all numeric', see
    I2B2_LOAD_CLINICAL_DATA.sql:546-585)."""
    c = _c(col)
    return F.when(c.isNotNull() & c.try_cast("double").isNull(), F.lit(1)).otherwise(F.lit(0))


def usubjid(trial: Column | str, site: Column | str, subject: Column | str) -> Column:
    """``TRIAL:SITE:SUBJECT`` with empty site collapsing ``::`` → ``:``
    (I2B2_LOAD_CLINICAL_DATA.sql:230-231)."""
    joined = F.concat_ws(
        ":", _c(trial), F.coalesce(_c(site), F.lit("")), F.coalesce(_c(subject), F.lit(""))
    )
    return F.regexp_replace(joined, "::", ":")


def _replace_chain(col: Column, pairs: list[tuple[str, str]]) -> Column:
    c = col
    for old, new in pairs:
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


def normalize_chars_label(col: Column | str) -> Column:
    """F5 for data_label: ``%``→`` Pct``, ``&``/``+``→`` and ``
    (lowercase, as the reference), ``_``→`` ``, and the escaped
    ``(plus)`` marker back to ``+``
    (I2B2_LOAD_CLINICAL_DATA.sql:438 — sequential plain replaces)."""
    return _replace_chain(
        _c(col),
        [("%", " Pct"), ("&", " and "), ("+", " and "), ("_", " "), ("(plus)", "+")],
    )


def normalize_chars_value(col: Column | str) -> Column:
    """F5 for data_value: like the label chain but WITHOUT ``_``→space
    (I2B2_LOAD_CLINICAL_DATA.sql:439)."""
    return _replace_chain(
        _c(col), [("%", " Pct"), ("&", " and "), ("+", " and "), ("(plus)", "+")]
    )


def normalize_chars_category(col: Column | str) -> Column:
    """F5 for category_cd: only ``%``→`` Pct`` and ``&``→`` and ``
    (``+`` is the path separator there — I2B2_LOAD_CLINICAL_DATA.sql:440)."""
    return _replace_chain(_c(col), [("%", " Pct"), ("&", " and ")])


def normalize_chars_path(col: Column | str) -> Column:
    """F5 for category_path: ``%``→`` Pct``, ``&``→`` and ``,
    ``(plus)``→``+`` (I2B2_LOAD_CLINICAL_DATA.sql:441)."""
    return _replace_chain(
        _c(col), [("%", " Pct"), ("&", " and "), ("(plus)", "+")]
    )


def normalize_chars(col: Column | str) -> Column:
    """F5 full chain (= the data_label replace set). Kept as the
    generic entry point; use the per-column variants for reference
    parity (I2B2_LOAD_CLINICAL_DATA.sql:437-442)."""
    return normalize_chars_label(col)


def normalize_whitespace(col: Column | str) -> Column:
    """F6 exactly as the reference
    (I2B2_LOAD_CLINICAL_DATA.sql:456-461):
    ``trim(trailing ',' from trim(replace(replace(x,'  ',' '),' ,',',')))``
    — note the SINGLE-PASS double-space replace (a run of 4 spaces
    becomes 2, not 1), then space-comma fix, trim, strip ALL trailing
    commas."""
    c = F.replace(_c(col), F.lit("  "), F.lit(" "))
    c = F.replace(c, F.lit(" ,"), F.lit(","))
    c = F.trim(c)
    return F.regexp_replace(c, ",+$", "")
