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


def normalize_chars(col: Column | str) -> Column:
    """F5: ``%``→`` Pct``, ``&``→`` And ``, ``+``→`` And ``, ``_``→`` ``,
    and the escaped ``(plus)`` marker back to ``+``
    (I2B2_LOAD_CLINICAL_DATA.sql:437-442)."""
    c = _c(col)
    c = F.regexp_replace(c, "%", " Pct")
    c = F.regexp_replace(c, "&", " And ")
    c = F.regexp_replace(c, r"\+", " And ")
    c = F.regexp_replace(c, "_", " ")
    c = F.regexp_replace(c, r"\(plus\)", "+")
    return c


def normalize_whitespace(col: Column | str) -> Column:
    """F6: trim, collapse runs of spaces, `` ,``→``,``, strip trailing
    comma (I2B2_LOAD_CLINICAL_DATA.sql:456-461)."""
    c = F.trim(_c(col))
    c = F.regexp_replace(c, "  +", " ")
    c = F.regexp_replace(c, " ,", ",")
    c = F.regexp_replace(c, ",$", "")
    return c
